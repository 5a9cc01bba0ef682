"""Date-axis sharded SOLVING — context parallelism as a solver, not a scorer.

Round 1 proved the halo-exchange *scorer* (parallel/seq_shard.py); this
module makes the date axis a first-class solver dimension: a schedule too
long for one device solves under a ``Mesh(seq)`` with the assignment (and
every elite-archive copy of it) sharded over the date axis.

Design: the WHOLE engine (core.ils.ils_round, unchanged) runs inside one
``shard_map`` over the ``seq`` axis.  Engine-level state (scores,
fingerprints, tabu ring, PRNG key, round counters) is replicated — every
shard computes identical values — while the assignment leaves are sharded:

- ``neighborhood``: the W sampled moves are drawn from the replicated key
  (identical on every shard).  Each candidate's 27-day windowed delta is
  computed by the shard that OWNS the changed day, from its halo-extended
  local slice (13 days ppermuted from each neighbor), and ``psum``med —
  non-owners contribute exact 0.0, so the result is bit-identical to the
  dense solver's ``region_deltas`` (the same module-level function).
  Employee-level aggregates (S2/S3/S4) psum their count tensors once per
  call and finish replicated, exactly as the round-1 scorer did.
- ``apply_move`` touches only the owning shard's slice; ``move_fp`` is the
  same O(1) XOR update from psum-resolved old employees.
- ``init``/``perturb``/``fingerprint`` reproduce the dense problem's exact
  PRNG draws by materializing the full day vector (replicated / gathered
  once per ROUND — the per-iteration hot path stays sharded) and slicing
  the local part.

Consequence, tested in tests/test_seq_solver.py: a sharded solve is
TRAJECTORY-IDENTICAL to the dense ``proposer="random"`` solver on the same
seed — the strongest possible correctness statement for a parallelization.
"""

from __future__ import annotations

from functools import lru_cache, partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from constraint_solver_tpu.core.history import EliteArchive, TabuRing
from constraint_solver_tpu.core.ils import (
    IlsState,
    SolverConfig,
    ils_init,
    ils_round,
)
from constraint_solver_tpu.core.problem import Neighborhood, Problem
from constraint_solver_tpu.models.scheduling import (
    PAD,
    REG,
    ScheduleSpec,
    _make_perturb,
    _swap_fp_deltas,
    region_deltas,
    sample_random_moves,
)
from constraint_solver_tpu.ops.fingerprint import fingerprint_i32, fp_update
from constraint_solver_tpu.ops.lex import lex_argmin, make_score
from constraint_solver_tpu.parallel.population import (
    PopulationSolver,
    _gated_exchange,
    portfolio_temps,
)
from constraint_solver_tpu.utils.seeding import seed_string_to_key


def make_seq_scheduling_problem(
    spec: ScheduleSpec, mesh, axis: str = "seq", window_size: int = 100
) -> Problem:
    """Scheduling problem whose functions run INSIDE a ``shard_map`` over
    ``axis`` with the day axis sharded: state = the shard's local slice
    int32[local].  Produces bit-identical trajectories to
    ``make_scheduling_problem(spec, window_size, proposer="random")``."""
    n_shards = mesh.shape[axis]
    d_days, n_emp = spec.num_days, spec.num_employees
    w_size = window_size
    f32 = jnp.float32
    local = -(-d_days // n_shards)
    d_pad = local * n_shards
    if local < PAD:
        raise ValueError(
            f"each shard needs >= {PAD} days; got {local} "
            f"({d_days} days over {n_shards} shards)"
        )

    # Static tables, padded to d_pad (+PAD halo where sliced regionally).
    hol_full = np.zeros((d_pad, n_emp), np.float32)
    hol_full[:d_days] = spec.holiday_array().T
    weekend_full = np.zeros((d_pad,), bool)
    weekend_full[:d_days] = spec.is_weekend()
    weekend_ext = np.zeros((d_pad + 2 * PAD,), bool)
    weekend_ext[PAD : PAD + d_days] = spec.is_weekend()
    weekday_full = np.full((d_pad,), 6, np.int32)
    weekday_full[:d_days] = spec.weekdays()
    wd5_full = np.zeros((d_pad, 5), np.float32)
    wd5_full[:d_days] = spec.weekdays()[:, None] == np.arange(5)

    hol_j = jnp.asarray(hol_full)
    weekend_j = jnp.asarray(weekend_full, jnp.float32)
    weekend_ext_j = jnp.asarray(weekend_ext)
    weekday_j = jnp.asarray(weekday_full)
    wd5_j = jnp.asarray(wd5_full)

    perm_fwd = [(s, (s + 1) % n_shards) for s in range(n_shards)]
    perm_bwd = [(s, (s - 1) % n_shards) for s in range(n_shards)]

    def _start():
        return jax.lax.axis_index(axis) * local

    def _local_tables():
        start = _start()
        sl = lambda t: jax.lax.dynamic_slice(
            t, (start,) + (0,) * (t.ndim - 1), (local,) + t.shape[1:]
        )
        return sl(hol_j), sl(weekend_j), sl(weekday_j), sl(wd5_j)

    def _ext(a_loc):
        """Halo-extended local slice covering global [start-13, end+13],
        with out-of-schedule positions = -1 (matching the dense a_pad)."""
        left = jax.lax.ppermute(a_loc[-PAD:], axis, perm_fwd)
        right = jax.lax.ppermute(a_loc[:PAD], axis, perm_bwd)
        ext = jnp.concatenate([left, a_loc, right])
        g = _start() - PAD + jnp.arange(local + 2 * PAD)
        return jnp.where((g >= 0) & (g < d_pad), ext, -1)

    def _full(a_loc):
        return jax.lax.all_gather(a_loc, axis, axis=0, tiled=True)  # [d_pad]

    # -- Problem functions (all executed inside shard_map) -----------------

    def init(key):
        # Same draw as the dense init (models/scheduling.py init).
        full = jax.random.randint(key, (d_days,), 0, n_emp, jnp.int32)
        full_pad = jnp.concatenate(
            [full, jnp.full((d_pad - d_days,), -1, jnp.int32)]
        )
        return jax.lax.dynamic_slice(full_pad, (_start(),), (local,))

    def score(a_loc):
        """Replicated global (hard, soft) from the local slice — the
        round-1 halo scorer (parallel/seq_shard.py), inlined so it shares
        this problem's shard_map."""
        hol_loc, wkd_loc, _, wd_loc = _local_tables()
        i = jax.lax.axis_index(axis)
        g = i * local + jnp.arange(local)

        halo_a = jax.lax.ppermute(a_loc[:PAD], axis, perm_bwd)
        halo_w = jax.lax.ppermute(wkd_loc[:1].astype(bool), axis, perm_bwd)
        ext = jnp.concatenate([a_loc, halo_a])
        wk_ext = jnp.concatenate([wkd_loc.astype(bool), halo_w])
        oh = jax.nn.one_hot(a_loc, n_emp, dtype=f32)
        oh_ext = jax.nn.one_hot(ext, n_emp, dtype=f32)

        h1 = jnp.sum(oh * hol_loc)
        h2 = jnp.sum(
            jnp.where(g < d_days - 1, ext[:local] == ext[1 : local + 1], False)
        )
        cond = wk_ext[:local] & wk_ext[1 : local + 1] & (g <= d_days - 9)
        e17 = ext[:local] == ext[7 : local + 7]
        e18 = ext[:local] == ext[8 : local + 8]
        e27 = ext[1 : local + 1] == ext[7 : local + 7]
        e28 = ext[1 : local + 1] == ext[8 : local + 8]
        h3 = jnp.sum(jnp.where(cond, e17.astype(f32) + e18 + e27 + e28, 0.0))

        csum = jnp.concatenate(
            [jnp.zeros((1, n_emp), f32), jnp.cumsum(oh_ext, axis=0)], axis=0
        )
        win14 = csum[14 : local + 14] - csum[:local]
        h4 = jnp.sum(jnp.where((g <= d_days - 14)[:, None], win14 > 3, False))
        win7 = csum[7 : local + 7] - csum[:local]
        s1 = jnp.sum(jnp.where((g <= d_days - 7)[:, None], win7 > 2, False))

        hard = jax.lax.psum(h1 + h2 + h3 + h4, axis)
        s1_tot = jax.lax.psum(s1.astype(f32), axis)

        wd_counts = jax.lax.psum(wd_loc.T @ oh, axis)
        tot = jax.lax.psum(jnp.sum(oh, axis=0), axis)
        wk_tot = jax.lax.psum(jnp.sum(oh * wkd_loc[:, None], axis=0), axis)

        wd_present = wd_counts > 0
        n_present = jnp.sum(wd_present, axis=1)
        min_present = jnp.min(jnp.where(wd_present, wd_counts, jnp.inf), axis=1)
        s2 = jnp.sum(jnp.where(n_present > 1, min_present, 0.0))

        present = tot > 0
        n_pres = jnp.sum(present)
        spread = lambda v: jnp.where(
            n_pres >= 2,
            jnp.max(jnp.where(present, v, -jnp.inf))
            - jnp.min(jnp.where(present, v, jnp.inf)),
            0.0,
        )
        soft = s1_tot + s2 + spread(tot) + spread(wk_tot)
        return make_score(hard.astype(f32), soft)

    def is_best(s):
        return (s[0] == 0) & (s[1] == 0)

    def fingerprint(a_loc):
        return fingerprint_i32(_full(a_loc)[:d_days])

    def sample_moves(key):
        # THE dense sampler (single shared definition) — the replicated key
        # yields identical moves, which trajectory equality depends on.
        return sample_random_moves(key, w_size, d_days, n_emp)

    def _resolve_global(a_loc, is_swap, d1, d2, new_emp):
        """(e1, n1, e2, n2) for move vectors [*]: old employees resolved by
        owner-shard one-hot contraction + psum (exact small ints)."""
        g = (_start() + jnp.arange(local, dtype=jnp.int32))[None, :]
        at1 = (g == d1[..., None]).astype(f32)  # [*, local]
        at2 = (g == d2[..., None]).astype(f32)
        a_f = a_loc.astype(f32)[None, :]
        e1 = jax.lax.psum(jnp.sum(at1 * a_f, -1), axis).astype(jnp.int32)
        e2 = jax.lax.psum(jnp.sum(at2 * a_f, -1), axis).astype(jnp.int32)
        n1 = jnp.where(is_swap, e2, new_emp)
        n2 = jnp.where(is_swap, e1, e2)
        return e1, n1, e2, n2, at1, at2

    def neighborhood(a_loc, cur_score, key):
        moves = sample_moves(key)
        is_swap, d1, d2, new_emp = moves
        start = _start()
        hol_loc, wkd_loc, weekday_loc, wd_loc = _local_tables()

        # Base aggregates (psum once; replicated thereafter).
        oh = jax.nn.one_hot(a_loc, n_emp, dtype=f32)
        wd_counts = jax.lax.psum(wd_loc.T @ oh, axis)              # [5, E]
        tot = jax.lax.psum(jnp.sum(oh, axis=0), axis)              # [E]
        wk = jax.lax.psum(jnp.sum(oh * wkd_loc[:, None], axis=0), axis)
        wd_present = wd_counts > 0
        n_present = jnp.sum(wd_present, axis=-1)
        min_present = jnp.min(jnp.where(wd_present, wd_counts, jnp.inf), -1)
        s2_base = jnp.sum(jnp.where(n_present > 1, min_present, 0.0))
        present = tot > 0
        n_pres = jnp.sum(present)
        spread = lambda v: jnp.where(
            n_pres >= 2,
            jnp.max(jnp.where(present, v, -jnp.inf))
            - jnp.min(jnp.where(present, v, jnp.inf)),
            0.0,
        )
        s34_base = spread(tot) + spread(wk)

        e1, n1, e2, n2, at1, at2 = _resolve_global(a_loc, *moves)
        # Per-move static-table lookups via owner contraction + psum.
        hol1 = jax.lax.psum(at1 @ hol_loc, axis)                   # [W, E]
        hol2 = jax.lax.psum(at2 @ hol_loc, axis)
        look = lambda at, t: jax.lax.psum(
            jnp.sum(at * t.astype(f32)[None, :], -1), axis
        )
        wd1 = look(at1, weekday_loc).astype(jnp.int32)
        wd2 = look(at2, weekday_loc).astype(jnp.int32)
        wk1 = look(at1, wkd_loc)
        wk2 = look(at2, wkd_loc)

        # Windowed deltas: the owning shard slices its halo-extended block.
        ext = _ext(a_loc)
        wk_ext_loc = jax.lax.dynamic_slice(
            weekend_ext_j, (start,), (local + 2 * PAD,)
        )

        def one_region(dj, d1_, n1_, d2_, n2_, e1_, e2_, d_excl, use_excl):
            loc = dj - start
            own = (loc >= 0) & (loc < local)
            sl = jax.lax.dynamic_slice(ext, (loc,), (REG,))
            wsl = jax.lax.dynamic_slice(wk_ext_loc, (loc,), (REG,))
            dh, ds = region_deltas(
                sl, wsl, d1_, n1_, d2_, n2_, e1_, e2_, dj, d_excl,
                use_excl, d_days,
            )
            o = own.astype(f32)
            return o * dh, o * ds

        def delta_one(is_sw, d1_, d2_, ne_, e1_, n1_, e2_, n2_,
                      hol1_, hol2_, wd1_, wd2_, wk1_, wk2_):
            dh_a, ds_a = one_region(d1_, d1_, n1_, d2_, n2_, e1_, e2_, d2_, False)
            dh_b, ds_b = one_region(d2_, d1_, n1_, d2_, n2_, e1_, e2_, d1_, True)
            dh_win = jax.lax.psum(dh_a + dh_b, axis)
            ds1 = jax.lax.psum(ds_a + ds_b, axis)

            # Replicated aggregate deltas — the dense delta_one formulas.
            oh1 = jax.nn.one_hot(n1_, n_emp, dtype=f32) - jax.nn.one_hot(
                e1_, n_emp, dtype=f32
            )
            oh2 = jax.nn.one_hot(n2_, n_emp, dtype=f32) - jax.nn.one_hot(
                e2_, n_emp, dtype=f32
            )
            d_h1 = jnp.sum(hol1_ * oh1) + jnp.sum(hol2_ * oh2)
            upd = (
                wd_counts
                + jax.nn.one_hot(wd1_, 5, dtype=f32)[:, None] * oh1[None, :]
                + jax.nn.one_hot(wd2_, 5, dtype=f32)[:, None] * oh2[None, :]
            )
            u_present = upd > 0
            u_np = jnp.sum(u_present, axis=-1)
            u_min = jnp.min(jnp.where(u_present, upd, jnp.inf), -1)
            d_s2 = jnp.sum(jnp.where(u_np > 1, u_min, 0.0)) - s2_base
            tot_new = tot + oh1 + oh2
            wk_new = wk + wk1_ * oh1 + wk2_ * oh2
            t_present = tot_new > 0
            t_np = jnp.sum(t_present)
            t_spread = lambda v: jnp.where(
                t_np >= 2,
                jnp.max(jnp.where(t_present, v, -jnp.inf))
                - jnp.min(jnp.where(t_present, v, jnp.inf)),
                0.0,
            )
            d_s34 = t_spread(tot_new) + t_spread(wk_new) - s34_base
            return d_h1 + dh_win, ds1 + d_s2 + d_s34

        d_hard, d_soft = jax.vmap(delta_one)(
            is_swap, d1, d2, new_emp, e1, n1, e2, n2,
            hol1, hol2, wd1, wd2, wk1, wk2,
        )
        scores = cur_score[None, :] + jnp.stack([d_hard, d_soft], axis=1)
        # Replicated batch fingerprints (e1/e2 are already psum-resolved):
        # frees the engine's exact tabu filter from W vmapped move_fp
        # resolutions, each of which costs a psum over the seq axis.
        fpd = _swap_fp_deltas(d1, e1, n1, d2, e2, n2)
        return Neighborhood(
            scores=scores, moves=moves, valid=jnp.ones((w_size,), bool),
            fp_deltas=fpd,
        )

    def move_fp(a_loc, cur_fp, moves, idx):
        move = jax.tree.map(lambda a: a[idx], moves)
        is_sw, d1, d2, ne = move
        e1, n1, e2, n2, _, _ = _resolve_global(
            a_loc, is_sw, d1[None], d2[None], ne[None]
        )
        fp = fp_update(
            cur_fp, d1, e1[0].astype(jnp.uint32), n1[0].astype(jnp.uint32)
        )
        return fp_update(
            fp, d2, e2[0].astype(jnp.uint32), n2[0].astype(jnp.uint32)
        )

    def apply_move(a_loc, moves, idx):
        move = jax.tree.map(lambda a: a[idx], moves)
        is_sw, d1, d2, ne = move
        e1, n1, e2, n2, _, _ = _resolve_global(
            a_loc, is_sw, d1[None], d2[None], ne[None]
        )
        g = _start() + jnp.arange(local, dtype=jnp.int32)
        return jnp.where(
            g == d1, n1[0], jnp.where(g == d2, n2[0], a_loc)
        ).astype(jnp.int32)

    _perturb_dense = _make_perturb(d_days, n_emp)

    def perturb(a_loc, is_elite, key):
        full = _full(a_loc)[:d_days]
        pert = _perturb_dense(full, is_elite, key)
        pert_pad = jnp.concatenate(
            [pert, jnp.full((d_pad - d_days,), -1, jnp.int32)]
        )
        return jax.lax.dynamic_slice(pert_pad, (_start(),), (local,))

    return Problem(
        name=f"seq-scheduling-{d_days}d-{n_emp}e-x{n_shards}",
        init=init,
        score=score,
        is_best=is_best,
        fingerprint=fingerprint,
        neighborhood=neighborhood,
        move_fp=move_fp,
        apply_move=apply_move,
        perturb=perturb,
        width=w_size,
    )


def seq_pop_state_specs(pop_axis: str | None, seq_axis: str) -> IlsState:
    """PartitionSpec pytree matching a LANE-BATCHED IlsState: leading lane
    dim over ``pop_axis`` (or unsharded when None), assignment day axis over
    ``seq_axis`` (current solution dim 1; elite arena dim 2), everything
    else lane-sharded only."""
    lane = P(pop_axis)
    return IlsState(
        current_state=P(pop_axis, seq_axis),
        current_score=lane,
        current_fp=lane,
        elite=EliteArchive(
            scores=lane, fps=lane, states=P(pop_axis, None, seq_axis),
            valid=lane,
        ),
        tabu=TabuRing(fps=lane, iters=lane, head=lane, count=lane, expiry=lane),
        round=lane,
        ls_iters_total=lane,
        tabu_exhausted_total=lane,
        key=lane,
        accept_temp=lane,
    )


@lru_cache(maxsize=64)
def _seq_programs(
    problem: Problem, config: SolverConfig, k_exchange: int, cull_frac: float,
    exchange_every: int, cull_rank: str, mesh, pop_axis: str | None,
    seq_axis: str, population: int,
):
    """Jitted pop x seq programs, shared across solver instances (the same
    no-recompile contract as parallel/population.py's program caches).

    The engine rounds run inside a shard_map over both axes: lanes vmap
    locally (their seq collectives are lane-independent, so vmapping over
    the lane dim inside the shard_map is sound).  The per-chunk elite
    exchange runs OUTSIDE the shard_map as plain GSPMD code on the globally
    sharded state — identical math to the dense ``PopulationSolver``'s
    exchange, with XLA inserting the pop-axis collectives — so a pop x seq
    solve is trajectory-identical to the dense solver with the same
    exchange cadence (tests/test_seq_solver.py).  (Explicit pop-axis
    all_gathers inside the two-axis shard_map deadlock the multi-device CPU
    runtime's collective rendezvous under thread starvation; the GSPMD form
    is also what the 1D population path compiles.)"""
    # fixed_trip: with lanes sharded over pop AND collectives inside the
    # problem functions, every loop trip count must be shard-uniform (see
    # LsParams.fixed_trip) — bit-identical trajectories, no deadlock.
    ls_p = config.ls_params(problem.width)._replace(
        fixed_trip=pop_axis is not None
    )
    ils_p = config.ils_params()
    specs = seq_pop_state_specs(pop_axis, seq_axis)
    round_at = jax.vmap(
        partial(ils_round, problem, ls_p, ils_p), in_axes=(0, None)
    )

    def shard_body(st: IlsState, n: int) -> IlsState:
        base = st.round[0]
        return jax.lax.fori_loop(
            0, n, lambda i, s: round_at(s, base + 1 + i), st
        )

    def smap(body, in_specs, out_specs):
        return jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

    def step(st: IlsState, n: int) -> IlsState:
        return smap(partial(shard_body, n=n), (specs,), specs)(st)

    def chunk(st: IlsState, n: int) -> IlsState:
        st = step(st, n)
        if k_exchange > 0 and population > 1:
            # Round-gated exchange cadence (population._gated_exchange):
            # chunk-size independent, matches the dense PopulationSolver.
            st = _gated_exchange(st, n, k_exchange, cull_frac,
                                 exchange_every, cull_rank=cull_rank)
        return st

    def init_body(keys, temps):
        return jax.vmap(
            lambda k, t: ils_init(problem, config, k, accept_temp=t)
        )(keys, temps)

    init = smap(init_body, (P(pop_axis), P(pop_axis)), specs)

    # Host-read programs: tiny REPLICATED outputs (the state is globally
    # sharded; these never call problem functions, so plain jit + GSPMD).
    rep = NamedSharding(mesh, P())

    def best_score(st: IlsState):
        scores, _, _ = jax.vmap(lambda e: e.get_best())(st.elite)
        return scores[lex_argmin(scores)]

    def global_best(st: IlsState):
        scores, _, bests = jax.vmap(lambda e: e.get_best())(st.elite)
        lane = lex_argmin(scores)
        return scores[lane], jax.tree.map(lambda a: a[lane], bests)

    return SimpleNamespace(
        init=jax.jit(init, out_shardings=specs_to_shardings(specs, mesh)),
        chunk=jax.jit(chunk, static_argnums=1),
        step=jax.jit(step, static_argnums=1),
        best_score=jax.jit(best_score, out_shardings=rep),
        global_best=jax.jit(global_best, out_shardings=rep),
        probe=jax.jit(
            lambda st: (st.round[0], jnp.sum(st.ls_iters_total)),
            out_shardings=rep,
        ),
    )


def specs_to_shardings(specs, mesh):
    return jax.tree.map(
        lambda p: NamedSharding(mesh, p), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


class SeqShardedSolver(PopulationSolver):
    """Population of date-sharded trajectories over ``Mesh(pop, seq)`` —
    "context parallelism" composed with data parallelism, the runnable
    shape for BASELINE.json config[5] (sharded restart portfolio on
    employee-scheduling-large).  With ``population=1`` (default) and a
    seq-only mesh this is the single-trajectory date-sharded solver.

    Full ``PopulationSolver`` driver parity is inherited: run /
    execute_round / is_finished / get_iteration_info / get_best_solution /
    get_best_score / cancel / stats / save / load / reseed_from_elites /
    roofline, plus per-chunk elite exchange over ``pop``."""

    def __init__(
        self,
        spec: ScheduleSpec,
        config: SolverConfig,
        mesh,
        axis: str = "seq",
        window_size: int = 100,
        population: int = 1,
        exchange_every: int = 10,
        k_exchange: int = 4,
        portfolio: str = "reference",
        cull_frac: float = 0.0,
        cull_rank: str = "lex",
    ):
        # No super().__init__: the seq problem's collectives need shard_map
        # for init and chunk; the parent's driver methods only touch the
        # jitted programs + attributes set here.
        self.spec = spec
        self.config = config
        self.population = population
        self.exchange_every = exchange_every
        self.cancelled = False
        self._wall = 0.0
        self.mesh = mesh
        self.axis = axis
        jax.set_mesh(mesh)
        pop_axis = "pop" if "pop" in mesh.axis_names else None
        if pop_axis is not None and population % mesh.shape["pop"] != 0:
            raise ValueError(
                f"population {population} must divide over the pop axis "
                f"({mesh.shape['pop']} shards)"
            )
        self.problem = make_seq_scheduling_problem(spec, mesh, axis, window_size)
        progs = _seq_programs(
            self.problem, config, k_exchange, cull_frac, exchange_every,
            cull_rank, mesh, pop_axis, axis, population,
        )
        self._shardings = specs_to_shardings(
            seq_pop_state_specs(pop_axis, axis), mesh
        )
        key = seed_string_to_key(config.seed)
        if population == 1:
            # The raw (unsplit) key, batched: bit-identical to the
            # single-trajectory core Solver on the same seed.
            keys = key[None]
        else:
            # Same split as population_init: bit-identical lanes to the
            # dense PopulationSolver on the same seed.
            keys = jax.random.split(key, population)
        # device_put_global: plain device_put rejects multi-process
        # shardings (non-addressable devices), and this constructor must
        # work on a real 2-process pod mesh (tests/test_distributed.py).
        from constraint_solver_tpu.parallel.mesh import device_put_global

        lane_sharding = NamedSharding(mesh, P(pop_axis))
        temps = device_put_global(
            portfolio_temps(population, portfolio), lane_sharding
        )
        keys = device_put_global(keys, lane_sharding)
        self.state = progs.init(keys, temps)
        self._chunk_jit = progs.chunk
        self._step_jit = progs.step
        self._round_jit = lambda st: progs.step(st, 1)
        self._best_score_jit = progs.best_score
        self._global_best_jit = progs.global_best
        self._probe_jit = progs.probe

    def get_best_solution(self):
        """Global best over all lanes; assignment sliced to real days."""
        (score, a_pad) = super().get_best_solution()
        return score, np.asarray(a_pad)[: self.spec.num_days]

