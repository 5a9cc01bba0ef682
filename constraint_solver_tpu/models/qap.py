"""Quadratic Assignment Problem domain — the MXU-resident model family.

Not in the reference (which ships Ackley/N-Queens/scheduling); added because
QAP is the canonical hard assignment problem the framework's delta-evaluation
design targets — every technique paper retrieved for this build (PAPERS.md:
O(1) delta components, GPU SA/tabu for QAP) is about exactly this workload.

Problem: place n facilities on n locations (permutation ``p``) minimizing

    cost(p) = sum_{i,j} F[i, j] * D[p[i], p[j]]

with symmetric flow F and distance D (zero diagonals).

TPU-native scoring: let G = D[p][:, p] be the permuted distance matrix
(computed gather-free as onehot(p) @ D @ onehot(p)^T — two MXU matmuls).
Then

    cost = sum(F * G)

and the swap delta for ALL n^2 facility pairs at once is ONE matmul:

    H = F @ G                                     # [n, n] on the MXU
    delta[a, b] = 2 * (H[a,b] + H[b,a] - H[a,a] - H[b,b] + 2 * F[a,b] * G[a,b])

where the F[a,b]*G[a,b] term corrects the k in {a, b} contributions
(standard QAP swap algebra, cf. the O(1) delta-component paper in
PAPERS.md).  The whole
neighborhood (n(n-1)/2 swaps) is scored by one [n,n]x[n,n] matmul — the MXU
does the heavy lifting, unlike the VPU-bound N-Queens/scheduling paths.

Property-tested against naive full rescores (tests/test_qap.py).
"""

from __future__ import annotations

from functools import lru_cache

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from constraint_solver_tpu.core.problem import Neighborhood, Problem
from constraint_solver_tpu.ops.fingerprint import fingerprint_i32
from constraint_solver_tpu.ops.lex import make_score


class QAPSpec(NamedTuple):
    flow: tuple      # hashable [n][n]
    dist: tuple

    @staticmethod
    def random(n: int, seed: int = 0, max_val: int = 10) -> "QAPSpec":
        """A random symmetric instance with zero diagonals (the classic
        Taillard-style uniform generator)."""
        rng = np.random.default_rng(seed)

        def sym(m):
            m = np.triu(m, 1)
            return m + m.T

        flow = sym(rng.integers(0, max_val + 1, (n, n)))
        dist = sym(rng.integers(0, max_val + 1, (n, n)))
        return QAPSpec(
            flow=tuple(map(tuple, flow.tolist())),
            dist=tuple(map(tuple, dist.tolist())),
        )

    def arrays(self):
        return (
            np.asarray(self.flow, np.float32),
            np.asarray(self.dist, np.float32),
        )


def qap_cost_naive(flow: np.ndarray, dist: np.ndarray, p: np.ndarray) -> float:
    """Host oracle: direct double sum."""
    return float(np.sum(flow * dist[np.ix_(p, p)]))


class QAPState(NamedTuple):
    """State for the ``incremental=True`` variant: the permutation plus the
    carried G = D[p][:, p] and H = F G matrices, so a swap costs rank-2
    O(n^2) fused updates instead of three O(n^3) matmuls (see
    make_qap_problem docstring)."""

    p: jax.Array  # int32[n]
    g: jax.Array  # float32[n, n], exactly D[p][:, p] (updates are exact)
    h: jax.Array  # float32[n, n], F @ G up to bounded f32 drift per round


@lru_cache(maxsize=32)
def make_qap_problem(
    spec: QAPSpec,
    nbr_axis: str | None = None,
    nbr_shards: int = 1,
    nbr_keep: int = 64,
    compact: bool = False,
    incremental: bool = False,
) -> Problem:
    """``compact``: row-min candidate compaction for MXU-scale boards.  The
    round-5 roofline verdict (BENCH_NOTES "QAP at MXU scale") found the
    n>=1024 program VPU-bound at ~90% utilization: the O(n^2)-lane score
    packing ([W, 2] make_score) and the engine's full-width masked lex
    argmin take longer than the one MXU contraction they surround.  With
    ``compact=True`` the proposer reduces the [n, n] delta block to ONE
    candidate per facility row — a fused masked min+argmin over axis 1,
    the same reduction XLA fuses INTO the delta assembly — and hands the
    engine an n-wide candidate list (best swap partner per row) instead
    of the n^2-wide block.  The lexicographic winner is IDENTICAL to the
    dense path's (flat row-major argmin == smallest-a-then-smallest-b ==
    per-row argmin + first-index row pick; tested), so greedy descents
    take the same trajectory.  Divergence (documented per docs/DESIGN.md):
    tabu retries beyond the first pick see the best-of-each-OTHER-row
    rather than the global 2nd-best (which may share a row with the
    winner) — measured first-pick tabu-hit rate on wide blocks is 0
    (core/local_search.py:118-121), so this is theoretical.  ``width``
    stays n^2: every delta is still evaluated each iteration, the
    compaction only removes VPU passes over the candidate *list*.

    ``incremental``: carry G = D[p][:, p] and H = F G in the solver state
    (``QAPState``) and update them per applied swap with EXACT permutation
    identities (G' = P G P, small-integer f32 arithmetic, exact at any n)
    and a rank-2 update (H' = H - fu gu^T - hu u^T + s fu u^T with
    fu = F[:, a] - F[:, b] etc., all column differences and one outer
    product — no matvec: F G u == H u).  The per-iteration cost drops from
    three [n, n] x [n, n] matmuls (2 rebuilding G from p, 1 for H) to a
    handful of fused O(n^2) VPU passes — the classic Taillard-style
    incremental evaluation, restructured as dense tensor algebra instead
    of scalar loops.  Selection uses the same row-min compaction as
    ``compact``.  H is recomputed from scratch at every perturbation
    (round start), bounding f32 drift to one descent (<= ls_max rank-2
    adds; exact below cost 2^24, i.e. every test instance).  Memory: the
    elite archive stores full QAPStates, so keep
    ``best_solutions_capacity`` small at large n (8 x 2 x n^2 x 4 B per
    lane — ~4 GB at n = 4096, P = 4, capacity 8).

    ``nbr_axis``/``nbr_shards``: tensor-parallel neighborhood.  Inside a
    ``shard_map`` over that mesh axis each shard scores its n/shards ROW
    BLOCK of the [n, n] swap-delta matrix with two [n/S, n] x [n, n] MXU
    matmuls (H and Hᵀ rows; F and G are symmetric so Hᵀ rows = G[rows] @ F),
    all_gathers the [n] diagonal, keeps its ``nbr_keep`` best candidates,
    and an all_gather over the axis rebuilds a small global candidate list —
    the same collective pattern as the nqueens ``nbr_axis`` neighborhood."""
    flow_np, dist_np = spec.arrays()
    n = flow_np.shape[0]
    flow = jnp.asarray(flow_np)
    dist = jnp.asarray(dist_np)
    if nbr_axis is not None and n % nbr_shards != 0:
        raise ValueError(f"n={n} must divide over {nbr_shards} nbr shards")
    rows_per = n // nbr_shards

    def permuted_dist(p: jax.Array) -> jax.Array:
        """G = D[p][:, p] via onehot matmuls (MXU, gather-free)."""
        onehot = (p[:, None] == jnp.arange(n, dtype=p.dtype)).astype(
            jnp.float32
        )
        return onehot @ dist @ onehot.T

    def init(key):
        return jax.random.permutation(key, jnp.arange(n, dtype=jnp.int32))

    def score(p):
        return make_score(jnp.sum(flow * permuted_dist(p)))

    def is_best(s):
        return jnp.asarray(False)  # optimum unknown in general

    def fingerprint(p):
        return fingerprint_i32(p)

    def neighborhood(p, cur_score, _key):
        # All-pairs swap deltas in one MXU matmul (module docstring).
        g = permuted_dist(p)
        h = jnp.dot(flow, g.T, preferred_element_type=jnp.float32)
        hd = jnp.diagonal(h)
        delta = 2.0 * (
            h + h.T - hd[:, None] - hd[None, :] + 2.0 * flow * g
        )
        cand = cur_score[0] + delta  # [n, n]; diagonal = no-op (delta 0)
        ia = jnp.arange(n, dtype=jnp.int32)
        a_idx = jnp.broadcast_to(ia[:, None], (n, n)).reshape(-1)
        b_idx = jnp.broadcast_to(ia[None, :], (n, n)).reshape(-1)
        valid = (a_idx < b_idx)  # each unordered swap once, no no-ops
        # NEGATIVE RESULT (round 5, bench/qap_scale.py): supplying a
        # proposer-computed hint_idx via a [n, n] row-min sweep + per-lane
        # dynamic row slice measured 12x SLOWER at n=1024 (8.1e9 ->
        # 6.3e8 moves/s) — the vmapped dynamic_slice over per-lane row
        # starts lowers to a serialized gather (the same poison the
        # round-4 scheduling trace caught), and n=2048 stopped compiling
        # (a [P, n^2, 1] broadcast materialized at 128x lane padding).
        # The engine's flat masked lex_argmin fuses fine; only the
        # algebraic candidate count is worth providing.
        return Neighborhood(
            scores=make_score(cand.reshape(-1)),
            moves=(a_idx, b_idx),
            valid=valid,
            n_valid=jnp.int32(n * (n - 1) // 2),
        )

    def neighborhood_compact(p, cur_score, _key):
        # Same MXU delta algebra as ``neighborhood``, then a fused masked
        # row-wise min+argmin compacts the [n, n] block to n candidates
        # (docstring above).  min and argmin are two reduction consumers
        # of one fused producer — XLA emits them in the same pass over
        # the delta block; nothing [n, n]-shaped survives to the engine.
        g = permuted_dist(p)
        h = jnp.dot(flow, g.T, preferred_element_type=jnp.float32)
        hd = jnp.diagonal(h)
        delta = 2.0 * (
            h + h.T - hd[:, None] - hd[None, :] + 2.0 * flow * g
        )
        ia = jnp.arange(n, dtype=jnp.int32)
        upper = ia[:, None] < ia[None, :]  # each unordered swap once
        w = jnp.where(upper, cur_score[0] + delta, jnp.inf)
        rmin = jnp.min(w, axis=1)                      # [n]
        rarg = jnp.argmin(w, axis=1).astype(jnp.int32)  # smallest-b ties
        return Neighborhood(
            scores=make_score(rmin),
            moves=(ia, rarg),
            valid=jnp.isfinite(rmin),  # row n-1 has no a<b partner
            n_valid=jnp.int32(n - 1),
        )

    def neighborhood_sharded(p, cur_score, _key):
        # Row-block of the swap-delta matrix per shard: 2/S of the matmul
        # flops each, then local-top-k + all_gather (docstring above).
        g = permuted_dist(p)  # replicated state => identical G everywhere
        shard = jax.lax.axis_index(nbr_axis)
        r0 = shard * rows_per
        f_rows = jax.lax.dynamic_slice(flow, (r0, 0), (rows_per, n))
        g_rows = jax.lax.dynamic_slice(g, (r0, 0), (rows_per, n))
        h_rows = jnp.dot(f_rows, g, preferred_element_type=jnp.float32)
        # Hᵀ[a, :] = (G F)[a, :] because F = Fᵀ and G = Gᵀ.
        ht_rows = jnp.dot(g_rows, flow, preferred_element_type=jnp.float32)
        hd_local = jnp.sum(f_rows * g_rows, axis=1)  # H[a, a] for my rows
        hd = jax.lax.all_gather(hd_local, nbr_axis, axis=0, tiled=True)  # [n]
        delta = 2.0 * (
            h_rows + ht_rows - hd_local[:, None] - hd[None, :]
            + 2.0 * f_rows * g_rows
        )
        cand = (cur_score[0] + delta).reshape(-1)  # [rows_per * n]
        ia = jnp.arange(n, dtype=jnp.int32)
        a_idx = jnp.broadcast_to(
            (r0 + jnp.arange(rows_per, dtype=jnp.int32))[:, None],
            (rows_per, n),
        ).reshape(-1)
        b_idx = jnp.broadcast_to(ia[None, :], (rows_per, n)).reshape(-1)
        valid = a_idx < b_idx

        k_keep = min(nbr_keep, rows_per * n)
        neg, idxs = jax.lax.top_k(jnp.where(valid, -cand, -jnp.inf), k_keep)
        cand = -neg
        a_idx, b_idx = a_idx[idxs], b_idx[idxs]
        valid = jnp.isfinite(cand)
        gather = lambda x: jax.lax.all_gather(x, nbr_axis, axis=0, tiled=True)
        return Neighborhood(
            scores=make_score(gather(cand)),
            moves=(gather(a_idx), gather(b_idx)),
            valid=gather(valid),
        )

    def move_fp(p, cur_fp, moves, idx):
        a_idx, b_idx = moves
        a, b = a_idx[idx], b_idx[idx]
        from constraint_solver_tpu.ops.fingerprint import fp_update

        pa = p[a].astype(jnp.uint32)
        pb = p[b].astype(jnp.uint32)
        return fp_update(fp_update(cur_fp, a, pa, pb), b, pb, pa)

    def apply_move(p, moves, idx):
        a_idx, b_idx = moves
        a, b = a_idx[idx], b_idx[idx]
        pa, pb = p[a], p[b]
        return p.at[a].set(pb).at[b].set(pa)

    def perturb(p, is_elite, key):
        """Random subset re-shuffle: k ~ U[1, n/20] near elites else
        U[1, n/2] positions get cyclically rotated (a permutation-preserving
        analog of the reference domains' ChangeSubset perturbations)."""
        k_strat, k_n, k_u, k_roll = jax.random.split(key, 4)
        do_change = jax.random.uniform(k_strat) < (100.0 / 110.0)
        hi = jnp.where(is_elite, max(1, n // 20), max(1, n // 2))
        n_alter = jax.random.randint(k_n, (), 1, hi + 1)
        u = jax.random.uniform(k_u, (n,))
        kth = jax.lax.dynamic_index_in_dim(
            jnp.sort(u), n_alter - 1, keepdims=False
        )
        sel = u <= kth  # k chosen positions
        # Cyclic rotation of the chosen positions' values: rank-order the
        # selected slots and give each the value of the previous one.
        order = jnp.argsort(jnp.where(sel, u, jnp.inf))  # selected first
        idx_sel = order  # first n_alter entries are the chosen slots
        vals = p[idx_sel]
        rotated = jnp.where(
            jnp.arange(n) < n_alter, jnp.roll(vals, 1), vals
        )
        # Fix the wrap: position 0 takes the value of slot n_alter-1.
        first_val = jax.lax.dynamic_index_in_dim(
            vals, jnp.maximum(n_alter - 1, 0), keepdims=False
        )
        rotated = rotated.at[0].set(
            jnp.where(n_alter > 0, first_val, rotated[0])
        )
        p_new = p.at[idx_sel].set(rotated)
        return jnp.where(do_change, p_new, p)

    def _gh_from_p(p):
        g = permuted_dist(p)
        h = jnp.dot(flow, g, preferred_element_type=jnp.float32)
        return g, h

    def init_inc(key):
        p = init(key)
        return QAPState(p, *_gh_from_p(p))

    def score_inc(st):
        return make_score(jnp.sum(flow * st.g))

    def fingerprint_inc(st):
        return fingerprint_i32(st.p)

    def neighborhood_inc(st, cur_score, _key):
        # The compact row-min neighborhood with G and H read from state —
        # zero matmuls per iteration.
        hd = jnp.diagonal(st.h)
        delta = 2.0 * (
            st.h + st.h.T - hd[:, None] - hd[None, :] + 2.0 * flow * st.g
        )
        ia = jnp.arange(n, dtype=jnp.int32)
        upper = ia[:, None] < ia[None, :]
        w = jnp.where(upper, cur_score[0] + delta, jnp.inf)
        rmin = jnp.min(w, axis=1)
        rarg = jnp.argmin(w, axis=1).astype(jnp.int32)
        return Neighborhood(
            scores=make_score(rmin),
            moves=(ia, rarg),
            valid=jnp.isfinite(rmin),
            n_valid=jnp.int32(n - 1),
        )

    def move_fp_inc(st, cur_fp, moves, idx):
        a_idx, b_idx = moves
        a, b = a_idx[idx], b_idx[idx]
        from constraint_solver_tpu.ops.fingerprint import fp_update

        pa = st.p[a].astype(jnp.uint32)
        pb = st.p[b].astype(jnp.uint32)
        return fp_update(fp_update(cur_fp, a, pa, pb), b, pb, pa)

    def apply_move_inc(st, moves, idx):
        # G' = P G P and H' = F G' as rank-2 fused updates (docstring):
        # with u = e_a - e_b, gu = G u, fu = F u, hu = H u (== F G u, so
        # no matvec through F G is needed) and s = u^T G u:
        #   G' = G - u gu^T - gu u^T + s u u^T          (exact: small ints)
        #   H' = H - fu gu^T - hu u^T + s fu u^T        (rank-2 f32 adds)
        # The u-outer terms only touch columns a and b, expressed as fused
        # one-hot broadcasts — no scatters, no gathers.
        a_idx, b_idx = moves
        a, b = a_idx[idx], b_idx[idx]
        ia = jnp.arange(n, dtype=jnp.int32)
        oa = (ia == a).astype(jnp.float32)
        ob = (ia == b).astype(jnp.float32)
        d = oa - ob  # u as a dense vector
        gu = st.g @ d
        hu = st.h @ d
        fu = flow @ d
        s = jnp.dot(d, gu)
        g2 = (
            st.g
            - d[:, None] * gu[None, :]
            - gu[:, None] * d[None, :]
            + s * d[:, None] * d[None, :]
        )
        h2 = (
            st.h
            - fu[:, None] * gu[None, :]
            + (s * fu - hu)[:, None] * oa[None, :]
            + (hu - s * fu)[:, None] * ob[None, :]
        )
        pa, pb = st.p[a], st.p[b]
        p2 = st.p.at[a].set(pb).at[b].set(pa)
        return QAPState(p2, g2, h2)

    def perturb_inc(st, is_elite, key):
        # Perturb the permutation, then REBUILD G and H with the matmuls —
        # once per round, which also bounds H's f32 drift to one descent.
        p2 = perturb(st.p, is_elite, key)
        return QAPState(p2, *_gh_from_p(p2))

    if incremental:
        if nbr_axis is not None:
            raise ValueError("incremental excludes nbr_axis sharding")
        return Problem(
            name=f"qap-{n}-inc",
            init=init_inc,
            score=score_inc,
            is_best=is_best,
            fingerprint=fingerprint_inc,
            neighborhood=neighborhood_inc,
            move_fp=move_fp_inc,
            apply_move=apply_move_inc,
            perturb=perturb_inc,
            width=n * n,
        )

    if nbr_axis is not None:
        nbr_fn = neighborhood_sharded
    elif compact:
        nbr_fn = neighborhood_compact
    else:
        nbr_fn = neighborhood
    return Problem(
        name=f"qap-{n}" + ("-compact" if compact and nbr_axis is None else ""),
        init=init,
        score=score,
        is_best=is_best,
        fingerprint=fingerprint,
        neighborhood=nbr_fn,
        move_fp=move_fp,
        apply_move=apply_move,
        perturb=perturb,
        width=n * n,
    )
