"""Per-component isolation bench of the nqueens LS lockstep iteration.

BENCH_NOTES.md records a 3.95 ms/lockstep-iteration floor (P=256, n=1000,
A=50) for the full LS body, but nothing says where inside the body the time
goes.  This script times nested variants of the body on the real chip so the
VERDICT round-1 item 5 work ("push the single-chip ceiling") optimizes the
actual bottleneck:

  V4 sample   — key split + Gumbel top-k column sampling only
  V0 block    — V4 + the [A, n] candidate-score block (Pallas kernel)
  V1 +argmin  — V0 + lex_argmin + apply_move (state evolves, no tabu)
  V2 +tabu1   — V1 + winner fingerprint + tabu push + single membership check
  V3 full     — ls_execute verbatim (pick-then-check retry loop, best/bail
                bookkeeping), bail disabled so every iteration runs

Each variant is a jitted vmapped fori_loop of K iterations per dispatch
(~50 x 4 ms = 200 ms, far under the axon relay's dispatch ceiling).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("ISO_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from constraint_solver_tpu.core.local_search import LsParams, ls_execute
from constraint_solver_tpu.models.nqueens import make_nqueens_problem
from constraint_solver_tpu.ops.lex import lex_argmin

N = int(os.environ.get("ISO_N", 1000))
P = int(os.environ.get("ISO_P", 256))
K = int(os.environ.get("ISO_K", 50))
REPS = int(os.environ.get("ISO_REPS", 3))


def _force(out):
    # Through the axon tunnel only a host transfer is a trustworthy sync
    # (docs/DESIGN.md "Environment gotchas"); block_until_ready may return
    # before remote execution completes.
    import numpy as np

    return jax.tree.map(np.asarray, out)


def timeit(fn, *args):
    out = _force(fn(*args))  # compile
    best = float("inf")
    for r in range(REPS):
        t0 = time.time()
        out = _force(fn(*args))
        best = min(best, time.time() - t0)
    return best, out


def main():
    print(f"devices: {jax.devices()}", flush=True)
    on_tpu = jax.devices()[0].platform != "cpu"
    problem = make_nqueens_problem(N, use_pallas=on_tpu)
    a = max(1, N // 20)
    width = a * N

    key = jax.random.key(0)
    keys = jax.random.split(key, P)
    states = jax.vmap(problem.init)(keys)
    scores = jax.vmap(problem.score)(states)

    from constraint_solver_tpu.core.history import TabuRing

    tabu0 = jax.vmap(lambda _: TabuRing.create(256, 10_000))(jnp.arange(P))

    def v4_sample(state, score, key):
        def body(i, acc):
            k = jax.random.fold_in(key, i)
            k_g, k_n = jax.random.split(k)
            logits = jnp.log(state.cs.astype(jnp.float32) + 1e-4)
            gumbel = jax.random.gumbel(k_g, (N,))
            _, cols = jax.lax.top_k(logits + gumbel, a)
            num = jax.random.randint(k_n, (), 1, a + 1)
            return acc + cols[0] + num
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    def v0_block(state, score, key):
        def body(i, acc):
            nb = problem.neighborhood(state, score, jax.random.fold_in(key, i))
            return acc + jnp.min(nb.scores[:, 0])
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    def v1_argmin(state, score, key):
        def body(i, carry):
            st, sc = carry
            nb = problem.neighborhood(st, sc, jax.random.fold_in(key, i))
            idx = lex_argmin(nb.scores, nb.valid)
            return problem.apply_move(st, nb.moves, idx), nb.scores[idx]
        st, sc = jax.lax.fori_loop(0, K, body, (state, score))
        return sc

    def v2_tabu1(state, score, key):
        fp0 = problem.fingerprint(state)

        def body(i, carry):
            st, sc, fp, tabu, hits = carry
            tabu = tabu.push(fp)
            nb = problem.neighborhood(st, sc, jax.random.fold_in(key, i))
            idx = lex_argmin(nb.scores, nb.valid)
            cand_fp = problem.move_fp(st, fp, nb.moves, idx)
            hit = tabu.is_tabu(cand_fp[None, :])[0]
            st = problem.apply_move(st, nb.moves, idx)
            return st, nb.scores[idx], cand_fp, tabu, hits + hit.astype(jnp.int32)

        st, sc, fp, tabu, hits = jax.lax.fori_loop(
            0, K, body, (state, score, fp0, tabu0_one, jnp.int32(0))
        )
        return sc, hits

    def v3_full(state, score, key, tabu):
        params = LsParams(
            max_iterations=K, allow_no_improvement_for=K + 1, tabu_retries=8
        )
        best_state, best_score, tabu, iters, exhausted = ls_execute(
            problem, params, state, tabu, key
        )
        return best_score, iters, exhausted

    tabu0_one = TabuRing.create(256, 10_000)

    variants = [
        ("V4 sample-only", jax.jit(jax.vmap(v4_sample)), (states, scores, keys)),
        ("V0 +score-block", jax.jit(jax.vmap(v0_block)), (states, scores, keys)),
        ("V1 +argmin+apply", jax.jit(jax.vmap(v1_argmin)), (states, scores, keys)),
        ("V2 +tabu-single", jax.jit(jax.vmap(v2_tabu1)), (states, scores, keys)),
        ("V3 full ls_execute", jax.jit(jax.vmap(partial(v3_full))),
         (states, scores, keys, tabu0)),
    ]

    print(f"n={N} P={P} A={a} K={K} iters/dispatch, width={width}", flush=True)
    for name, fn, args in variants:
        wall, out = timeit(fn, *args)
        ms_per_iter = 1000.0 * wall / K
        tput = P * width * K / wall
        extra = ""
        if name.startswith("V2"):
            hits = int(jnp.sum(out[1]))
            extra = f" first-pick-tabu-hits={hits}/{P * K}"
        if name.startswith("V3"):
            iters = int(jnp.sum(out[1]))
            exh = int(jnp.sum(out[2]))
            ms_per_iter = 1000.0 * wall / K
            extra = f" iters={iters} exhausted={exh}"
        print(
            f"{name:22s} {wall * 1000:8.1f} ms / {K} iters = "
            f"{ms_per_iter:6.2f} ms/iter  ({tput:.3g} moves/s){extra}",
            flush=True,
        )


if __name__ == "__main__":
    main()
