"""P>=128 trials for scheduling-365d-20e (VERDICT r3 weak-7 / directive 1).

Round-3 recorded that the axon worker CRASHES compiling the dense 365d
program at P=256 and wrote the workaround rule "at P >= 128 keep <= 25
loop trips per dispatch" — but never tested it.  This probe tests, in
increasing-risk order (each stage only runs if the previous survived):

1. dense isolation block at P=128 with K=25 iters/dispatch (the rule as
   written, on the program family that crashed);
2. the production QUALITY mode (random-window W=100 — a ~40x smaller
   program) at P=128, one 62 s quality run;
3. the quality mode at P=256.

Quality stages report best-at-{2.3,10,60} s with per-round fine probing.
Run: python -u bench/sched_p128.py   (env: P128_STAGES=1,2,3)
"""

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [int(s) for s in os.environ.get("P128_STAGES", "1,2,3").split(",")]
BUDGETS = [2.3, 10.0, 60.0]


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from constraint_solver_tpu.core.ils import SolverConfig
    from constraint_solver_tpu.models.scheduling import (
        ScheduleSpec, make_scheduling_problem)
    from constraint_solver_tpu.parallel.population import PopulationSolver

    d0 = datetime.date(2024, 1, 1)
    spec = ScheduleSpec.from_dates(
        d0, d0 + datetime.timedelta(days=364), 20,
        {e: [d0 + datetime.timedelta(days=(17 * e + 11 * k) % 365)
             for k in range(10)] for e in range(20)})

    if 1 in STAGES:
        log("stage 1: dense block isolation, P=128, K=25 trips/dispatch")
        prob = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=256)
        P, K = 128, 25
        keys = jax.random.split(jax.random.key(0), P)
        states = jax.vmap(prob.init)(keys)
        scores = jax.vmap(prob.score)(states)

        def block(state, score, key):
            def body(i, acc):
                nb = prob.neighborhood(state, score, jax.random.fold_in(key, i))
                return acc + jnp.min(nb.scores[:, 0])
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        fn = jax.jit(jax.vmap(block))
        t0 = time.time()
        out = np.asarray(fn(states, scores, keys))
        log(f"  compile+first dispatch OK in {time.time() - t0:.1f}s")
        walls = []
        for _ in range(3):
            t0 = time.time()
            out = np.asarray(fn(states, scores, keys))
            walls.append(time.time() - t0)
        w = min(walls)
        log(f"  P=128 K=25 dense block: {w * 1000 / K:.2f} ms/iter, "
            f"{P * prob.width * K / w:.3g} moves/s  (rule SURVIVES)")

    def quality_run(pop, seed):
        prob = make_scheduling_problem(spec, proposer="random", window_size=100)
        cfg = SolverConfig(
            seed=seed, local_search_max_iterations=1_000,
            best_solutions_capacity=16, all_solutions_capacity=256,
            all_solution_iteration_expiry=1_000,
            iterated_local_search_max_iterations=100_000,
            max_allow_no_improvement_for=20)
        w = PopulationSolver(prob, cfg, population=pop, exchange_every=2)
        w.state = w._chunk_jit(w.state, 1)
        w.state = w._chunk_jit(w.state, 2)
        w.get_best_score()
        s = PopulationSolver(prob, cfg, population=pop, exchange_every=2)
        at, bi, rounds, traj = [], 0, 0, []
        t0 = time.time()
        while bi < len(BUDGETS):
            chunk = 1 if rounds < 16 else 2
            s.state = s._chunk_jit(s.state, chunk)
            rounds += chunk
            best = s.get_best_score()
            el = time.time() - t0
            if not traj or traj[-1][1] != best:
                traj.append((round(el, 2), best))
            while bi < len(BUDGETS) and el >= BUDGETS[bi]:
                at.append(best)
                bi += 1
        log(f"  P={pop}: {at} rounds={rounds}")
        log(f"    traj: {traj}")

    if 2 in STAGES:
        log("stage 2: quality mode (random W=100) at P=128")
        for rep in range(int(os.environ.get("P128_REPS", 2))):
            quality_run(128, f"p128-{rep}")

    if 3 in STAGES:
        log("stage 3: quality mode (random W=100) at P=256")
        for rep in range(int(os.environ.get("P128_REPS", 2))):
            quality_run(256, f"p256-{rep}")


if __name__ == "__main__":
    main()
