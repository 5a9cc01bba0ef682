"""Round-4c: diversity levers on the winning quality mode (P=128).

The production quality mode (random W=100, reference engine constants,
P=128, exchange every 2) plateaus at (0,7) from ~8-15 s.  This sweep
probes the portfolio/diversity levers for a (0,6)-or-better late score:

  base    — the production mode as-is
  mixed   — heterogeneous acceptance portfolio (half reference 1:5:1,
            quarter greedy, quarter SA temps 0.5-8)
  cull    — rank-based culling of the worst 25% of lanes each exchange
  w256    — a 256-wide random window (more coverage per iteration)
  exch8   — elite exchange every 8 rounds (more lane independence)

Run: python -u bench/sched_quality_r4c.py  (env: R4C_BUDGETS, R4C_REPS)
"""

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGETS = [float(b) for b in os.environ.get("R4C_BUDGETS", "2.3,10,60").split(",")]
REPS = int(os.environ.get("R4C_REPS", 3))
POP = int(os.environ.get("R4C_POP", 128))


def log(m):
    print(m, flush=True)


def main():
    from constraint_solver_tpu.core.ils import SolverConfig
    from constraint_solver_tpu.models.scheduling import (
        ScheduleSpec, make_scheduling_problem)
    from constraint_solver_tpu.parallel.population import PopulationSolver

    d0 = datetime.date(2024, 1, 1)
    spec = ScheduleSpec.from_dates(
        d0, d0 + datetime.timedelta(days=364), 20,
        {e: [d0 + datetime.timedelta(days=(17 * e + 11 * k) % 365)
             for k in range(10)] for e in range(20)})

    problems = {
        100: make_scheduling_problem(spec, proposer="random", window_size=100),
        256: make_scheduling_problem(spec, proposer="random", window_size=256),
    }

    def cfg(seed):
        return SolverConfig(
            seed=seed, local_search_max_iterations=1_000,
            best_solutions_capacity=16, all_solutions_capacity=256,
            all_solution_iteration_expiry=1_000,
            iterated_local_search_max_iterations=100_000,
            max_allow_no_improvement_for=20)

    # name -> (window, exchange_every, portfolio, cull_frac)
    CONFIGS = {
        "base": (100, 2, "reference", 0.0),
        "mixed": (100, 2, "mixed", 0.0),
        "cull": (100, 2, "reference", 0.25),
        "w256": (256, 2, "reference", 0.0),
        "exch8": (100, 8, "reference", 0.0),
    }
    names = os.environ.get("R4C_CONFIGS")
    if names:
        CONFIGS = {n: CONFIGS[n] for n in names.split(",")}

    def build(name, seed):
        w, exch, port, cull = CONFIGS[name]
        return PopulationSolver(problems[w], cfg(seed), population=POP,
                                exchange_every=exch, portfolio=port,
                                cull_frac=cull)

    for name in CONFIGS:
        s = build(name, "warm")
        s.state = s._chunk_jit(s.state, 1)
        s.state = s._chunk_jit(s.state, 2)
        s.get_best_score()

    results = {}
    for name in CONFIGS:
        runs = []
        for rep in range(REPS):
            s = build(name, f"c{rep}")
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
            runs.append(at)
            log(f"{name} rep={rep}: {at} rounds={rounds}")
            log(f"  traj: {traj}")
        med = [sorted(r[i] for r in runs)[len(runs) // 2]
               for i in range(len(BUDGETS))]
        results[name] = med
        log(f"== {name}: median={med}")
    log(f"SUMMARY {results}")


if __name__ == "__main__":
    main()
