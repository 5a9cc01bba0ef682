"""Tabu-tenure sensitivity sweep (VERDICT round-2 item 5).

The reference nqueens CLI configures all_solutions_capacity=100_000 with
expiry=10_000 (ref examples/nqueens/src/main.rs:131-134); the repo's dense
ring defaults to 512 slots, so effective tenure is capacity-bound.  This
sweep measures what the ring size actually buys: time-to-zero on
nqueens-1000 and quality-at-fixed-rounds on scheduling-365d-20e across
capacities (expiry scaled to keep the reference's 512:10_000 proportion).

Run on the chip: python -u bench/tabu_tenure.py
"""

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from constraint_solver_tpu.core.ils import SolverConfig  # noqa: E402
from constraint_solver_tpu.models.nqueens import make_nqueens_problem  # noqa: E402
from constraint_solver_tpu.models.scheduling import (  # noqa: E402
    ScheduleSpec,
    make_scheduling_problem,
)
from constraint_solver_tpu.parallel.population import PopulationSolver  # noqa: E402

CAPS = [int(c) for c in os.environ.get("TENURE_CAPS", "128,256,512,2048").split(",")]
REPS = int(os.environ.get("TENURE_REPS", 2))


def nqueens_cfg(cap: int) -> SolverConfig:
    return SolverConfig(
        seed="bench",
        local_search_max_iterations=250,
        all_solutions_capacity=cap,
        all_solution_iteration_expiry=max(1, cap * 10_000 // 512),
        best_solutions_capacity=8,
        iterated_local_search_max_iterations=10_000,
        max_allow_no_improvement_for=5,
    )


def sched_cfg(cap: int) -> SolverConfig:
    return SolverConfig(
        seed="bench",
        local_search_max_iterations=200,
        all_solutions_capacity=cap,
        all_solution_iteration_expiry=max(1, cap * 1_000 // 256),
        best_solutions_capacity=16,
        iterated_local_search_max_iterations=10_000,
        max_allow_no_improvement_for=20,
    )


def main() -> None:
    on_tpu = jax.devices()[0].platform != "cpu"
    nq = make_nqueens_problem(1000, use_pallas=on_tpu)
    d0 = datetime.date(2024, 1, 1)
    spec = ScheduleSpec.from_dates(
        d0, d0 + datetime.timedelta(days=364), 20,
        {e: [d0 + datetime.timedelta(days=(17 * e + 11 * k) % 365)
             for k in range(10)] for e in range(20)},
    )
    sched = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=0)

    print("cap | expiry | nqueens ttz (s, reps) | sched best@40r | sched wall",
          flush=True)
    for cap in CAPS:
        ncfg, scfg = nqueens_cfg(cap), sched_cfg(cap)
        # warm-up compiles for this ring shape
        PopulationSolver(nq, ncfg, population=64, exchange_every=2).run(
            max_rounds=2, chunk=2
        )
        ttzs = []
        for _ in range(REPS):
            s = PopulationSolver(nq, ncfg, population=64, exchange_every=2)
            t0 = time.time()
            s.run(chunk=2)
            ttzs.append(round(time.time() - t0, 2))
            assert s.get_best_score()[0] == 0.0, s.get_best_score()
        sp = PopulationSolver(sched, scfg, population=64, exchange_every=2)
        sp.run(max_rounds=2, chunk=2)
        sp = PopulationSolver(sched, scfg, population=64, exchange_every=2)
        t0 = time.time()
        sp.run(max_rounds=40, chunk=2)
        wall = round(time.time() - t0, 2)
        print(
            f"{cap:5d} | {scfg.all_solution_iteration_expiry:6d}/"
            f"{ncfg.all_solution_iteration_expiry:6d} | {ttzs} | "
            f"{sp.get_best_score()} | {wall}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
