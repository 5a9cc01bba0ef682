"""Tabu-tenure sensitivity sweep (VERDICT round-2 item 5).

The reference configures all_solutions_capacity=100_000 with expiry=10_000
on nqueens (ref examples/nqueens/src/main.rs:131-134) and capacity=100_000
with expiry=1_000 on scheduling (main.rs:25-31); the repo's dense ring
defaults to 512 slots, so effective tenure is CAPACITY-bound: the ring
forgets a solution after `cap` further pushes even when the configured
iteration expiry would keep it tabu.  This sweep holds expiry at the
reference value and sweeps ring capacity, measuring what capacity buys:

- nqueens-1000: time-to-zero (REPS fresh solves each),
- scheduling-365d-20e: best (hard, soft) at a ~60 s wall, plus moves/s
  (the exact [W, T] filter's cost grows with T, so bigger rings must pay
  for themselves in quality per wall-second, not per round).

Run on the chip: python -u bench/tabu_tenure.py
Env: TENURE_CAPS, TENURE_REPS, TENURE_BUDGET.
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
BUDGET = float(os.environ.get("TENURE_BUDGET", 60))


def nqueens_cfg(cap: int) -> SolverConfig:
    return SolverConfig(
        seed="bench",
        local_search_max_iterations=250,
        all_solutions_capacity=cap,
        all_solution_iteration_expiry=10_000,  # reference value, held fixed
        best_solutions_capacity=8,
        iterated_local_search_max_iterations=10_000,
        max_allow_no_improvement_for=5,
    )


def sched_cfg(cap: int) -> SolverConfig:
    return SolverConfig(
        seed="bench",
        local_search_max_iterations=200,
        all_solutions_capacity=cap,
        all_solution_iteration_expiry=1_000,  # reference value, held fixed
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
    sched = make_scheduling_problem(spec, proposer="dense")

    print(f"caps={CAPS} reps={REPS} sched_budget={BUDGET}s", flush=True)
    for cap in CAPS:
        ncfg, scfg = nqueens_cfg(cap), sched_cfg(cap)
        # nqueens: warm-up compile for this ring shape, then timed solves.
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
        # scheduling: warm-up, then one ~BUDGET-second wall solve probing
        # the 8-byte best score each chunk.
        warm = PopulationSolver(sched, scfg, population=64, exchange_every=2)
        warm.state = warm._chunk_jit(warm.state, 2)
        sp = PopulationSolver(sched, scfg, population=64, exchange_every=2)
        t0 = time.time()
        rounds = 0
        while True:
            sp.state = sp._chunk_jit(sp.state, 2)
            rounds += 2
            best = sp.get_best_score()
            el = time.time() - t0
            if el >= BUDGET or best == (0.0, 0.0):
                break
        sp._wall = el
        st = sp.stats()
        print(
            f"cap={cap:5d} | nq ttz {ttzs} | sched best@{el:.0f}s "
            f"{best} rounds={rounds} {st['moves_per_sec']:.3g} moves/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
