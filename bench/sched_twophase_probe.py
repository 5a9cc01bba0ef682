"""Two-phase scheduling quality probe: shallow fast rounds early (many
perturb cycles/s drive the big soft drops), deep descents late (the last
soft points need long descents).  State is engine-agnostic, so switching
ls_max is just dispatching a different compiled chunk program on the same
IlsState.

Run: python -u bench/sched_twophase_probe.py
Env: PHASE1_ROUNDS, PHASE1_LS, PHASE1_CHUNK, PHASE2_LS, PHASE2_CHUNK, BUDGET.
"""

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from constraint_solver_tpu.core.ils import SolverConfig
from constraint_solver_tpu.models.scheduling import (
    ScheduleSpec,
    make_scheduling_problem,
)
from constraint_solver_tpu.parallel.population import PopulationSolver

P1_ROUNDS = int(os.environ.get("PHASE1_ROUNDS", 32))
P1_LS = int(os.environ.get("PHASE1_LS", 50))
P1_CHUNK = int(os.environ.get("PHASE1_CHUNK", 8))
P2_LS = int(os.environ.get("PHASE2_LS", 200))
P2_CHUNK = int(os.environ.get("PHASE2_CHUNK", 4))
BUDGET = float(os.environ.get("BUDGET", 65))
POP = int(os.environ.get("POP", 64))


def cfg(ls_max):
    return SolverConfig(
        seed="bench",
        local_search_max_iterations=ls_max,
        best_solutions_capacity=16,
        all_solutions_capacity=256,
        all_solution_iteration_expiry=1_000,
        iterated_local_search_max_iterations=10_000,
        max_allow_no_improvement_for=20,
        tabu_exact_filter=False,
    )


def main() -> None:
    d0 = datetime.date(2024, 1, 1)
    spec = ScheduleSpec.from_dates(
        d0, d0 + datetime.timedelta(days=364), 20,
        {e: [d0 + datetime.timedelta(days=(17 * e + 11 * k) % 365)
             for k in range(10)] for e in range(20)},
    )
    problem = make_scheduling_problem(spec, proposer="dense", n_rand_swaps=0)

    t0 = time.time()
    s1 = PopulationSolver(problem, cfg(P1_LS), population=POP,
                          exchange_every=P1_CHUNK)
    s1.state = s1._chunk_jit(s1.state, P1_CHUNK)
    s2 = PopulationSolver(problem, cfg(P2_LS), population=POP,
                          exchange_every=P2_CHUNK)
    s2.state = s2._chunk_jit(s2.state, P2_CHUNK)
    print(f"warm-up {time.time() - t0:.1f}s", flush=True)

    solver = PopulationSolver(problem, cfg(P1_LS), population=POP,
                              exchange_every=P1_CHUNK)
    t0 = time.time()
    rounds = 0
    while True:
        if rounds < P1_ROUNDS:
            solver.state = solver._chunk_jit(solver.state, P1_CHUNK)
            rounds += P1_CHUNK
        else:
            solver.state = s2._chunk_jit(solver.state, P2_CHUNK)
            rounds += P2_CHUNK
        hard, soft = solver.get_best_score()
        el = time.time() - t0
        print(f"t={el:7.2f}s rounds={rounds:4d} best=({hard:.0f}, {soft:.0f})",
              flush=True)
        if el >= BUDGET or (hard, soft) == (0.0, 0.0):
            break


if __name__ == "__main__":
    main()
