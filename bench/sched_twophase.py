"""Two-phase scheduling quality probe: deep descents early, shallow+wide late.

The round-3 sweep (bench/sched_quality_sweep.py) measured complementary
winners on 365d x 20e: ls=600/bail=25 reaches (0, 11) by ~1.8 s (deep
descents recover perturbation damage), while ls=200/bail=20 with 512
unrestricted random swaps reaches (0, 8) by ~50 s (frequent perturb/accept
cycles + close-pair swaps escape the soft plateau).  This probe runs the
deep program for SWITCH_ROUNDS rounds and hands the SAME population state to
the shallow program — the IlsState pytree is program-independent (engine
params are trace-time constants, not state), so the handoff is a plain
attribute assignment.

Run: python -u bench/sched_twophase.py   (env: TP_BUDGET, TP_SWITCH)
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

BUDGET = float(os.environ.get("TP_BUDGET", 62))
SWITCH = int(os.environ.get("TP_SWITCH", 12))


def _problems():
    d0 = datetime.date(2024, 1, 1)
    spec = ScheduleSpec.from_dates(
        d0, d0 + datetime.timedelta(days=364), 20,
        {e: [d0 + datetime.timedelta(days=(17 * e + 11 * k) % 365)
             for k in range(10)] for e in range(20)},
    )
    pa = make_scheduling_problem(
        spec, proposer="dense", n_rand_swaps=256
    )
    pb = make_scheduling_problem(
        spec, proposer="dense", n_rand_swaps=512
    )
    return pa, pb


def _cfg(ls, bail):
    return SolverConfig(
        seed="bench",
        local_search_max_iterations=ls,
        best_solutions_capacity=16,
        all_solutions_capacity=256,
        all_solution_iteration_expiry=1_000,
        iterated_local_search_max_iterations=100_000,
        max_allow_no_improvement_for=bail,
    )


def main() -> None:
    pa, pb = _problems()
    ca, cb = _cfg(600, 25), _cfg(200, 20)

    # Warm both programs outside the clock.
    for p, c in ((pa, ca), (pb, cb)):
        w = PopulationSolver(p, c, population=64, exchange_every=2)
        w.state = w._chunk_jit(w.state, 2)

    sa = PopulationSolver(pa, ca, population=64, exchange_every=2)
    sb = PopulationSolver(pb, cb, population=64, exchange_every=2)
    t0 = time.time()
    traj = []
    rounds = 0
    s = sa
    while True:
        s.state = s._chunk_jit(s.state, 2)
        rounds += 2
        if s is sa and rounds >= SWITCH:
            # >= (not ==): an odd TP_SWITCH must still trigger the handoff
            # on the next 2-round boundary (ADVICE round 3).
            sb.state = s.state  # program-independent pytree handoff
            s = sb
        best = s.get_best_score()
        el = time.time() - t0
        if not traj or traj[-1][1] != best:
            traj.append((round(el, 1), best))
        if el >= BUDGET or best == (0.0, 0.0):
            break
    print(f"twophase(switch@{SWITCH}): best@{el:.0f}s {best} rounds={rounds}",
          flush=True)
    print(f"  traj: {traj}", flush=True)


if __name__ == "__main__":
    main()
