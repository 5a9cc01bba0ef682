"""Per-domain TPU measurements + MFU/roofline table for BENCH_NOTES.

Not the driver's headline harness (that's repo-root bench.py); this script
records moves/s + quality + the XLA-accounted roofline point (MFU, HBM
fraction, arithmetic intensity) for every domain on one chip — the VERDICT
r1 item-3 table.  Keeps dispatches small (chunk=2 rounds) per
docs/DESIGN.md axon rules.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from constraint_solver_tpu.core.ils import SolverConfig
from constraint_solver_tpu.parallel.population import PopulationSolver


def run(problem, config, pop, rounds, label, chunk=2):
    solver = PopulationSolver(problem, config, population=pop)
    t0 = time.time()
    solver.run(max_rounds=2, chunk=2)  # compile warm-up
    print(f"{label}: warm-up {time.time() - t0:.1f}s", flush=True)
    # Fresh instance reuses the compiled programs (program caches), so this
    # wall is pure solve time.
    solver = PopulationSolver(problem, config, population=pop)
    t0 = time.time()
    solver.run(max_rounds=rounds, chunk=chunk)
    wall = time.time() - t0
    (hard, soft), _ = solver.get_best_solution()
    stats = solver.stats()
    moves = stats["moves_evaluated"]
    print(
        f"{label}: P={pop} rounds={rounds} wall={wall:.2f}s "
        f"best=({hard}, {soft}) ls_iters={stats['ls_iterations']} "
        f"moves/s={moves / wall:.3g}",
        flush=True,
    )
    try:
        from constraint_solver_tpu.utils.roofline import format_roofline

        print(f"{label}: {format_roofline(solver.roofline(chunk=chunk))}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: roofline skipped ({e})", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    on_tpu = jax.devices()[0].platform != "cpu"

    # nqueens at the headline-bench configuration, so the MFU table covers
    # the VPU-bound flagship too (bench.py measures throughput; this
    # measures where that sits on the roofline).
    from constraint_solver_tpu.models.nqueens import make_nqueens_problem

    nq = make_nqueens_problem(1000, use_pallas=on_tpu)
    nq_config = SolverConfig(
        seed="bench",
        local_search_max_iterations=250,
        best_solutions_capacity=8,
        all_solutions_capacity=256,
        iterated_local_search_max_iterations=10_000,
        max_allow_no_improvement_for=5,
    )
    run(nq, nq_config, pop=256, rounds=6, label="nqueens-1000")

    from constraint_solver_tpu.models.diagram_layout import (
        DiagramLayoutSpec,
        make_diagram_layout_problem,
    )

    spec = DiagramLayoutSpec.random(64, 96, 32, seed=0, max_size=4)
    problem = make_diagram_layout_problem(spec)
    config = SolverConfig(
        seed="bench",
        local_search_max_iterations=50,
        best_solutions_capacity=8,
        all_solutions_capacity=128,
        all_solution_iteration_expiry=1_000,
        iterated_local_search_max_iterations=100_000,
        max_allow_no_improvement_for=5,
    )
    run(problem, config, pop=64, rounds=6, label="diagram-64b-32g")

    from constraint_solver_tpu.models.qap import QAPSpec, make_qap_problem

    qap = make_qap_problem(QAPSpec.random(256, seed=0))
    run(qap, config, pop=64, rounds=6, label="qap-256")
    # Row-min compact proposer (models/qap.py compact=True): identical
    # winners, fewer VPU passes — the n>=1024 A/B lives in qap_scale.py.
    qap_c = make_qap_problem(QAPSpec.random(256, seed=0), compact=True)
    run(qap_c, config, pop=64, rounds=6, label="qap-256c")

    # Reference CLI scheduling instance (7 employees, 31 days from
    # 2022-05-09; ref employee-scheduling main.rs:8-63), wasm-bridge params.
    import datetime

    from constraint_solver_tpu.models.scheduling import (
        ScheduleSpec,
        make_scheduling_problem,
    )

    spec = ScheduleSpec.from_dates(
        datetime.date(2022, 5, 9), datetime.date(2022, 6, 8), 7
    )
    sched = make_scheduling_problem(spec, proposer="dense")
    sched_config = SolverConfig(
        seed="bench",
        local_search_max_iterations=1_000,
        best_solutions_capacity=64,
        all_solutions_capacity=512,
        all_solution_iteration_expiry=1_000,
        iterated_local_search_max_iterations=250,
        max_allow_no_improvement_for=20,
    )
    run(sched, sched_config, pop=64, rounds=250, label="scheduling-31d-7e")


if __name__ == "__main__":
    main()
