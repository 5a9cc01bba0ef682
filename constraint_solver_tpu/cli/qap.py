"""QAP CLI — the MXU-resident domain (no reference counterpart).

Solves a random symmetric Taillard-style instance (models/qap.py) with the
same solver stack as the reference-mirroring CLIs; every LS iteration scores
the full n(n-1)/2 swap neighborhood as one [n, n] MXU matmul.

Usage:
    python -m constraint_solver_tpu.cli.qap --size 64 --rounds 100
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="QAP example")
    parser.add_argument("--seed", "-s", default="42")
    parser.add_argument("--size", "-n", type=int, default=64)
    parser.add_argument("--instance-seed", type=int, default=0)
    parser.add_argument("--population", "-p", type=int, default=1)
    parser.add_argument("--rounds", type=int, default=100)
    parser.add_argument("--platform", choices=["tpu", "cpu"], default="tpu")
    parser.add_argument(
        "--compact", action=argparse.BooleanOptionalAction, default=None,
        help="row-min candidate compaction (models/qap.py compact=True): "
        "+40-50%% moves/s at n>=1024 on chip, identical winners; "
        "default: on for 512 <= --size < 4096",
    )
    parser.add_argument(
        "--incremental", action=argparse.BooleanOptionalAction, default=None,
        help="carry G/H in state with exact rank-2 swap updates "
        "(models/qap.py incremental=True): no per-iteration matmuls; "
        "measured fastest at n >= 4096 (+49%% over compact); "
        "default: on for --size >= 4096",
    )
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)
    if args.incremental is None:
        args.incremental = args.size >= 4096
    if args.compact is None:
        args.compact = args.size >= 512 and not args.incremental

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from constraint_solver_tpu.core.ils import Solver, SolverConfig
    from constraint_solver_tpu.models.qap import (
        QAPSpec,
        make_qap_problem,
        qap_cost_naive,
    )
    from constraint_solver_tpu.parallel.population import PopulationSolver

    print("qap example")
    spec = QAPSpec.random(args.size, seed=args.instance_seed)
    problem = make_qap_problem(
        spec, compact=args.compact, incremental=args.incremental)
    config = SolverConfig(
        seed=args.seed,
        local_search_max_iterations=100,
        best_solutions_capacity=16,
        all_solutions_capacity=256,
        all_solution_iteration_expiry=10_000,
        iterated_local_search_max_iterations=args.rounds,
        max_allow_no_improvement_for=5,
    )
    t0 = time.time()
    if args.population > 1:
        solver = PopulationSolver(problem, config, population=args.population)
    else:
        solver = Solver(problem, config)
    solver.run()
    (hard, _), perm = solver.get_best_solution()
    if hasattr(perm, "p"):  # incremental QAPState carries (p, G, H)
        perm = perm.p
    wall = time.time() - t0

    # Cross-check the device score against the host oracle.
    flow, dist = spec.arrays()
    oracle = qap_cost_naive(flow, dist, np.asarray(perm))
    assert abs(oracle - hard) < 1e-3 * max(1.0, abs(oracle)), (oracle, hard)
    if not args.quiet:
        print("result.permutation:", np.asarray(perm).tolist())
    print(f"result.cost: {hard:.0f}")
    print(f"stats: {solver.stats()} wall: {wall:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
