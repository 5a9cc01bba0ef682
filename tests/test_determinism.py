"""Determinism/repeatability integration test — the analog of the reference's
``repeatable`` test (examples/nqueens/src/main.rs:152-201): for several seed
strings, repeated full solves must produce identical solutions AND solve
8-queens to zero conflicts every time.  Seeding is string -> blake2b-256 ->
PRNG key, mirroring the reference's string -> Blake2b-256 -> ChaCha20."""

import numpy as np
import pytest

from constraint_solver_tpu.core.ils import Solver, SolverConfig
from constraint_solver_tpu.models.nqueens import make_nqueens_problem


def _solve_once(seed: str):
    solver = Solver(
        make_nqueens_problem(8),
        SolverConfig(
            seed=seed,
            local_search_max_iterations=10_000,
            best_solutions_capacity=32,
            all_solutions_capacity=512,
            all_solution_iteration_expiry=1_000,
            iterated_local_search_max_iterations=10_000,
            max_allow_no_improvement_for=5,
        ),
    )
    solver.run(chunk=8)
    (hard, soft), state = solver.get_best_solution()
    return (hard, soft, tuple(state.rows.tolist()))


@pytest.mark.parametrize("seed", [str(s) for s in range(42, 46)])
def test_nqueens_repeatable_and_solved(seed):
    results = [_solve_once(seed) for _ in range(3)]
    first = results[0]
    for other in results[1:]:
        assert other == first, f"nondeterministic result with seed {seed}"
    assert first[0] == 0, f"8-queens unsolved with seed {seed}: {first}"
    assert sorted(first[2]) == list(range(8))


@pytest.mark.slow
@pytest.mark.parametrize("seed", [str(s) for s in range(42, 50)])
def test_nqueens_repeatable_reference_rigor(seed):
    """Full reference rigor (examples/nqueens/src/main.rs:152-201): seeds
    "42".."49", TEN reruns each, all identical and all solving 8-queens to
    zero conflicts.  Marked slow; run with `pytest -m slow` (the quick
    3x/4-seed variant above always runs)."""
    results = [_solve_once(seed) for _ in range(10)]
    first = results[0]
    for other in results[1:]:
        assert other == first, f"nondeterministic result with seed {seed}"
    assert first[0] == 0, f"8-queens unsolved with seed {seed}: {first}"
    assert sorted(first[2]) == list(range(8))


def test_diagram_repeatable():
    from constraint_solver_tpu.models.diagram_layout import (
        DiagramLayoutSpec,
        make_diagram_layout_problem,
    )

    spec = DiagramLayoutSpec.random(6, 6, 8, seed=1, max_size=2)
    results = []
    for _ in range(2):
        solver = Solver(
            make_diagram_layout_problem(spec),
            SolverConfig(
                seed="42",
                local_search_max_iterations=100,
                iterated_local_search_max_iterations=15,
                max_allow_no_improvement_for=5,
            ),
        )
        solver.run()
        (hard, soft), pos = solver.get_best_solution()
        results.append((hard, soft, tuple(map(tuple, np.asarray(pos).tolist()))))
    assert results[0] == results[1]


def test_qap_repeatable():
    from constraint_solver_tpu.models.qap import QAPSpec, make_qap_problem

    spec = QAPSpec.random(16, seed=0)
    results = []
    for _ in range(2):
        solver = Solver(
            make_qap_problem(spec),
            SolverConfig(
                seed="7",
                local_search_max_iterations=100,
                iterated_local_search_max_iterations=15,
                max_allow_no_improvement_for=5,
            ),
        )
        solver.run()
        (hard, soft), perm = solver.get_best_solution()
        results.append((hard, soft, tuple(np.asarray(perm).tolist())))
    assert results[0] == results[1]
