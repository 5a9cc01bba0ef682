"""Checkpoint/resume: bit-exact state round-trip and deterministic
continuation (SURVEY.md §5)."""

import jax
import numpy as np
import pytest

from constraint_solver_tpu.core.ils import Solver, SolverConfig
from constraint_solver_tpu.models.nqueens import make_nqueens_problem
from constraint_solver_tpu.parallel.population import PopulationSolver


def _cfg(rounds=30):
    return SolverConfig(
        seed="ckpt",
        local_search_max_iterations=100,
        iterated_local_search_max_iterations=rounds,
        all_solutions_capacity=64,
        all_solution_iteration_expiry=100,
    )


def test_solver_checkpoint_roundtrip(tmp_path):
    problem = make_nqueens_problem(10)
    a = Solver(problem, _cfg())
    a.run(max_rounds=7, chunk=7)
    path = str(tmp_path / "ck.npz")
    a.save(path)

    b = Solver(problem, _cfg())
    b.load(path)
    # Bit-exact state round-trip.
    for la, lb in zip(jax.tree.leaves(a.state), jax.tree.leaves(b.state)):
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(la) if "key" in str(la.dtype) else la),
            np.asarray(jax.random.key_data(lb) if "key" in str(lb.dtype) else lb),
        )

    # Deterministic continuation: both continue identically.
    a.run(max_rounds=5, chunk=5)
    b.run(max_rounds=5, chunk=5)
    sa, ra = a.get_best_solution()
    sb, rb = b.get_best_solution()
    assert sa == sb
    for la, lb in zip(jax.tree.leaves(ra), jax.tree.leaves(rb)):
        np.testing.assert_array_equal(la, lb)


def test_population_checkpoint_roundtrip(tmp_path):
    problem = make_nqueens_problem(8)
    a = PopulationSolver(problem, _cfg(), population=4)
    a.run(max_rounds=5, chunk=5)
    path = str(tmp_path / "pk.npz")
    a.save(path)
    b = PopulationSolver(problem, _cfg(), population=4)
    b.load(path)
    for key in ("rounds", "population", "ls_iterations", "moves_evaluated"):
        assert a.stats()[key] == b.stats()[key]
    sa, _ = a.get_best_solution()
    sb, _ = b.get_best_solution()
    assert sa == sb


def test_checkpoint_rejects_wrong_problem(tmp_path):
    a = Solver(make_nqueens_problem(8), _cfg())
    path = str(tmp_path / "x.npz")
    a.save(path)
    b = Solver(make_nqueens_problem(8, sample_cols=2), _cfg())
    b.problem = b.problem._replace(name="other")
    with pytest.raises(ValueError, match="checkpoint is for"):
        b.load(path)


def test_checkpoint_rejects_population_mode_mismatch(tmp_path):
    """A population checkpoint loaded into a single-trajectory solver (or a
    differently-sized population) must raise a real exception — these are
    ValueError (not assert) so `python -O` cannot strip the check and let the
    state silently mis-trace."""
    problem = make_nqueens_problem(8)
    pop = PopulationSolver(problem, _cfg(), population=4)
    pop.run(max_rounds=2, chunk=2)
    path = str(tmp_path / "pop.npz")
    pop.save(path)

    single = Solver(problem, _cfg())
    with pytest.raises(ValueError, match="population-mode"):
        single.load(path)

    # Population-size mismatch is also a hard error.
    other = PopulationSolver(problem, _cfg(), population=8)
    with pytest.raises(ValueError, match="population"):
        other.load(path)


def test_checkpoint_path_without_npz_extension(tmp_path):
    problem = make_nqueens_problem(8)
    a = Solver(problem, _cfg())
    a.run(max_rounds=3, chunk=3)
    path = str(tmp_path / "bare_path")  # no .npz
    a.save(path)
    b = Solver(problem, _cfg())
    b.load(path)
    sa, _ = a.get_best_solution()
    sb, _ = b.get_best_solution()
    assert sa == sb
