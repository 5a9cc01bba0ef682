"""Parallel min-conflicts solver tests."""

import jax
import jax.numpy as jnp
import numpy as np

from constraint_solver_tpu.models.nqueens import total_conflicts
from constraint_solver_tpu.models.nqueens_parallel import (
    ParallelMinConflictsSolver,
    pmc_solve,
)


def test_solves_small_boards():
    for n in (8, 16, 32):
        out = pmc_solve(n, jax.random.key(0), max_steps=2000)
        assert float(out.score) == 0.0, f"n={n} unsolved: {float(out.score)}"
        rows = np.asarray(out.state.rows)
        assert int(total_conflicts(jnp.asarray(rows))) == 0


def test_solves_n200():
    out = pmc_solve(200, jax.random.key(1), max_steps=3000)
    assert float(out.score) == 0.0
    assert int(total_conflicts(out.state.rows)) == 0


def test_score_tracks_true_conflicts():
    out = pmc_solve(24, jax.random.key(2), max_steps=50)
    assert float(out.score) == int(total_conflicts(out.state.rows))


def test_solver_wrapper_and_population():
    solver = ParallelMinConflictsSolver(16, seed="7", population=4)
    (score, _), state = solver.get_best_solution()
    assert score == 0.0
    assert sorted(state.rows.tolist()) == list(range(16))
    assert solver.stats()["moves_evaluated"] > 0


def test_deterministic():
    a = pmc_solve(32, jax.random.key(9))
    b = pmc_solve(32, jax.random.key(9))
    np.testing.assert_array_equal(
        np.asarray(a.state.rows), np.asarray(b.state.rows)
    )
    assert int(a.steps) == int(b.steps)


def test_sampled_columns_mode_solves():
    out = pmc_solve(64, jax.random.key(4), max_steps=3000, sample_cols=16)
    assert float(out.score) == 0.0
    assert int(total_conflicts(out.state.rows)) == 0
