"""Heterogeneous acceptance portfolio (SA/greedy/reference lanes) and
periodic culling."""

import jax
import jax.numpy as jnp
import numpy as np

from constraint_solver_tpu.core.ils import Solver, SolverConfig, ils_init, ils_round
from constraint_solver_tpu.models.nqueens import make_nqueens_problem
from constraint_solver_tpu.parallel.population import (
    PopulationSolver,
    portfolio_temps,
)


def _config(rounds=40):
    return SolverConfig(
        seed="42",
        local_search_max_iterations=200,
        best_solutions_capacity=8,
        all_solutions_capacity=64,
        all_solution_iteration_expiry=200,
        iterated_local_search_max_iterations=rounds,
        max_allow_no_improvement_for=5,
    )


def test_portfolio_temps_layout():
    t = np.asarray(portfolio_temps(16, "mixed"))
    assert (t[:4] == 0.0).all()          # greedy quarter
    assert (t[4:8] > 0.0).all()          # SA quarter
    assert (t[8:] == -1.0).all()         # reference half
    t_ref = np.asarray(portfolio_temps(8, "reference"))
    assert (t_ref == -1.0).all()


def test_mixed_portfolio_solves():
    solver = PopulationSolver(
        make_nqueens_problem(8), _config(), population=8,
        portfolio="mixed", cull_frac=0.25,
    )
    solver.run()
    (hard, _), _ = solver.get_best_solution()
    assert hard == 0


def test_greedy_lane_never_accepts_worse():
    """A temp=0 lane's current score must be monotonically non-increasing
    across rounds (greedy acceptance), modulo the scheduled random restarts
    (round % 50) and perturbation — so check over a restart-free window
    where current only moves via acceptance."""
    problem = make_nqueens_problem(10)
    config = _config(rounds=30)
    st = ils_init(
        problem, config,
        jax.random.key(3), accept_temp=0.0,
    )
    from functools import partial

    step = jax.jit(
        partial(ils_round, problem, config.ls_params(), config.ils_params())
    )
    prev = float(st.current_score[0])
    # Greedy acceptance chooses lex-min(current, new); since new is a local
    # search result from a perturbed current it may be worse than current —
    # greedy keeps current then.  So current_score never increases.
    for i in range(20):
        st = step(st)
        cur = float(st.current_score[0])
        assert cur <= prev + 1e-6, f"round {i}: greedy accepted worse ({prev} -> {cur})"
        prev = cur


def test_sa_lane_is_valid_search():
    st_solver = Solver(make_nqueens_problem(8), _config(rounds=25))
    # Run an SA-only population; it must still find a solution eventually.
    solver = PopulationSolver(
        make_nqueens_problem(8), _config(rounds=60), population=4,
        portfolio="mixed",
    )
    solver.run()
    (hard, _), _ = solver.get_best_solution()
    assert hard <= 2
    del st_solver
