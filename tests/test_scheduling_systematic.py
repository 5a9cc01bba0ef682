"""Systematic scheduling proposer parity (ref ScheduleMoveProposer,
examples/employee-scheduling/src/lib.rs:493-559)."""

import datetime

import jax
import jax.numpy as jnp
import numpy as np

from constraint_solver_tpu.models.scheduling import (
    ScheduleSpec,
    make_scheduling_problem,
)


def _spec(days=10, emps=3):
    start = datetime.date(2022, 5, 9)
    return ScheduleSpec.from_dates(
        start, start + datetime.timedelta(days=days - 1), emps
    )


def test_systematic_neighborhood_enumerates_rotations():
    spec = _spec(days=5, emps=3)
    problem = make_scheduling_problem(spec, proposer="systematic")
    assign = jnp.asarray([0, 1, 2, 0, 1], jnp.int32)
    nb = problem.neighborhood(assign, problem.score(assign), jax.random.key(0))
    cands = np.asarray(nb.moves)
    assert cands.shape == (5 * 2, 5)  # D x (E-1) candidates
    # Each candidate differs from the start in exactly one day, rotated to a
    # successor employee (e + k) mod E, and every (day, successor) appears.
    seen = set()
    for cand in cands:
        diff = np.flatnonzero(cand != np.asarray(assign))
        assert len(diff) == 1
        d = diff[0]
        seen.add((int(d), int(cand[d])))
        assert cand[d] != assign[d]
    assert len(seen) == 10


def test_systematic_solver_improves():
    from constraint_solver_tpu.core.ils import Solver, SolverConfig

    spec = _spec(days=14, emps=4)
    problem = make_scheduling_problem(spec, proposer="systematic")
    solver = Solver(
        problem,
        SolverConfig(
            seed="1",
            local_search_max_iterations=200,
            iterated_local_search_max_iterations=30,
            max_allow_no_improvement_for=5,
        ),
    )
    start_score = float(
        np.asarray(problem.score(problem.init(jax.random.key(0))))[0]
    )
    solver.run(chunk=10)
    (hard, _), _ = solver.get_best_solution()
    assert hard <= start_score
    assert hard <= 2  # systematic descent should reach (near-)feasibility
