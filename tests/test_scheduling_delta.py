"""Delta-evaluation correctness for the scheduling domain.

The delta path (models/scheduling.py neighborhood) must produce EXACTLY the
scores of the full-rescore path for every candidate — the scheduling analog
of the nqueens counter-delta property tests (SURVEY.md §7 hard-part 1; ref
scorer examples/employee-scheduling/src/lib.rs:265-374).  All constraint
values are small integers in float32, so equality is exact, and identical
scores imply identical solver trajectories (same argmins, same tie-breaks).
"""

import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constraint_solver_tpu.core.ils import Solver, SolverConfig
from constraint_solver_tpu.models.scheduling import (
    ScheduleSpec,
    make_scheduling_problem,
)

D0 = datetime.date(2022, 5, 9)  # the reference CLI start date (a Monday)


def _spec(days, emps, holidays=None, start=D0):
    return ScheduleSpec.from_dates(
        start, start + datetime.timedelta(days=days - 1), emps, holidays
    )


SPECS = [
    _spec(31, 7),  # the reference CLI instance
    _spec(31, 7, {0: [D0 + datetime.timedelta(days=3)],
                  2: [D0 + datetime.timedelta(days=k) for k in (5, 6, 20)]}),
    _spec(9, 3),   # smallest H3-active size
    _spec(14, 2),  # smallest H4-active size
    _spec(7, 4),   # S1 active, H4 inactive
    _spec(3, 2),   # windows mostly inactive
    _spec(60, 5, {1: [D0 + datetime.timedelta(days=k) for k in range(0, 60, 7)]}),
    # A non-Monday start exercises the weekday/weekend layout.
    _spec(23, 4, None, start=datetime.date(2022, 5, 13)),
]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"{s.num_days}d{s.num_employees}e")
def test_delta_equals_rescore(spec):
    """Every candidate's delta score equals the full rescore, bit-exact."""
    delta_p = make_scheduling_problem(spec, window_size=64, proposer="random")
    resc_p = make_scheduling_problem(spec, window_size=64, proposer="rescore")
    for trial in range(4):
        key = jax.random.key(hash((spec.num_days, trial)) % (2**31))
        k_init, k_nb = jax.random.split(key)
        assign = delta_p.init(k_init)
        cur = delta_p.score(assign)
        nb_d = jax.jit(delta_p.neighborhood)(assign, cur, k_nb)
        nb_r = jax.jit(resc_p.neighborhood)(assign, cur, k_nb)
        # Same sampled moves ...
        for a, b in zip(jax.tree.leaves(nb_d.moves), jax.tree.leaves(nb_r.moves)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # ... and exactly equal candidate scores.
        np.testing.assert_array_equal(
            np.asarray(nb_d.scores), np.asarray(nb_r.scores)
        )


@pytest.mark.parametrize("spec", SPECS[:4], ids=lambda s: f"{s.num_days}d{s.num_employees}e")
def test_apply_move_and_fp_consistency(spec):
    """Applying any candidate yields a state whose full score equals the
    delta-predicted score, and whose fingerprint equals the O(1) move_fp."""
    problem = make_scheduling_problem(spec, window_size=32, proposer="random")
    key = jax.random.key(7)
    k_init, k_nb = jax.random.split(key)
    assign = problem.init(k_init)
    cur = problem.score(assign)
    cur_fp = problem.fingerprint(assign)
    nb = jax.jit(problem.neighborhood)(assign, cur, k_nb)
    for idx in range(0, 32, 3):
        idx = jnp.int32(idx)
        new_state = problem.apply_move(assign, nb.moves, idx)
        np.testing.assert_array_equal(
            np.asarray(problem.score(new_state)), np.asarray(nb.scores[idx])
        )
        np.testing.assert_array_equal(
            np.asarray(problem.fingerprint(new_state)),
            np.asarray(problem.move_fp(assign, cur_fp, nb.moves, idx)),
        )


def test_delta_and_rescore_trajectories_identical():
    """Identical scores => identical argmins => identical solver runs: the
    delta solver must reproduce the rescore solver's trajectory exactly."""
    spec = _spec(31, 7, {0: [D0 + datetime.timedelta(days=2)]})
    cfg = SolverConfig(
        seed="ab",
        local_search_max_iterations=40,
        iterated_local_search_max_iterations=12,
        all_solutions_capacity=64,
        all_solution_iteration_expiry=100,
        max_allow_no_improvement_for=5,
    )
    a = Solver(
        make_scheduling_problem(spec, window_size=32, proposer="random"), cfg
    )
    b = Solver(
        make_scheduling_problem(spec, window_size=32, proposer="rescore"), cfg
    )
    a.run(max_rounds=12, chunk=6)
    b.run(max_rounds=12, chunk=6)
    sa, ra = a.get_best_solution()
    sb, rb = b.get_best_solution()
    assert sa == sb
    np.testing.assert_array_equal(ra, rb)
    assert a.stats()["ls_iterations"] == b.stats()["ls_iterations"]
