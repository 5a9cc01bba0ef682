"""Date-sharded SOLVER correctness: trajectory identity with the dense
solver (VERDICT round-1 item 4 — seq_shard becomes a solver, not a scorer).

The sharded solve runs the unchanged ILS engine inside a shard_map over a
4-device ``seq`` mesh with the day axis sharded; every candidate score is
produced by the owner shard's halo-extended region + psum.  Scores are
small exact integers in f32, so the sharded trajectory must equal the
dense ``proposer="random"`` trajectory BIT-FOR-BIT on the same seed.
"""

import datetime

import jax
import numpy as np

from constraint_solver_tpu.core.ils import Solver, SolverConfig
from constraint_solver_tpu.models.scheduling import (
    ScheduleSpec,
    make_scheduling_problem,
)
from constraint_solver_tpu.parallel.seq_solver import SeqShardedSolver

D0 = datetime.date(2022, 5, 9)


def _spec(days, emps, holidays=None):
    return ScheduleSpec.from_dates(
        D0, D0 + datetime.timedelta(days=days - 1), emps, holidays
    )


def _cfg(rounds):
    return SolverConfig(
        seed="seqsolve",
        local_search_max_iterations=30,
        iterated_local_search_max_iterations=rounds,
        all_solutions_capacity=64,
        all_solution_iteration_expiry=200,
        best_solutions_capacity=8,
        max_allow_no_improvement_for=5,
    )


def test_seq_sharded_solve_equals_dense_trajectory():
    spec = _spec(64, 7, {0: [D0 + datetime.timedelta(days=5)],
                         3: [D0 + datetime.timedelta(days=k) for k in (10, 40)]})
    mesh = jax.make_mesh(
        (4,), ("seq",),
        axis_types=(jax.sharding.AxisType.Auto,),
    )

    sharded = SeqShardedSolver(spec, _cfg(12), mesh, window_size=32)
    sharded.run(max_rounds=12, chunk=4)
    (sh_hard, sh_soft), sh_assign = sharded.get_best_solution()

    dense = Solver(
        make_scheduling_problem(spec, window_size=32, proposer="random"),
        _cfg(12),
    )
    dense.run(max_rounds=12, chunk=4)
    (dn_hard, dn_soft), dn_assign = dense.get_best_solution()

    assert (sh_hard, sh_soft) == (dn_hard, dn_soft)
    np.testing.assert_array_equal(sh_assign, dn_assign)
    assert sharded.stats()["ls_iterations"] == dense.stats()["ls_iterations"]


def test_seq_sharded_solve_nondivisible_days():
    """D not divisible by the shard count: padded days must never leak into
    scores (sharded best score == dense full score of the same assign)."""
    spec = _spec(61, 5)
    mesh = jax.make_mesh(
        (4,), ("seq",),
        axis_types=(jax.sharding.AxisType.Auto,),
    )
    sharded = SeqShardedSolver(spec, _cfg(6), mesh, window_size=16)
    sharded.run(max_rounds=6, chunk=3)
    (hard, soft), assign = sharded.get_best_solution()
    assert assign.shape == (61,)
    dense_score = np.asarray(
        make_scheduling_problem(spec).score(jax.numpy.asarray(assign))
    )
    assert (hard, soft) == (dense_score[0], dense_score[1])
