"""Engine behavior tests, mirroring the reference's test pyramid
(SURVEY.md §4; reference local-search/src/local_search.rs:350-471 and
iterated_local_search.rs:205-324)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constraint_solver_tpu.core.history import EliteArchive, TabuRing
from constraint_solver_tpu.core.ils import Solver, SolverConfig
from constraint_solver_tpu.core.local_search import LsParams, ls_execute
from constraint_solver_tpu.models.ackley import make_ackley_problem
from constraint_solver_tpu.models.nqueens import make_nqueens_problem
from constraint_solver_tpu.ops.lex import make_score


def test_tabu_ring_membership_and_expiry():
    ring = TabuRing.create(4, expiry=100)
    fp_a = jnp.asarray([1, 2], jnp.uint32)
    fp_b = jnp.asarray([3, 4], jnp.uint32)
    ring = ring.push(fp_a)
    assert bool(ring.is_tabu(fp_a[None, :])[0])
    assert not bool(ring.is_tabu(fp_b[None, :])[0])
    # Capacity eviction: push 4 more distinct fps, fp_a must be evicted.
    for i in range(4):
        ring = ring.push(jnp.asarray([10 + i, 20 + i], jnp.uint32))
    assert not bool(ring.is_tabu(fp_a[None, :])[0])


def test_tabu_ring_age_expiry():
    ring = TabuRing.create(8, expiry=2)
    fp_a = jnp.asarray([1, 2], jnp.uint32)
    ring = ring.push(fp_a)
    assert bool(ring.is_tabu(fp_a[None, :])[0])
    for i in range(3):
        ring = ring.push(jnp.asarray([10 + i, 20 + i], jnp.uint32))
    # fp_a added at count=1; count is now 4 > 1 + expiry(2) => expired.
    assert not bool(ring.is_tabu(fp_a[None, :])[0])


def test_elite_archive_insert_best_worst():
    state = jnp.zeros((3,), jnp.int32)
    arch = EliteArchive.create(2, state)
    mk = lambda h, v: (
        make_score(float(h)),
        jnp.asarray([h, h], jnp.uint32),
        jnp.full((3,), v, jnp.int32),
    )
    arch = arch.insert(*mk(5, 1))
    arch = arch.insert(*mk(3, 2))
    arch = arch.insert(*mk(4, 3))  # full: replaces worst (5)
    score, _, best_state = arch.get_best()
    assert float(score[0]) == 3
    assert int(best_state[0]) == 2
    arch = arch.insert(*mk(9, 4))  # worse than worst: rejected
    scores = np.asarray(arch.scores)[np.asarray(arch.valid)]
    assert sorted(scores[:, 0].tolist()) == [3, 4]
    # Duplicate fingerprint is dropped.
    arch2 = arch.insert(*mk(3, 9))
    np.testing.assert_array_equal(np.asarray(arch2.scores), np.asarray(arch.scores))


def test_elite_archive_get_best_multiple():
    """Top-k retrieval, ascending, short-archive marked via valid
    (ref History::get_best_multiple, local_search.rs:230-236)."""
    state = jnp.zeros((3,), jnp.int32)
    arch = EliteArchive.create(4, state)
    mk = lambda h, v: (
        make_score(float(h)),
        jnp.asarray([h, h], jnp.uint32),
        jnp.full((3,), v, jnp.int32),
    )
    arch = arch.insert(*mk(5, 1))
    arch = arch.insert(*mk(3, 2))
    scores, fps, states, valid = arch.get_best_multiple(3)
    assert np.asarray(valid).tolist() == [True, True, False]
    assert np.asarray(scores)[:2, 0].tolist() == [3.0, 5.0]
    assert np.asarray(states)[:2, 0].tolist() == [2, 1]
    assert np.asarray(fps)[0].tolist() == [3, 3]
    arch = arch.insert(*mk(4, 3))
    scores, _, states, valid = arch.get_best_multiple(2)
    assert np.asarray(scores)[:, 0].tolist() == [3.0, 4.0]
    assert np.asarray(valid).all()


def _run_ls(problem, start, seed=0, allow=1, max_iter=100_000):
    tabu = TabuRing.create(256, expiry=10_000)
    params = LsParams(max_iterations=max_iter, allow_no_improvement_for=allow)
    best_state, best_score, _, iters, _ = ls_execute(
        problem, params, start, tabu, jax.random.key(seed)
    )
    return best_state, best_score, int(iters)


def test_ls_improves_from_random_start():
    """From a random start, LS strictly improves and moves
    (ref local_search.rs:363-418)."""
    problem = make_ackley_problem(2, min_move_size=1e-6, max_move_size=0.1)
    start = problem.init(jax.random.key(42))
    start_score = problem.score(start)
    best_state, best_score, _ = _run_ls(problem, start, seed=42)
    assert float(best_score[0]) < float(start_score[0])
    assert not np.array_equal(np.asarray(best_state), np.asarray(start))


def test_ls_at_global_minimum_does_not_move():
    """From the global minimum, LS returns the start
    (ref local_search.rs:420-470)."""
    problem = make_ackley_problem(2, min_move_size=1e-6, max_move_size=0.1)
    start = jnp.zeros((2,), jnp.float32)
    best_state, best_score, iters = _run_ls(problem, start, seed=42)
    np.testing.assert_array_equal(np.asarray(best_state), np.asarray(start))
    assert abs(float(best_score[0])) < 1e-6
    assert iters <= 1  # is_best early-exit on the first iteration


def test_ls_gated_off_is_noop():
    problem = make_ackley_problem(2)
    start = problem.init(jax.random.key(0))
    tabu = TabuRing.create(16, expiry=100)
    params = LsParams(max_iterations=1000, allow_no_improvement_for=5)
    best_state, _, _, iters, _ = ls_execute(
        problem, params, start, tabu, jax.random.key(1), enabled=False
    )
    assert int(iters) == 0
    np.testing.assert_array_equal(np.asarray(best_state), np.asarray(start))


@pytest.mark.parametrize("dimensions", [2, 10, 20])
def test_ils_ackley_converges(dimensions):
    """Full ILS drives Ackley to ~0 (eps 1e-2) at several dimensionalities
    (ref iterated_local_search.rs:283-323)."""
    problem = make_ackley_problem(dimensions, min_move_size=1e-3, max_move_size=0.5)
    config = SolverConfig(
        seed="0",
        local_search_max_iterations=100_000,
        best_solutions_capacity=16,
        all_solutions_capacity=256,
        all_solution_iteration_expiry=10_000,
        iterated_local_search_max_iterations=10_000,
        max_allow_no_improvement_for=5,
    )
    solver = Solver(problem, config)
    solver.run(chunk=32)
    (hard, _), _ = solver.get_best_solution()
    assert abs(hard) <= 1e-2, f"d={dimensions}: best {hard} not within 1e-2 of 0"


def test_ils_solves_8queens():
    problem = make_nqueens_problem(8)
    config = SolverConfig(
        seed="42",
        local_search_max_iterations=10_000,
        best_solutions_capacity=32,
        all_solutions_capacity=256,
        all_solution_iteration_expiry=10_000,
        iterated_local_search_max_iterations=10_000,
        max_allow_no_improvement_for=5,
    )
    solver = Solver(problem, config)
    solver.run(chunk=8)
    (hard, _), best_state = solver.get_best_solution()
    rows = best_state.rows
    assert hard == 0, f"8-queens not solved: {hard} conflicts, rows={rows}"
    assert sorted(rows.tolist()) != []  # a real board came back


def test_solver_round_api():
    """The wasm-bridge-shaped incremental API: step / progress / best / cancel
    (ref web/employee-scheduling-wasm-bindgen/src/lib.rs:55-84)."""
    problem = make_nqueens_problem(8)
    config = SolverConfig(seed="7", iterated_local_search_max_iterations=5)
    solver = Solver(problem, config)
    assert not solver.is_finished()
    assert solver.get_iteration_info() == {"current": 0, "total": 5}
    solver.execute_round()
    assert solver.get_iteration_info()["current"] == 1
    while not solver.is_finished():
        solver.execute_round()
    assert solver.get_iteration_info() == {"current": 5, "total": 5}
    (hard, soft), _ = solver.get_best_solution()
    assert hard >= 0
    solver.cancel()
    assert solver.cancelled


def test_step_and_chunk_trajectories_identical_across_restart():
    """Per-round stepping (execute_round: per-lane select restart) and
    chunked running (run: scalar-round lax.cond restart, see ils_round's
    round_scalar) must produce bit-identical trajectories — including
    across the every-50-rounds restart boundary (ref
    iterated_local_search.rs:185-191)."""
    import datetime

    import numpy as np

    from constraint_solver_tpu.models.scheduling import (
        ScheduleSpec,
        make_scheduling_problem,
    )

    # Scheduling never reaches (0, 0), so neither path converges early and
    # all 60 rounds (crossing the round-50 restart) really execute.
    spec = ScheduleSpec.from_dates(
        datetime.date(2022, 5, 9), datetime.date(2022, 5, 24), 4
    )
    problem = make_scheduling_problem(spec, proposer="dense")
    config = SolverConfig(
        seed="restart-eq",
        local_search_max_iterations=15,
        iterated_local_search_max_iterations=60,
        max_allow_no_improvement_for=3,
        all_solution_iteration_expiry=500,
    )
    a = Solver(problem, config)
    for _ in range(60):
        a.execute_round()
    b = Solver(problem, config)
    b.run(max_rounds=60, chunk=8)

    fix = lambda st: st._replace(key=jax.random.key_data(st.key))
    for la, lb in zip(jax.tree.leaves(fix(a.state)), jax.tree.leaves(fix(b.state))):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
