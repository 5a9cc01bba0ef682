"""Population layer tests on the virtual 8-device CPU mesh (SURVEY.md §4:
fake-multi-device tests are the TPU-world mock backend)."""

import jax
import numpy as np

from constraint_solver_tpu.core.ils import SolverConfig
from constraint_solver_tpu.models.nqueens import make_nqueens_problem
from constraint_solver_tpu.parallel.mesh import make_mesh, pop_sharding
from constraint_solver_tpu.parallel.population import (
    PopulationSolver,
    exchange_elites,
    population_init,
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


def test_population_solves_8queens():
    solver = PopulationSolver(make_nqueens_problem(8), _config(), population=8)
    solver.run()
    (hard, _), best_state = solver.get_best_solution()
    assert hard == 0
    assert sorted(best_state.rows.tolist()) == list(range(8))


def test_population_sharded_over_mesh():
    mesh = make_mesh(n_pop=8, n_nbr=1)
    solver = PopulationSolver(
        make_nqueens_problem(8), _config(), population=16, mesh=mesh
    )
    # State really is sharded over the 'pop' axis.
    shard_devs = {
        d.id for d in solver.state.current_state.rows.sharding.device_set
    }
    assert len(shard_devs) == 8
    solver.run(max_rounds=20)
    (hard, _), _ = solver.get_best_solution()
    assert hard <= 4  # made real progress; usually 0


def test_population_4096_trajectories_sharded():
    """BASELINE config[3]: a 4096-trajectory restart portfolio with global
    best reduction, sharded over the (virtual) 8-device mesh.  Tiny budgets
    keep it fast — the point is that the 4096-lane program compiles, shards,
    and reduces correctly."""
    mesh = make_mesh(n_pop=8, n_nbr=1)
    config = SolverConfig(
        seed="42",
        local_search_max_iterations=10,
        best_solutions_capacity=4,
        all_solutions_capacity=16,
        all_solution_iteration_expiry=16,
        iterated_local_search_max_iterations=2,
        max_allow_no_improvement_for=2,
    )
    solver = PopulationSolver(
        make_nqueens_problem(8), config, population=4096, mesh=mesh,
        portfolio="mixed",
    )
    shard_devs = {
        d.id for d in solver.state.current_state.rows.sharding.device_set
    }
    assert len(shard_devs) == 8
    solver.run(max_rounds=2, chunk=2)
    (hard, _), best_state = solver.get_best_solution()
    # 4096 random-restart lanes on 8-queens: the global best is essentially
    # always a solution after one descent; assert a strong bound regardless.
    assert hard <= 2
    assert sorted(best_state.rows.tolist()) == list(range(8))


def test_exchange_elites_broadcasts_global_best():
    problem = make_nqueens_problem(8)
    config = _config()
    states = population_init(problem, config, 8, jax.random.key(0))
    # Run a few rounds so archives are populated and diverse.
    from constraint_solver_tpu.core.ils import ils_round
    from functools import partial

    round_fn = jax.vmap(
        partial(ils_round, problem, config.ls_params(), config.ils_params())
    )
    for _ in range(3):
        states = round_fn(states)
    scores_before, _, _ = jax.vmap(lambda e: e.get_best())(states.elite)
    global_best = np.asarray(scores_before)[:, 0].min()

    states = exchange_elites(states, k_exchange=4)
    scores_after, _, _ = jax.vmap(lambda e: e.get_best())(states.elite)
    # Every lane's archive now holds the global best.
    assert np.all(np.asarray(scores_after)[:, 0] == global_best)


def test_population_deterministic():
    results = []
    for _ in range(2):
        solver = PopulationSolver(
            make_nqueens_problem(8), _config(rounds=10), population=4
        )
        solver.run()
        (hard, soft), state = solver.get_best_solution()
        results.append((hard, soft, tuple(state.rows.tolist())))
    assert results[0] == results[1]


def test_reseed_from_elites():
    solver = PopulationSolver(make_nqueens_problem(8), _config(rounds=20), population=4)
    solver.run(max_rounds=10)
    import numpy as np

    scores_best, _, _ = jax.vmap(lambda e: e.get_best())(solver.state.elite)
    solver.reseed_from_elites()
    cur = np.asarray(solver.state.current_fp)
    elite_fps = np.asarray(solver.state.elite.fps)
    valid = np.asarray(solver.state.elite.valid)
    # Every lane's current fingerprint now matches one of its elites.
    for lane in range(4):
        lane_fps = {tuple(f) for f, v in zip(elite_fps[lane], valid[lane]) if v}
        assert tuple(cur[lane]) in lane_fps
