"""2D-sharded solving on the fake 8-device CPU mesh: population dp x
neighborhood tp with local-top-k + all_gather collectives."""

import jax
import numpy as np

from constraint_solver_tpu.core.ils import SolverConfig
from constraint_solver_tpu.models.nqueens import make_nqueens_problem
from constraint_solver_tpu.parallel.mesh import make_mesh
from constraint_solver_tpu.parallel.sharded import ShardedPopulationSolver


def _config():
    return SolverConfig(
        seed="42",
        local_search_max_iterations=150,
        best_solutions_capacity=8,
        all_solutions_capacity=64,
        all_solution_iteration_expiry=150,
        iterated_local_search_max_iterations=100,
        max_allow_no_improvement_for=5,
    )


def test_sharded_2d_mesh_solves():
    mesh = make_mesh(n_pop=4, n_nbr=2)
    problem = make_nqueens_problem(
        16, sample_cols=4, nbr_axis="nbr", nbr_shards=2, nbr_keep=16
    )
    solver = ShardedPopulationSolver(problem, _config(), population=8, mesh=mesh)
    solver.run(max_rounds=30, chunk=5)
    (hard, _), state = solver.get_best_solution()
    assert hard <= 2, f"sharded solver made no progress: {hard}"
    assert solver.stats()["ls_iterations"] > 0
    assert len(state.rows) == 16


def test_sharded_candidate_list_consistent_with_unsharded_scoring():
    """Every candidate the sharded neighborhood emits must carry the score a
    full rescore assigns to its move (collectives must not scramble the
    (score, move) pairing)."""
    import jax.numpy as jnp

    from constraint_solver_tpu.models.nqueens import build_state, total_conflicts

    mesh = make_mesh(n_pop=1, n_nbr=4)
    jax.set_mesh(mesh)  # before creating arrays: they must live on this mesh
    problem = make_nqueens_problem(
        12, sample_cols=4, nbr_axis="nbr", nbr_shards=4, nbr_keep=8
    )
    rng = np.random.default_rng(2)
    rows = jnp.asarray(rng.integers(0, 12, size=12), jnp.int32)
    state = build_state(rows)
    cur = problem.score(state)

    def run(state):
        return problem.neighborhood(state, cur, jax.random.key(7))

    from jax.sharding import PartitionSpec as P

    jax.set_mesh(mesh)
    nb = jax.jit(
        jax.shard_map(
            run, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False
        )
    )(state)
    scores = np.asarray(nb.scores)
    cols_mv, rows_mv = np.asarray(nb.moves[0]), np.asarray(nb.moves[1])
    valid = np.asarray(nb.valid)
    assert valid.any()
    for i in np.flatnonzero(valid):
        applied = rows.at[int(cols_mv[i])].set(int(rows_mv[i]))
        assert scores[i, 0] == int(total_conflicts(applied))
