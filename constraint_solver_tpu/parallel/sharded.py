"""2D-sharded solving: population data-parallel x neighborhood tensor-parallel.

The reference is single-threaded (SURVEY.md §2.5); this module is the scale-
out path the TPU design replaces it with.  One SPMD program over a
``Mesh(pop, nbr)``:

- the trajectory population is sharded over ``pop`` (data parallel);
- within every trajectory, the candidate-neighborhood axis is sharded over
  ``nbr`` (the tensor-parallel analog): each device scores its slice of the
  sampled columns, takes a local top-k, and an ``all_gather`` over ``nbr``
  (ICI) rebuilds a small global candidate list for the engine's
  pick-then-check selection;
- trajectory state is replicated across ``nbr`` and stays consistent because
  every shard runs the identical deterministic update.

Built as ``shard_map(vmap(ils_round))`` — the engine and problem code are
unchanged except for the neighborhood's collective, which the problem
factory takes as ``nbr_axis``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from constraint_solver_tpu.core.ils import (
    IlsState,
    SolverConfig,
    ils_round,
)
from constraint_solver_tpu.core.problem import Problem
from constraint_solver_tpu.ops.lex import lex_argmin
from constraint_solver_tpu.parallel.population import population_init
from constraint_solver_tpu.utils.seeding import seed_string_to_key

from functools import lru_cache


@lru_cache(maxsize=64)
def _sharded_chunk_program(problem: Problem, ls_params, ils_params, mesh):
    """Jitted sharded-chunk program, shared across solver instances (same
    no-recompile contract as parallel/population.py's program caches)."""
    round_fn = jax.vmap(partial(ils_round, problem, ls_params, ils_params))

    def shard_body(st: IlsState, n: int) -> IlsState:
        return jax.lax.fori_loop(0, n, lambda _, s: round_fn(s), st)

    def run_chunk(st: IlsState, n: int) -> IlsState:
        return jax.shard_map(
            partial(shard_body, n=n),
            mesh=mesh,
            in_specs=P("pop"),
            out_specs=P("pop"),
            check_vma=False,
        )(st)

    return jax.jit(run_chunk, static_argnums=1)


class ShardedPopulationSolver:
    """PopulationSolver over a 2D mesh: lanes split over ``pop``, each
    lane's neighborhood split over ``nbr``.  ``problem`` must have been
    built with ``nbr_axis="nbr"`` so its neighborhood performs the
    local-top-k + all_gather collective."""

    def __init__(
        self,
        problem: Problem,
        config: SolverConfig,
        population: int,
        mesh,
    ):
        self.problem = problem
        self.config = config
        self.population = population
        self.mesh = mesh
        self.cancelled = False
        n_pop = mesh.shape["pop"]
        assert population % n_pop == 0, (population, n_pop)
        jax.set_mesh(mesh)

        key = seed_string_to_key(config.seed)
        self.state = population_init(problem, config, population, key)

        self._chunk_jit = _sharded_chunk_program(
            problem, config.ls_params(), config.ils_params(), mesh
        )

    def run(self, max_rounds: int, chunk: int = 2) -> None:
        done = 0
        while done < max_rounds and not self.cancelled:
            n = min(chunk, max_rounds - done)
            self.state = self._chunk_jit(self.state, n)
            done += n

    def get_best_solution(self):
        scores, _, bests = jax.vmap(lambda e: e.get_best())(self.state.elite)
        scores = np.asarray(jax.device_get(scores))
        lane = int(lex_argmin(jnp.asarray(scores)))
        state = jax.tree.map(lambda a: np.asarray(jax.device_get(a))[lane], bests)
        return (float(scores[lane][0]), float(scores[lane][1])), state

    def stats(self) -> dict:
        return {
            "rounds": int(np.asarray(jax.device_get(self.state.round))[0]),
            "population": self.population,
            "ls_iterations": int(
                np.sum(np.asarray(jax.device_get(self.state.ls_iters_total)))
            ),
        }
