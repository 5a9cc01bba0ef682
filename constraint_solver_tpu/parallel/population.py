"""Vmapped trajectory populations with collective elite exchange.

The reference runs exactly one ILS trajectory (single ``rng``/``current`` at
reference iterated_local_search.rs:115-116).  The TPU-native population layer
runs P independent trajectories as one vmapped program:

- per-trajectory PRNG streams via ``jax.random.split`` (SURVEY.md §2.5);
- per-trajectory tabu rings and elite archives (the reference's LS-private
  and ILS-level ``History`` instances, vectorized);
- periodic **elite exchange**: the global lexicographic top-k over all
  lanes' best solutions is broadcast-inserted into every lane's archive.
  Under a sharded population this compiles to an all-gather + top-k over
  ICI — the TPU equivalent of the reference's (nonexistent) cross-trajectory
  communication, cf. SURVEY.md §2.5 "Elite/best-solution exchange".

Sharding: ``PopulationSolver(..., mesh=...)`` lays the population axis over
the mesh's ``pop`` axis with ``NamedSharding``; XLA inserts the collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from constraint_solver_tpu.core.ils import (
    IlsState,
    SolverConfig,
    ils_init,
    ils_round,
)
from constraint_solver_tpu.core.problem import Problem
from constraint_solver_tpu.ops.lex import lex_argmin, lex_top_k
from constraint_solver_tpu.parallel.mesh import pop_sharding
from constraint_solver_tpu.utils.seeding import seed_string_to_key


def population_init(
    problem: Problem, config: SolverConfig, population: int, key: jax.Array
) -> IlsState:
    """IlsState with a leading population axis on every leaf."""
    keys = jax.random.split(key, population)
    return jax.vmap(lambda k: ils_init(problem, config, k))(keys)


def exchange_elites(states: IlsState, k_exchange: int) -> IlsState:
    """Insert the global top-k elite solutions into every lane's archive."""
    scores, fps, bests = jax.vmap(lambda e: e.get_best())(states.elite)
    leaves, treedef = jax.tree.flatten(bests)
    top = lex_top_k(scores, k_exchange, fps, *leaves)
    top_scores, top_fps = top[0], top[1]
    top_states = jax.tree.unflatten(treedef, list(top[2:]))

    def insert_all(elite):
        def body(i, e):
            return e.insert(
                top_scores[i],
                top_fps[i],
                jax.tree.map(lambda a: a[i], top_states),
            )

        return jax.lax.fori_loop(0, k_exchange, body, elite)

    return states._replace(elite=jax.vmap(insert_all)(states.elite))


class PopulationSolver:
    """Same driver API as ``core.ils.Solver`` over P parallel trajectories."""

    def __init__(
        self,
        problem: Problem,
        config: SolverConfig,
        population: int,
        exchange_every: int = 10,
        k_exchange: int = 4,
        mesh=None,
    ):
        self.problem = problem
        self.config = config
        self.population = population
        self.exchange_every = exchange_every
        self.cancelled = False
        self.mesh = mesh
        if mesh is not None:
            # sharding-in-types (jax>=0.7) wants the mesh as ambient context
            # for computations whose operands carry named shardings.
            jax.set_mesh(mesh)

        key = seed_string_to_key(config.seed)
        self.state = population_init(problem, config, population, key)
        if mesh is not None:
            self.state = jax.device_put(self.state, pop_sharding(mesh))

        round_fn = jax.vmap(
            partial(ils_round, problem, config.ls_params(), config.ils_params())
        )

        def run_chunk(st: IlsState, n: int) -> IlsState:
            st = jax.lax.fori_loop(0, n, lambda _, s: round_fn(s), st)
            return exchange_elites(st, k_exchange)

        self._round_jit = jax.jit(round_fn)
        self._chunk_jit = jax.jit(run_chunk, static_argnums=1)

        @jax.jit
        def best_score(st: IlsState):
            scores, _, _ = jax.vmap(lambda e: e.get_best())(st.elite)
            return scores[lex_argmin(scores)]

        # Cheap convergence probe: transfers 8 bytes, not the elite arrays.
        self._best_score_jit = best_score

    # -- driver API (mirrors core.ils.Solver) ----------------------------

    def execute_round(self) -> None:
        self.state = self._round_jit(self.state)

    def _round_count(self) -> int:
        # Materialize before indexing: gathers on pop-sharded arrays are
        # ambiguous under sharding-in-types.
        return int(np.asarray(self.state.round)[0])

    def is_finished(self) -> bool:
        return self._round_count() >= self.config.iterated_local_search_max_iterations

    def get_iteration_info(self) -> dict:
        return {
            "current": self._round_count(),
            "total": self.config.iterated_local_search_max_iterations,
        }

    def get_best_solution(self):
        """Global best over all lanes' archives."""
        scores, _fps, bests = jax.vmap(lambda e: e.get_best())(self.state.elite)
        scores = np.asarray(scores)
        lane = int(lex_argmin(jnp.asarray(scores)))
        score = scores[lane]
        state = jax.tree.map(lambda a: np.asarray(a)[lane], bests)
        return (float(score[0]), float(score[1])), state

    def cancel(self) -> None:
        self.cancelled = True

    def run(self, max_rounds: int | None = None, chunk: int | None = None) -> None:
        chunk = chunk or self.exchange_every
        total = self.config.iterated_local_search_max_iterations
        if max_rounds is not None:
            total = min(total, self._round_count() + max_rounds)
        rounds_done = self._round_count()
        while not self.cancelled and rounds_done < total:
            n = min(chunk, total - rounds_done)
            self.state = self._chunk_jit(self.state, n)
            rounds_done += n
            score = jnp.asarray(self._best_score_jit(self.state))
            if bool(self.problem.is_best(score)):
                break

    def stats(self) -> dict:
        return {
            "rounds": self._round_count(),
            "population": self.population,
            "ls_iterations": int(jnp.sum(self.state.ls_iters_total)),
        }

    # -- checkpoint / resume (SURVEY.md §5) -------------------------------

    def save(self, path: str) -> None:
        from constraint_solver_tpu.utils.checkpoint import save_state

        save_state(
            path,
            self.state,
            {
                "problem": self.problem.name,
                "seed": self.config.seed,
                "population": self.population,
            },
        )

    def load(self, path: str) -> None:
        from constraint_solver_tpu.utils.checkpoint import load_state

        self.state, meta = load_state(path, self.state)
        assert meta.get("population") == self.population
        if self.mesh is not None:
            self.state = jax.device_put(self.state, pop_sharding(self.mesh))
