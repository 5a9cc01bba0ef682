"""Device mesh helpers.

The reference has zero parallelism (single thread, SURVEY.md §2.5); the
TPU-native scale-out story is a ``jax.sharding.Mesh`` with two logical axes:

- ``pop`` — data-parallel axis over independent ILS trajectories;
- ``nbr`` — tensor-parallel axis over a single trajectory's candidate
  neighborhood (used for very large instances).

On one chip both axes are size 1; on a pod slice XLA rides ICI for the
collectives (psum/all_gather for elite exchange and neighborhood argmin).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_pop: int | None = None, n_nbr: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_pop is None:
        n_pop = len(devices) // n_nbr
    assert n_pop * n_nbr <= len(devices), (
        f"mesh {n_pop}x{n_nbr} needs {n_pop * n_nbr} devices, have {len(devices)}"
    )
    # Auto axis types: classic GSPMD propagation (the Explicit default of
    # jax>=0.7 demands per-op sharding annotations through vmapped code).
    return jax.make_mesh(
        (n_pop, n_nbr),
        ("pop", "nbr"),
        devices=devices[: n_pop * n_nbr],
        axis_types=(jax.sharding.AxisType.Auto, jax.sharding.AxisType.Auto),
    )


def pop_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (population) axis of every pytree leaf over 'pop'."""
    return NamedSharding(mesh, P("pop"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
