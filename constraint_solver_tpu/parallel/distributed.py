"""Multi-host initialization and global-mesh construction.

The reference has no inter-process communication at all (SURVEY.md §2.5);
scale-out beyond one host is pure TPU-native territory:

- ``jax.distributed.initialize`` wires N host processes into one runtime
  (on TPU pods the coordinator/topology comes from the environment; on CPU
  test rigs pass coordinator/num_processes/process_id explicitly);
- every process then sees the GLOBAL device list, and the same
  ``Mesh(pop, nbr)`` + ``shard_map`` program from ``parallel.sharded`` runs
  SPMD across hosts — elite-exchange all_gathers ride ICI within a slice
  and DCN across slices, with zero code changes in the engine;
- fault story (SURVEY.md §5): checkpoints (utils/checkpoint.py) are plain
  host-side .npz of the full pytree; after a slice restart, re-initialize
  and resume from the last checkpoint (exact), or re-seed lanes from the
  gathered elite archive (approximate but warm).

Typical pod usage:

    import constraint_solver_tpu.parallel.distributed as dist
    dist.initialize()                  # env-driven on TPU pods
    mesh = dist.global_mesh(n_nbr=1)   # all chips on the 'pop' axis
    solver = PopulationSolver(problem, config, population=P, mesh=mesh)

Every process executes the same program; host 0 reads results.
"""

from __future__ import annotations

import jax

from constraint_solver_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host runtime.  With no arguments, relies on the
    TPU pod environment (the common case); arguments are for CPU/GPU test
    rigs.  Safe to call once per process, before any device use."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(n_nbr: int = 1):
    """A mesh over ALL devices of all processes: ('pop', 'nbr')."""
    n_dev = len(jax.devices())
    assert n_dev % n_nbr == 0, (n_dev, n_nbr)
    return make_mesh(n_pop=n_dev // n_nbr, n_nbr=n_nbr)


def is_coordinator() -> bool:
    return jax.process_index() == 0
