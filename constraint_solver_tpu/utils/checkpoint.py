"""Checkpoint / resume.

The reference has no checkpointing; its closest analog is the wasm
``SolverContext`` keeping full ILS state alive across calls so solving is
incremental within a session (reference
web/employee-scheduling-wasm-bindgen/src/lib.rs:13-16,55-58; SURVEY.md §5).
Here a checkpoint is the exact solver state — assignment tensors, elite
archive, tabu ring, PRNG key, step counters — serialized as a flat pytree to
one ``.npz`` file.  Resume is bit-exact: a resumed run continues the same
deterministic trajectory.

Works for both ``Solver`` (single trajectory) and ``PopulationSolver``
(leading population axis on every leaf); sharded states are gathered to host
on save and re-placed by the caller on load.
"""

from __future__ import annotations

import json

import jax
import numpy as np

from constraint_solver_tpu.core.history import EliteArchive, TabuRing
from constraint_solver_tpu.core.ils import IlsState

_FORMAT_VERSION = 1


def checkpoint_path(path: str) -> str:
    """The on-disk path for ``path`` (np.savez appends '.npz' to bare
    paths; every save/load/exists check must use this normal form)."""
    return path if path.endswith(".npz") else path + ".npz"


def checkpoint_exists(path: str) -> bool:
    import os

    return os.path.exists(checkpoint_path(path))


def resume_and_run(solver, checkpoint: str | None, every: int, **run_kwargs):
    """Shared CLI resume-then-run flow: if ``checkpoint`` exists, load it
    (announcing the resumed round), then run with periodic snapshots.
    Works for both Solver and PopulationSolver."""
    if checkpoint and checkpoint_exists(checkpoint):
        solver.load(checkpoint)
        print(
            f"resumed from {checkpoint} at round "
            f"{solver.get_iteration_info()['current']}"
        )
    solver.run(
        checkpoint_path=checkpoint, checkpoint_every=every, **run_kwargs
    )


def save_state(path: str, state: IlsState, meta: dict | None = None) -> None:
    """Serialize an IlsState (single or population) to ``path`` (.npz).

    Multi-process safe: leaves that are not fully addressable on this
    process (globally sharded arrays under ``jax.distributed``) are gathered
    to every host first, and only process 0 writes the file — ALL processes
    must call this (the gather is collective).  Single-process states take
    the direct path."""
    leaves, _treedef = jax.tree.flatten(state)
    key_idx = [
        i
        for i, leaf in enumerate(leaves)
        if hasattr(leaf, "dtype")
        and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)
    ]
    key_set = set(key_idx)

    def to_host(i: int, leaf):
        x = jax.random.key_data(leaf) if i in key_set else leaf
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)

    arrays = {f"leaf_{i}": to_host(i, leaf) for i, leaf in enumerate(leaves)}
    header = json.dumps(
        {
            "version": _FORMAT_VERSION,
            "num_leaves": len(leaves),
            "meta": meta or {},
        }
    )
    arrays["__header__"] = np.frombuffer(header.encode(), dtype=np.uint8)
    arrays["__key_leaves__"] = np.asarray(key_idx, dtype=np.int64)
    # Atomic snapshot: a crash mid-save must never corrupt the previous
    # checkpoint (this file IS the crash-recovery story).
    import os
    import tempfile

    final = checkpoint_path(path)
    if jax.process_count() == 1 or jax.process_index() == 0:
        fd, tmp = tempfile.mkstemp(
            suffix=".npz", dir=os.path.dirname(os.path.abspath(final)) or "."
        )
        os.close(fd)
        try:
            np.savez(tmp, **arrays)
            os.replace(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    if jax.process_count() > 1:
        # Non-writers must not race ahead and load a half-written file.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("checkpoint_save:" + final)


def load_state(path: str, example: IlsState) -> tuple[IlsState, dict]:
    """Load a checkpoint; ``example`` provides the pytree structure (build it
    with the same problem/config used at save time)."""
    with np.load(checkpoint_path(path)) as data:
        header = json.loads(bytes(data["__header__"]).decode())
        assert header["version"] == _FORMAT_VERSION, header
        key_leaves = set(data["__key_leaves__"].tolist())
        _, treedef = jax.tree.flatten(example)
        leaves = []
        for i in range(header["num_leaves"]):
            arr = data[f"leaf_{i}"]
            if i in key_leaves:
                leaves.append(jax.random.wrap_key_data(arr))
            else:
                leaves.append(arr)
        return jax.tree.unflatten(treedef, leaves), header["meta"]


__all__ = [
    "save_state",
    "load_state",
    "checkpoint_path",
    "checkpoint_exists",
    "EliteArchive",
    "TabuRing",
    "IlsState",
]
