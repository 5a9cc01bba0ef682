"""Multi-process (2-host-emulation) smoke test over CPU.

Spawns two real processes, each with 4 virtual CPU devices, joined via
``jax.distributed.initialize`` into one 8-device runtime, and runs a
sharded population solve over the global mesh — the closest this
environment gets to a real multi-host pod (SURVEY.md §4/§5)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

from constraint_solver_tpu.core.ils import SolverConfig
from constraint_solver_tpu.models.nqueens import make_nqueens_problem
from constraint_solver_tpu.parallel.distributed import global_mesh, is_coordinator
from constraint_solver_tpu.parallel.population import PopulationSolver

mesh = global_mesh(n_nbr=1)
config = SolverConfig(
    seed="42", local_search_max_iterations=50,
    best_solutions_capacity=4, all_solutions_capacity=32,
    all_solution_iteration_expiry=50,
    iterated_local_search_max_iterations=10,
    max_allow_no_improvement_for=3,
)
solver = PopulationSolver(
    make_nqueens_problem(8), config, population=8, mesh=mesh
)
solver.state = solver._chunk_jit(solver.state, 3)
jax.block_until_ready(solver.state)
(hard, soft), _ = solver.get_best_solution()
assert hard >= 0.0
print(f"proc {jax.process_index()}: global best hard={hard}", flush=True)

# Checkpoint round-trip across the process boundary: every process calls
# save (collective gather, one writer), every process loads, and the resumed
# global state must match bit-for-bit.
ckpt = sys.argv[3]
solver.save(ckpt)
import numpy as np
from jax.experimental import multihost_utils

resumed = PopulationSolver(
    make_nqueens_problem(8), config, population=8, mesh=mesh
)
resumed.load(ckpt)
assert resumed.get_best_score() == solver.get_best_score()
for a, b in zip(jax.tree.leaves(resumed.state), jax.tree.leaves(solver.state)):
    if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
        a, b = jax.random.key_data(a), jax.random.key_data(b)
    np.testing.assert_array_equal(
        multihost_utils.process_allgather(a, tiled=True),
        multihost_utils.process_allgather(b, tiled=True),
    )
resumed.state = resumed._chunk_jit(resumed.state, 2)
jax.block_until_ready(resumed.state)
(r_hard, _), _ = resumed.get_best_solution()
assert r_hard <= hard
if is_coordinator():
    print("MULTIHOST_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_PLATFORMS": "cpu",
        # The worker script lives in tmp_path; make the package importable
        # regardless of the invoking process's cwd / install state.
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    ckpt = str(tmp_path / "dist_ckpt.npz")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(i), ckpt],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
    assert "MULTIHOST_OK" in outs[0] + outs[1]
