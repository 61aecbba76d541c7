"""REAL multi-process distributed coverage (2 local processes, CPU).

The monkeypatch tests in test_distributed.py fake process_count/index;
here two actual processes bootstrap through
``jax.distributed.initialize(coordinator_address="localhost:...")`` (the
code path a TPU pod slice runs, SURVEY.md §2.7) with 4 virtual CPU devices
each, build the host-contiguous global mesh, and drive BOTH multi-process
batch-assembly branches (``put_global_batch``'s
make_array_from_process_local_data path and ``shard_host_batch``) through
a jitted cross-host reduction.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = r"""
import os, sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from pmce_tpu.parallel.distributed import (
    global_mesh, host_local_slice, initialize, put_global_batch,
    shard_host_batch)
from pmce_tpu.parallel.mesh import batch_sharding

assert initialize(coordinator_address=f"localhost:{port}",
                  num_processes=2, process_id=pid) is True
assert initialize(coordinator_address=f"localhost:{port}",
                  num_processes=2, process_id=pid) is True  # idempotent
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4

mesh = global_mesh()
assert mesh.devices.shape == (8, 1), mesh.devices.shape
sh = batch_sharding(mesh)

gbatch = {"x": np.arange(64, dtype=np.float32).reshape(16, 4)}
want = float(gbatch["x"].sum())

# Path 1: every host holds the FULL batch; put_global_batch slices out the
# rows this host's devices own (the runtime/prefetch path).
out = put_global_batch(sh, gbatch)
assert out["x"].shape == (16, 4)
got = float(jax.jit(lambda t: t["x"].sum())(out))
assert abs(got - want) < 1e-5, (got, want)

# Path 2: every host loads ONLY its disjoint slice (ETL-sharded loaders).
sl = host_local_slice(16)
out2 = shard_host_batch(mesh, {"x": gbatch["x"][sl]})
assert out2["x"].shape == (16, 4)
got2 = float(jax.jit(lambda t: t["x"].sum())(out2))
assert abs(got2 - want) < 1e-5, (got2, want)

print(f"WORKER_OK {pid}", flush=True)
"""


@pytest.mark.slow
def test_two_process_bootstrap_and_batch_assembly(tmp_path):
    worker = tmp_path / "dist_worker.py"
    worker.write_text(_WORKER)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = (str(Path(__file__).resolve().parent.parent)
                         + os.pathsep + env.get("PYTHONPATH", ""))

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(
            o or "" for o in outs))

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, f"worker {i} output:\n{out}"
