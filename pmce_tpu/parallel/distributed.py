"""Multi-host (DCN) bootstrap and per-host data sharding.

The reference is single-process (no ``torch.distributed`` anywhere,
SURVEY.md §2.7). This module is the multi-host entry point for the
TPU-native runtime:

- ``initialize()`` wraps ``jax.distributed.initialize`` (on Cloud TPU pods
  the coordinator/process count/process id auto-resolve from the TPU
  metadata; explicit args cover manual clusters);
- ``global_mesh()`` lays the ``data`` axis out so each host's devices are
  CONTIGUOUS along it: batch sharding then keeps every shard on its own
  host's ICI-attached chips, gradient psums ride ICI within a host and
  cross DCN only once per reduction tree level;
- ``shard_host_batch()`` builds a global device array from each process's
  LOCAL batch via ``jax.make_array_from_process_local_data`` — hosts load
  disjoint data shards, nothing is gathered through host 0.

Single-process sessions (tests, the 1-chip dev harness) work unchanged:
``initialize()`` is a no-op when no peers are configured, and
``global_mesh`` degenerates to ``mesh.create_mesh``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from pmce_tpu.parallel.mesh import batch_sharding


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Start the JAX distributed runtime if this is a multi-process job.

    Returns True when the distributed runtime was initialized. Safe to call
    unconditionally: with no arguments and no cluster environment it
    remains single-process.
    """
    if jax.process_count() > 1:
        return True  # already initialized
    if (coordinator_address is None and num_processes is None
            and process_id is None):
        import os

        # Cloud TPU pods / megascale environments auto-detect; a plain
        # single host has none of these markers (TPU_WORKER_HOSTNAMES with
        # a single entry — e.g. 'localhost' on dev harnesses — does not
        # count as a cluster).
        multi_worker = len(os.environ.get("TPU_WORKER_HOSTNAMES", "")
                           .split(",")) > 1
        markers = ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                   "CLOUD_TPU_TASK_ID")
        if not multi_worker and not any(m in os.environ for m in markers):
            return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return True
    except Exception as e:  # pragma: no cover - environment dependent
        raise RuntimeError(f"jax.distributed.initialize failed: {e}") from e


def global_mesh(n_model: int = 1) -> Mesh:
    """(data, model) mesh over ALL processes' devices, host-contiguous.

    ``jax.devices()`` already returns devices grouped by process; reshaping
    to [hosts × local, model] keeps each host's chips adjacent on the
    ``data`` axis.
    """
    devices = np.asarray(jax.devices())
    n_data = len(devices) // n_model
    return Mesh(devices[: n_data * n_model].reshape(n_data, n_model),
                axis_names=("data", "model"))


def shard_host_batch(mesh: Mesh, batch):
    """Per-process local batch pytree → global sharded arrays.

    Each process passes ONLY ITS SHARD (local_batch = global_batch /
    process_count rows). Under a single process this is identical to
    ``mesh_lib.shard_batch``.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh),
                                      batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def host_local_slice(global_len: int) -> slice:
    """The contiguous index range this process should load (data loading
    convention: host i takes rows [i*per, (i+1)*per))."""
    per = global_len // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
