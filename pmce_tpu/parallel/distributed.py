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
- ``put_global_batch()`` (used by the runtime through
  ``parallel.prefetch``) turns each process's view of a batch into global
  sharded arrays: every host contributes only the rows its own devices
  hold — nothing is gathered through host 0;
- ``shard_host_batch()`` / ``host_local_slice()`` are the disjoint-
  loading variants for data pipelines that read per-host shards.

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
    # IMPORTANT: decide from the ENVIRONMENT only — any jax call (even
    # jax.process_count()) initializes the XLA backend, after which
    # jax.distributed.initialize() unconditionally raises.
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
    except Exception as e:
        msg = str(e).lower()
        # jax's message has varied across versions ("already initialized",
        # "should only be called once"); both mean the same benign thing.
        if "already initialized" in msg or "only be called once" in msg:
            return True  # idempotent double-call
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


def put_global_batch(sharding, batch):
    """Host batch pytree → global sharded arrays, multi-host safe.

    This is the path the runtime actually uses (via
    ``parallel.prefetch.prefetch_to_device``): under one process it is a
    plain async ``device_put``; under many, each process contributes the
    rows its own devices own (``global_mesh`` keeps hosts contiguous on
    the ``data`` axis, so host i owns batch rows [i·B/n, (i+1)·B/n)) via
    ``make_array_from_process_local_data`` — nothing is gathered through
    host 0. Hosts that already load ONLY their shard should call
    :func:`shard_host_batch` with the local rows instead.
    """
    n = jax.process_count()
    if n == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    i = jax.process_index()

    def one(x):
        per = x.shape[0] // n
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x[i * per:(i + 1) * per]))

    return jax.tree_util.tree_map(one, batch)


def host_local_slice(global_len: int) -> slice:
    """The contiguous index range this process should load.

    The remainder ``global_len % process_count`` is spread over the first
    hosts (host i gets ``per + 1`` rows while i < remainder), so every row
    belongs to exactly one host — a floor split would silently drop the
    tail rows from training AND evaluation."""
    n = jax.process_count()
    i = jax.process_index()
    per, rem = divmod(global_len, n)
    start = i * per + min(i, rem)
    return slice(start, start + per + (1 if i < rem else 0))
