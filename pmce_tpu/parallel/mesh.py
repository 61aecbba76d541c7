"""Device-mesh abstraction and data-parallel sharding rules.

The reference has no working multi-device path (vestigial ``--gpu '0,1'``
handling only, SURVEY.md §2.7). Here data parallelism is first-class:

- one ``jax.sharding.Mesh`` with axes ``(data, model)``; the ``model`` axis
  is size 1 for this model family (tens of millions of params — no tensor
  parallelism needed) but exists so larger variants can shard weights
  without API changes;
- batches are sharded over ``data`` (ICI), parameters are replicated;
- gradient all-reduce is implicit: ``jax.jit`` over sharded inputs inserts
  the psum where the loss mean crosses the data axis.

Everything works identically on the 8-virtual-device CPU mesh used in tests
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_data: int | None = None, n_model: int = 1,
                devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def fsdp_leaf_sharding(mesh: Mesh, x) -> NamedSharding:
    """ZeRO/FSDP-style sharding rule for one parameter or optimizer leaf.

    Shard the LARGEST axis divisible by the data-axis size over ``data``;
    leaves with no such axis (biases, scalars, small LN vectors) stay
    replicated. GSPMD then inserts the all-gather at each use and the
    reduce-scatter on the gradient — the standard jax FSDP recipe (no
    hand-written collectives).
    """
    n = mesh.shape["data"]
    shape = getattr(x, "shape", ())
    best = None
    for axis, dim in enumerate(shape):
        if dim % n == 0 and dim >= n and (best is None
                                          or dim > shape[best]):
            best = axis
    if best is None:
        return replicated_sharding(mesh)
    spec = [None] * len(shape)
    spec[best] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_fsdp(mesh: Mesh, tree):
    """Device-put params/opt-state with per-leaf FSDP shardings."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, fsdp_leaf_sharding(mesh, x)), tree)
