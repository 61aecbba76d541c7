"""Multi-host bootstrap helpers on the single-process 8-device CPU mesh."""

from __future__ import annotations

import jax
import numpy as np

from pmce_tpu.parallel import (
    global_mesh,
    host_local_slice,
    initialize,
    shard_host_batch,
)


def test_initialize_noop_single_host():
    # No cluster markers in the test env: must stay single-process.
    assert initialize() is False
    assert jax.process_count() == 1


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")


def test_shard_host_batch_places_batch_axis():
    mesh = global_mesh()
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2),
             "w": np.ones(16, np.float32)}
    dev = shard_host_batch(mesh, batch)
    assert dev["x"].shape == (16, 2)
    # Batch axis sharded over the 8 'data' devices → 2 rows per shard.
    shard_shapes = {s.data.shape for s in dev["x"].addressable_shards}
    assert shard_shapes == {(2, 2)}
    np.testing.assert_array_equal(np.asarray(dev["x"]), batch["x"])


def test_host_local_slice_single_process():
    assert host_local_slice(64) == slice(0, 64)
