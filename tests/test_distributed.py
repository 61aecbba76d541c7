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
from pmce_tpu.parallel.distributed import put_global_batch


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


def test_host_local_slice_covers_every_row(monkeypatch):
    """Uneven splits spread the remainder: every global row belongs to
    exactly one host (a floor split silently dropped the tail)."""
    import pmce_tpu.parallel.distributed as dist

    for n, total in ((3, 100), (8, 35), (4, 4), (5, 3)):
        monkeypatch.setattr(dist.jax, "process_count", lambda n=n: n)
        rows = []
        for i in range(n):
            monkeypatch.setattr(dist.jax, "process_index", lambda i=i: i)
            s = host_local_slice(total)
            rows.extend(range(s.start, s.stop))
        assert rows == list(range(total)), (n, total, rows)


def test_put_global_batch_matches_device_put():
    """The runtime batch-assembly path (used by prefetch_to_device):
    single-process it must equal a plain sharded device_put."""
    from pmce_tpu.parallel.mesh import batch_sharding

    mesh = global_mesh()
    sh = batch_sharding(mesh)
    batch = {"x": np.arange(48, dtype=np.float32).reshape(16, 3)}
    out = put_global_batch(sh, batch)
    assert out["x"].sharding == sh
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
