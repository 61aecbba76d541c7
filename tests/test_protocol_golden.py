"""Protocol regression goldens.

Freezes the full evaluation-protocol outputs (camera filtering, root
alignment chains, Procrustes, ACCEL accumulation) on deterministic
synthetic predictions. Any change to protocol semantics — even a subtle
root-alignment or masking drift — moves these numbers and fails here.
"""

import numpy as np
import pytest

from pmce_tpu.data.datasets import Human36M, PW3D
from pmce_tpu.smpl.artifacts import synthetic_artifacts

GOLDEN = {
    "h36m": dict(mpjpe=4.264843, pa_mpjpe=2.874669, mpvpe=8.124454,
                 accel=8.853953),
    "pw3d": dict(mpjpe=4.251741, pa_mpjpe=2.853595, mpvpe=8.115046,
                 accel=8.892531),
}


@pytest.mark.parametrize("name,cls", [("h36m", Human36M), ("pw3d", PW3D)])
def test_protocol_golden(name, cls):
    art = synthetic_artifacts(seed=0, num_verts=600, num_faces=1200)
    ds = cls.from_synthetic(art, split="test", num_videos=2,
                            frames_per_video=40)
    rng = np.random.default_rng(42)
    results = []
    for m in ds.mid_indices():
        gt_mesh = ds.data.mesh_cam[m]
        results.append({
            "mesh_coord": gt_mesh + rng.normal(scale=5.0,
                                               size=gt_mesh.shape),
            "mesh_coord_target": gt_mesh,
        })
    res = ds.evaluate(results, verbose=False)
    g = GOLDEN[name]
    np.testing.assert_allclose(res.mpjpe, g["mpjpe"], rtol=1e-4)
    np.testing.assert_allclose(res.pa_mpjpe, g["pa_mpjpe"], rtol=1e-3)
    np.testing.assert_allclose(res.mpvpe, g["mpvpe"], rtol=1e-4)
    np.testing.assert_allclose(res.accel, g["accel"], rtol=1e-4)
