"""Evaluation-protocol tests: suite math, ACCEL semantics, dataset wiring."""

import numpy as np
import pytest

from pmce_tpu.data.evaluation import (
    evaluate_joints,
    evaluate_mesh,
    sequence_accel_error,
)
from pmce_tpu.data.datasets import MPII3D, MSCOCO, PW3D, Human36M, MPII
from pmce_tpu.smpl.artifacts import synthetic_artifacts


@pytest.fixture(scope="module")
def art():
    return synthetic_artifacts(seed=0, num_verts=600, num_faces=1200)


def test_accel_reference_semantics():
    """Exact parity with the reference accumulation (including the zero
    padding at sequence ends and the append-to-new-buffer flush)."""
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(10, 14, 3))
    gt = rng.normal(size=(10, 14, 3))
    names = np.array(["a"] * 6 + ["b"] * 4)

    # Hand-rolled reference computation.
    def ref_err(p, g):
        a_g = g[:-2] - 2 * g[1:-1] + g[2:]
        a_p = p[:-2] - 2 * p[1:-1] + p[2:]
        e = np.zeros(len(p))
        e[1:-1] = np.mean(np.linalg.norm(a_p - a_g, axis=2), axis=1)
        return np.mean(e)

    expected = (ref_err(pred[:6], gt[:6]) * 6
                + ref_err(pred[6:], gt[6:]) * 4) / 10
    got = sequence_accel_error(pred, gt, names)
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_accel_identical_is_zero():
    x = np.random.default_rng(1).normal(size=(8, 14, 3))
    names = np.array(["a"] * 8)
    assert sequence_accel_error(x, x, names) == 0.0


def test_evaluate_mesh_perfect_prediction(art):
    rng = np.random.default_rng(2)
    N, V = 6, art.num_verts
    gt = rng.normal(size=(N, V, 3)).astype(np.float32) * 100
    jr24 = art.J_regressor
    jr17 = rng.random((17, V)).astype(np.float32)
    jr17 /= jr17.sum(1, keepdims=True)
    names = np.array(["v0"] * 3 + ["v1"] * 3)
    res = evaluate_mesh(gt.copy(), gt, jr24, jr17, names)
    assert res.mpjpe < 1e-3 and res.pa_mpjpe < 1e-2
    assert res.mpvpe < 1e-3 and res.accel < 1e-3


def test_evaluate_mesh_offset_invariance(art):
    """A constant offset on the prediction disappears (root alignment)."""
    rng = np.random.default_rng(3)
    N, V = 4, art.num_verts
    gt = rng.normal(size=(N, V, 3)).astype(np.float32) * 100
    pred = gt + np.array([50.0, -20.0, 10.0])
    jr24 = art.J_regressor
    jr17 = rng.random((17, V)).astype(np.float32)
    jr17 /= jr17.sum(1, keepdims=True)
    res = evaluate_mesh(pred, gt, jr24, jr17, np.array(["a"] * N))
    assert res.mpvpe < 1e-2 and res.mpjpe < 1e-2


def test_evaluate_joints_root_and_subset():
    rng = np.random.default_rng(4)
    gt = rng.normal(size=(5, 17, 3)) * 100
    pred = gt + rng.normal(size=(5, 17, 3))
    res = evaluate_joints(pred, gt, np.array(["a"] * 5),
                          root_idx=0,
                          eval_joints=(1, 2, 3, 4, 5, 6))
    assert 0 < res.mpjpe < 10
    assert res.pa_mpjpe <= res.mpjpe + 0.5


def test_evaluate_mesh_keep_mask(art):
    rng = np.random.default_rng(5)
    N, V = 6, art.num_verts
    gt = rng.normal(size=(N, V, 3)).astype(np.float32) * 100
    pred = gt.copy()
    pred[3:] += 1e6  # masked-out samples are catastrophically wrong
    jr24 = art.J_regressor
    jr17 = rng.random((17, V)).astype(np.float32)
    jr17 /= jr17.sum(1, keepdims=True)
    mask = np.array([True] * 3 + [False] * 3)
    res = evaluate_mesh(pred, gt, jr24, jr17, np.array(["a"] * N),
                        keep_mask=mask)
    assert res.mpvpe < 1e-3  # bad samples filtered before metrics


# ---------------------------------------------------------------- datasets
def _fake_results(ds, with_mesh=True, noise=0.0):
    rng = np.random.default_rng(0)
    mids = ds.mid_indices()
    out = []
    for m in mids:
        gt_mesh = ds.data.mesh_cam[m]
        gt_joint = ds.data.joint_cam[m]
        rec = {
            "joint_coord": gt_joint + noise * rng.normal(
                size=gt_joint.shape),
            "joint_coord_target": gt_joint,
        }
        if with_mesh:
            rec["mesh_coord"] = gt_mesh + noise * rng.normal(
                size=gt_mesh.shape)
            rec["mesh_coord_target"] = gt_mesh
        out.append(rec)
    return out


def test_h36m_dataset_eval(art, capsys):
    ds = Human36M.from_synthetic(art, split="test", num_videos=2,
                                 frames_per_video=40)
    assert len(ds) > 0
    # Camera filter: synthetic data is all cam 4, so nothing is dropped.
    assert ds.keep_mask().all()
    res = ds.evaluate(_fake_results(ds, noise=1.0))
    assert 0 < res.mpjpe < 10
    assert res.per_action is not None
    out = capsys.readouterr().out
    assert "MPJPE" in out and "ACCEL" in out


def test_h36m_fitting_gate(art):
    from pmce_tpu.data.datasets.h36m import fitting_error_mask

    rng = np.random.default_rng(0)
    V = art.num_verts
    jr17 = rng.random((17, V)).astype(np.float32)
    jr17 /= jr17.sum(1, keepdims=True)
    mesh = rng.normal(size=(4, V, 3)).astype(np.float32) * 100
    joints = np.einsum("jv,nvk->njk", jr17, mesh)
    joints_rel = joints - joints[:, :1]
    good = fitting_error_mask(joints_rel, mesh, jr17)
    assert good.all()  # consistent mesh/joints pass the 25 mm gate
    bad = fitting_error_mask(joints_rel + 100.0 * rng.normal(
        size=joints_rel.shape), mesh, jr17)
    assert not bad.any()


def test_pw3d_dataset_eval(art):
    ds = PW3D.from_synthetic(art, num_videos=2, frames_per_video=40)
    res = ds.evaluate(_fake_results(ds, noise=0.0), verbose=False)
    assert res.mpvpe < 1e-2 and res.mpjpe < 1e-2
    # Stage-1 eval uses the coco pelvis (index -2) as root.
    jres = ds.evaluate_joint(_fake_results(ds, with_mesh=False, noise=0.5),
                             verbose=False)
    assert 0 < jres.mpjpe < 5


def test_mpii3d_val_zeroes_mesh(art):
    ds = MPII3D.from_synthetic(art, split="val", num_videos=1,
                               frames_per_video=40)
    batch = ds.get_batch(np.arange(2))
    assert (batch["mesh_valid"] == 0).all()
    assert (batch["lift_pose3d_valid"] == 0).all()
    assert (batch["reg_pose3d_valid"] == 1).all()
    res = ds.evaluate(_fake_results(ds, with_mesh=False, noise=1.0),
                      verbose=False)
    assert 0 < res.mpjpe < 10


def test_static_image_datasets(art):
    for cls in (MSCOCO, MPII):
        ds = cls.from_synthetic(art, num_images=32)
        assert len(ds) == int(ds.data.has_smpl.sum())
        batch = ds.get_batch(np.arange(3))
        # Every frame of a static-image window is identical.
        np.testing.assert_array_equal(batch["pose2d"][:, 0],
                                      batch["pose2d"][:, 7])
        with pytest.raises(NotImplementedError):
            ds.evaluate([])


def test_kp_utils_roundtrip():
    from pmce_tpu.data.kp_utils import convert_kps, get_joint_names

    rng = np.random.default_rng(0)
    spin = rng.normal(size=(49, 3)).astype(np.float32)
    h36m = convert_kps(spin, "spin", "h36m")
    assert h36m.shape == (17, 3)
    # hip (spin index 39) must land at h36m index 0.
    names = get_joint_names("spin")
    np.testing.assert_array_equal(h36m[0], spin[names.index("hip")])
    # coco17 → coco19 keeps the 17 joints and zero-fills pelvis/neck.
    coco = rng.normal(size=(17, 3)).astype(np.float32)
    coco19 = convert_kps(coco, "coco", "coco19")
    np.testing.assert_array_equal(coco19[:17], coco)
    np.testing.assert_array_equal(coco19[17:], 0)
    with pytest.raises(ValueError, match="unknown keypoint convention"):
        convert_kps(coco, "coco", "nope")


def test_noise_model():
    from pmce_tpu.data.noise import oks_distance, synthesize_pose

    rng = np.random.default_rng(0)
    joints = np.zeros((17, 3), np.float32)
    joints[:, 0] = rng.uniform(100, 300, 17)
    joints[:, 1] = rng.uniform(100, 300, 17)
    joints[:, 2] = 1
    area = 200.0 * 200.0
    out = synthesize_pose(joints, area, rng)
    assert out.shape == (17, 3)
    assert (out[:, 2] == 1).all()
    d10 = oks_distance(0.10, area)
    dist = np.linalg.norm(out[:, :2] - joints[:, :2], axis=1)
    # Errors can reach the miss band but not beyond the OKS-0.10 radius of
    # the farthest candidate center (gt or the symmetric partner).
    assert (dist < d10 + 500).all()
    # Statistically, most joints stay within the jitter band.
    outs = [synthesize_pose(joints, area, rng) for _ in range(30)]
    d50 = oks_distance(0.50, area)
    frac_good = np.mean([
        (np.linalg.norm(o[:, :2] - joints[:, :2], axis=1) <= d50).mean()
        for o in outs])
    assert frac_good > 0.5
    # Invalid joints stay untouched.
    joints[3, 2] = 0
    out = synthesize_pose(joints, area, rng)
    np.testing.assert_array_equal(out[3], joints[3])
