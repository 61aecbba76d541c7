"""Augmentation, occlusion, noise-stats, joints, and util tests."""

import numpy as np

from pmce_tpu.data import aug
from pmce_tpu.data.noise_stats import ErrorDistribution
from pmce_tpu.data.occlusion import occlude, occlude_batch
from pmce_tpu.smpl.joints import (
    H36M_TO_J14,
    extended_joint_regressor,
    spin49_regressor,
)
from pmce_tpu.utils.obj_io import load_obj, save_obj


def test_flip_2d(rng):
    kp = rng.uniform(0, 100, size=(17, 2)).astype(np.float32)
    pairs = ((1, 2), (3, 4))
    out = aug.flip_2d_joint(kp.copy(), width=100, flip_pairs=pairs)
    np.testing.assert_allclose(out[0, 0], 100 - kp[0, 0] - 1)
    np.testing.assert_allclose(out[1, 1], kp[2, 1])
    # Double flip is identity.
    out2 = aug.flip_2d_joint(out.copy(), width=100, flip_pairs=pairs)
    np.testing.assert_allclose(out2, kp, atol=1e-5)


def test_flip_3d(rng):
    kp = rng.normal(size=(17, 3)).astype(np.float32)
    pairs = ((1, 2),)
    out = aug.flip_3d_joint(kp, pairs)
    np.testing.assert_allclose(out[1], kp[2] * [-1, 1, 1])
    np.testing.assert_allclose(out[0, 0], -kp[0, 0])


def test_affine_crop_centers_bbox(rng):
    kp = np.array([[60.0, 40.0]], np.float32)  # bbox center
    bbox = np.array([10.0, 20.0, 100.0, 40.0], np.float32)
    warped, trans = aug.j2d_processing(kp.copy(), (224, 224), bbox,
                                       rot=0, flip=False, flip_pairs=())
    # Bbox center maps to crop center.
    np.testing.assert_allclose(warped[0], [112.0, 112.0], atol=1e-3)
    # Inverse transform maps it back.
    inv = aug.get_affine_transform(
        np.array([60.0, 40.0]), np.array([100.0, 40.0]), 0, (224, 224),
        inv=True)
    back = aug.affine_transform(warped[0], inv)
    np.testing.assert_allclose(back, [60.0, 40.0], atol=1e-3)


def test_j3d_rotation(rng):
    S = rng.normal(size=(17, 3)).astype(np.float32)
    out = aug.j3d_processing(S, rot=90.0, flip=False, flip_pairs=())
    # 90° in-plane rotation preserves norms.
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=1), np.linalg.norm(S, axis=1), rtol=1e-5)


def test_augm_params_law():
    rng = np.random.default_rng(0)
    flips = [aug.augm_params(rng, True, True, 30.0)[0]
             for _ in range(200)]
    rots = [aug.augm_params(rng, True, True, 30.0)[1]
            for _ in range(200)]
    assert 0.3 < np.mean(flips) < 0.7
    assert all(abs(r) <= 60.0 for r in rots)
    assert np.mean([r == 0 for r in rots]) > 0.3
    assert aug.augm_params(rng, False, True, 30.0) == (0, 0.0)


def test_occlusion(rng):
    img = np.zeros((64, 64, 3), np.uint8)
    gen = np.random.default_rng(3)
    out = occlude(img, gen, prob=1.0)
    assert out.sum() > 0 and img.sum() == 0
    batch = occlude_batch(np.zeros((4, 64, 64, 3), np.uint8), gen,
                          prob=1.0)
    assert batch.shape == (4, 64, 64, 3)
    assert all(b.sum() > 0 for b in batch)


def test_noise_stats(rng):
    dist = ErrorDistribution()
    gt = rng.uniform(0, 500, size=(100, 17, 2)).astype(np.float32)
    gen = np.random.default_rng(0)
    noisy = dist.perturb(gt, gen)
    err = np.abs(noisy - gt)
    # Wrists (13, 16) jitter more along x than the pelvis (0) and miss
    # more often (lower clean-mode weight) — the measured CPN profile.
    assert err[:, 13, 0].mean() > err[:, 0, 0].mean()
    assert dist.weight[13] < dist.weight[0]
    assert err.mean() < 25.0


def test_noise_stats_measured_table():
    """The table must carry the reference's MEASURED CPN constants
    (/root/reference/data/Human36M/noise_stats.py:5-123) mapped into H36M
    joint order — including the Head/Nose order swap vs the source list."""
    dist = ErrorDistribution()
    # H36M order: ... 8=Neck, 9=Nose, 10=Head ...
    np.testing.assert_allclose(dist.mean[0], (-0.06, -2.37))   # Pelvis
    np.testing.assert_allclose(dist.std[0], (1.33, 2.13))
    assert dist.weight[0] == 1.00
    np.testing.assert_allclose(dist.mean[9], (0.13, -0.26))    # Nose
    np.testing.assert_allclose(dist.std[9], (0.78, 0.59))
    np.testing.assert_allclose(dist.weight[9], 0.98)
    np.testing.assert_allclose(dist.mean[10], (0.09, 0.49))    # Head
    np.testing.assert_allclose(dist.std[10], (1.35, 0.87))
    np.testing.assert_allclose(dist.mean[16], (0.05, 0.16))    # R_Wrist
    np.testing.assert_allclose(dist.weight[16], 0.90)


def test_noise_stats_roundtrip(tmp_path):
    dist = ErrorDistribution()
    p = str(tmp_path / "stats.npz")
    dist.save(p)
    d2 = ErrorDistribution.load(p)
    np.testing.assert_allclose(d2.std, dist.std)


def test_extended_regressor(smpl_artifacts):
    ext = extended_joint_regressor(smpl_artifacts.J_regressor)
    assert ext.shape == (29, smpl_artifacts.num_verts)
    np.testing.assert_allclose(ext[24:].sum(1), 1.0)  # one-hot rows
    spin = spin49_regressor(smpl_artifacts.J_regressor)
    assert spin.shape == (49, smpl_artifacts.num_verts)
    np.testing.assert_allclose(spin.sum(1), 1.0, atol=1e-4)
    assert len(H36M_TO_J14) == 14


def test_obj_roundtrip(tmp_path, smpl_artifacts):
    p = str(tmp_path / "mesh.obj")
    save_obj(smpl_artifacts.v_template[:50], smpl_artifacts.faces[:20] % 50,
             p)
    v, f = load_obj(p)
    np.testing.assert_allclose(v, smpl_artifacts.v_template[:50], atol=1e-5)
    np.testing.assert_array_equal(f, smpl_artifacts.faces[:20] % 50)
