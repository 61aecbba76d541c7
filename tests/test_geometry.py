"""Rotation-conversion and coordinate-transform tests."""

import jax.numpy as jnp
import numpy as np

from pmce_tpu.ops import coords, geometry

from oracles import rodrigues_np, similarity_align_np


def test_axis_angle_roundtrip(rng):
    aa = rng.normal(scale=1.0, size=(32, 3)).astype(np.float32)
    R = geometry.axis_angle_to_rotmat(jnp.asarray(aa))
    np.testing.assert_allclose(np.asarray(R), rodrigues_np(aa), atol=1e-6)
    aa_back = geometry.rotmat_to_axis_angle(R)
    R2 = geometry.axis_angle_to_rotmat(aa_back)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_rotmat_orthonormal(rng):
    aa = rng.normal(size=(16, 3)).astype(np.float32)
    R = np.asarray(geometry.axis_angle_to_rotmat(jnp.asarray(aa)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_rot6d(rng):
    x = rng.normal(size=(8, 6)).astype(np.float32)
    R = np.asarray(geometry.rot6d_to_rotmat(jnp.asarray(x)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # Identity 6D → identity rotation.
    ident6 = jnp.asarray([[1, 0, 0, 1, 0, 0]], dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(geometry.rot6d_to_rotmat(ident6))[0], np.eye(3), atol=1e-6
    )


def test_euler(rng):
    theta = rng.normal(size=(4, 3)).astype(np.float32)
    R = np.asarray(geometry.euler_to_rotmat(jnp.asarray(theta)))
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # Pure z-rotation matches the textbook matrix.
    tz = np.array([[0.0, 0.0, 0.3]], dtype=np.float32)
    Rz = np.asarray(geometry.euler_to_rotmat(jnp.asarray(tz)))[0]
    c, s = np.cos(0.3), np.sin(0.3)
    np.testing.assert_allclose(
        Rz, np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]), atol=1e-6
    )


def test_cam_pixel_roundtrip(rng):
    pts = rng.normal(size=(5, 17, 3)).astype(np.float32)
    pts[..., 2] += 5.0
    f = np.array([1100.0, 1100.0], dtype=np.float32)
    c = np.array([500.0, 500.0], dtype=np.float32)
    pix = coords.cam2pixel(jnp.asarray(pts), jnp.asarray(f), jnp.asarray(c))
    back = coords.pixel2cam(pix, jnp.asarray(c), jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)


def test_world2cam(rng):
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    aa = rng.normal(size=(1, 3)).astype(np.float32)
    R = np.asarray(geometry.axis_angle_to_rotmat(jnp.asarray(aa)))[0]
    t = rng.normal(size=(3,)).astype(np.float32)
    out = coords.world2cam(jnp.asarray(pts), jnp.asarray(R), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out), pts @ R.T + t, atol=1e-5)


def test_normalize_screen_coordinates():
    x = jnp.asarray([[[0.0, 0.0], [1000.0, 500.0]]])
    out = np.asarray(coords.normalize_screen_coordinates(x, 1000, 500))
    np.testing.assert_allclose(out[0, 0], [-1.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], [1.0, 0.5], atol=1e-6)


def test_rigid_align_matches_oracle(rng):
    from pmce_tpu.ops.procrustes import rigid_align

    A = rng.normal(size=(6, 14, 3)).astype(np.float32)
    B = rng.normal(size=(6, 14, 3)).astype(np.float32)
    out = np.asarray(rigid_align(jnp.asarray(A), jnp.asarray(B)))
    for i in range(6):
        np.testing.assert_allclose(
            out[i], similarity_align_np(A[i], B[i]), atol=1e-4
        )


def test_rigid_align_recovers_transform(rng):
    """Aligning a transformed copy back onto the original is exact."""
    from pmce_tpu.ops.procrustes import rigid_align

    X = rng.normal(size=(14, 3)).astype(np.float32)
    aa = rng.normal(size=(1, 3)).astype(np.float32)
    R = np.asarray(geometry.axis_angle_to_rotmat(jnp.asarray(aa)))[0]
    Y = 1.7 * X @ R.T + np.array([0.3, -0.2, 0.9])
    aligned = np.asarray(rigid_align(jnp.asarray(X)[None], jnp.asarray(Y)[None]))
    np.testing.assert_allclose(aligned[0], Y, atol=1e-4)


def test_metrics(rng):
    from pmce_tpu.ops import metrics

    pred = rng.normal(size=(4, 14, 3)).astype(np.float32)
    gt = pred + 0.001
    # Constant offset disappears under root alignment.
    assert float(metrics.mpjpe(jnp.asarray(pred), jnp.asarray(gt))) < 1e-5
    assert float(metrics.pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt))) < 1e-4

    seq = rng.normal(size=(10, 14, 3)).astype(np.float32)
    acc = metrics.accel_error(jnp.asarray(seq), jnp.asarray(seq))
    np.testing.assert_allclose(np.asarray(acc), np.zeros(8), atol=1e-6)

    # Linear motion has zero acceleration.
    t = np.linspace(0, 1, 10, dtype=np.float32)[:, None, None]
    lin = np.broadcast_to(t, (10, 14, 3)).copy()
    np.testing.assert_allclose(
        np.asarray(metrics.accel(jnp.asarray(lin))), np.zeros(8), atol=1e-6
    )
