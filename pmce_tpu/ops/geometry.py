"""Rotation-representation conversions, batched and jit-friendly.

Functional parity targets (math, not code) in the reference repo:
- axis-angle → rotmat via half-angle quaternion:
  /root/reference/smplpytorch/smplpytorch/pytorch/rodrigues_layer.py:13-52
  and /root/reference/lib/geometry.py:38-81
- 6D rotation → rotmat: /root/reference/lib/geometry.py:346-359
- rotmat → axis-angle (kornia port): /root/reference/lib/geometry.py:84-249
- euler → rotmat: /root/reference/lib/coord_utils.py:176-215

All functions are shape-polymorphic over leading batch dims, pure, and safe
under ``jax.jit`` / ``jax.vmap`` (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """Convert (w, x, y, z) quaternions to rotation matrices.

    Args:
      quat: [..., 4] quaternion coefficients (not necessarily normalized).

    Returns:
      [..., 3, 3] rotation matrices.
    """
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]

    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z

    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(*quat.shape[:-1], 3, 3)


def axis_angle_to_rotmat(axisang: jax.Array) -> jax.Array:
    """Axis-angle (Rodrigues vector) → rotation matrix.

    Uses the half-angle quaternion construction with the same ``+1e-8``
    norm regularizer as the reference so that gradients and values match
    bit-for-bit at theta→0.

    Args:
      axisang: [..., 3] rotation vectors (angle encoded as magnitude).

    Returns:
      [..., 3, 3] rotation matrices.
    """
    angle = jnp.linalg.norm(axisang + _EPS, axis=-1, keepdims=True)
    normalized = axisang / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat_to_rotmat(quat)


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """6D continuous rotation representation → rotation matrix.

    Gram–Schmidt on the two 3-vectors (Zhou et al., CVPR 2019), matching
    the normalization epsilons of the reference implementation.

    Args:
      x: [..., 6] (interpreted as [..., 3, 2] column pairs).

    Returns:
      [..., 3, 3] rotation matrices.
    """
    x = x.reshape(*x.shape[:-1], 3, 2)
    a1, a2 = x[..., 0], x[..., 1]

    def _normalize(v, eps=1e-6):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(n, eps)

    b1 = _normalize(a1)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = _normalize(a2 - dot * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_quat(rotmat: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Rotation matrix → quaternion (w, x, y, z), branch-free.

    Shepperd-style four-candidate selection computed with ``jnp.where``
    masks (no data-dependent branching), mirroring the reference's kornia
    port semantics.

    Args:
      rotmat: [..., 3, 3].

    Returns:
      [..., 4] unit quaternions.
    """
    # Work on the transpose like the reference (it feeds rmat_t).
    rt = jnp.swapaxes(rotmat, -1, -2)
    r00, r01, r02 = rt[..., 0, 0], rt[..., 0, 1], rt[..., 0, 2]
    r10, r11, r12 = rt[..., 1, 0], rt[..., 1, 1], rt[..., 1, 2]
    r20, r21, r22 = rt[..., 2, 0], rt[..., 2, 1], rt[..., 2, 2]

    mask_d2 = r22 < eps
    mask_d0_d1 = r00 > r11
    mask_d0_nd1 = r00 < -r11

    t0 = 1 + r00 - r11 - r22
    q0 = jnp.stack([r12 - r21, t0, r01 + r10, r20 + r02], axis=-1)

    t1 = 1 - r00 + r11 - r22
    q1 = jnp.stack([r20 - r02, r01 + r10, t1, r12 + r21], axis=-1)

    t2 = 1 - r00 - r11 + r22
    q2 = jnp.stack([r01 - r10, r20 + r02, r12 + r21, t2], axis=-1)

    t3 = 1 + r00 + r11 + r22
    q3 = jnp.stack([t3, r12 - r21, r20 - r02, r01 - r10], axis=-1)

    c0 = (mask_d2 & mask_d0_d1)[..., None]
    c1 = (mask_d2 & ~mask_d0_d1)[..., None]
    c2 = (~mask_d2 & mask_d0_nd1)[..., None]
    c3 = (~mask_d2 & ~mask_d0_nd1)[..., None]

    q = jnp.where(c0, q0, jnp.where(c1, q1, jnp.where(c2, q2, q3)))
    t = jnp.where(
        c0[..., 0], t0, jnp.where(c1[..., 0], t1, jnp.where(c2[..., 0], t2, t3))
    )
    q = q * (0.5 / jnp.sqrt(jnp.maximum(t, eps)))[..., None]
    return q


def quat_to_axis_angle(quat: jax.Array) -> jax.Array:
    """Quaternion (w, x, y, z) → axis-angle vector.

    Args:
      quat: [..., 4].

    Returns:
      [..., 3] rotation vectors.
    """
    q1, q2, q3 = quat[..., 1], quat[..., 2], quat[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    sin_theta = jnp.sqrt(jnp.maximum(sin_sq, 0.0))
    cos_theta = quat[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    k = jnp.where(sin_sq > 0.0, two_theta / jnp.maximum(sin_theta, _EPS), 2.0)
    aa = jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)
    return jnp.where(jnp.isnan(aa), 0.0, aa)


def rotmat_to_axis_angle(rotmat: jax.Array) -> jax.Array:
    """Rotation matrix → axis-angle via quaternion."""
    return quat_to_axis_angle(rotmat_to_quat(rotmat))


def euler_to_rotmat(theta: jax.Array) -> jax.Array:
    """XYZ Euler angles → rotation matrix R = Rz @ Ry @ Rx.

    Args:
      theta: [..., 3] (theta_x, theta_y, theta_z) in radians.

    Returns:
      [..., 3, 3].
    """
    tx, ty, tz = theta[..., 0], theta[..., 1], theta[..., 2]
    cx, sx = jnp.cos(tx), jnp.sin(tx)
    cy, sy = jnp.cos(ty), jnp.sin(ty)
    cz, sz = jnp.cos(tz), jnp.sin(tz)
    one = jnp.ones_like(tx)
    zero = jnp.zeros_like(tx)

    rx = jnp.stack(
        [one, zero, zero, zero, cx, -sx, zero, sx, cx], axis=-1
    ).reshape(*tx.shape, 3, 3)
    ry = jnp.stack(
        [cy, zero, sy, zero, one, zero, -sy, zero, cy], axis=-1
    ).reshape(*tx.shape, 3, 3)
    rz = jnp.stack(
        [cz, -sz, zero, sz, cz, zero, zero, zero, one], axis=-1
    ).reshape(*tx.shape, 3, 3)
    return rz @ ry @ rx
