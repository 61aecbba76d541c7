"""Evaluation metrics: MPJPE, PA-MPJPE, MPVPE, acceleration error.

Protocol parity targets in the reference repo:
- MPJPE / MPVPE batch metrics: /root/reference/data/Human36M/dataset.py:600-623
- acceleration error: /root/reference/lib/eval_utils.py:24-52
- per-sequence ACCEL accumulation: /root/reference/data/PW3D/dataset.py:413-426

All metrics are batched JAX; sequence bookkeeping (grouping windows into
contiguous videos) stays host-side in the dataset evaluators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pmce_tpu.ops.procrustes import rigid_align


def per_joint_error(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Euclidean error per joint: [..., J, 3] → [..., J]."""
    return jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1))


def mpjpe(pred: jax.Array, gt: jax.Array, root_idx: int | None = 0) -> jax.Array:
    """Mean per-joint position error after optional root alignment.

    Args:
      pred, gt: [..., J, 3].
      root_idx: joint used for root alignment; None skips alignment.

    Returns:
      scalar (mean over every batch element and joint).
    """
    if root_idx is not None:
        pred = pred - pred[..., root_idx : root_idx + 1, :]
        gt = gt - gt[..., root_idx : root_idx + 1, :]
    return jnp.mean(per_joint_error(pred, gt))


def pa_mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Procrustes-aligned MPJPE (per-sample similarity alignment)."""
    aligned = rigid_align(pred, gt)
    return jnp.mean(per_joint_error(aligned, gt))


def mpvpe(pred_verts: jax.Array, gt_verts: jax.Array) -> jax.Array:
    """Mean per-vertex position error (inputs already root-aligned)."""
    return jnp.mean(per_joint_error(pred_verts, gt_verts))


def accel(joints: jax.Array) -> jax.Array:
    """Second finite difference magnitude of a joint sequence.

    Args:
      joints: [N, J, 3] sequence.

    Returns:
      [N-2] per-frame mean acceleration norms.
    """
    vel = joints[1:] - joints[:-1]
    acc = vel[1:] - vel[:-1]
    return jnp.mean(jnp.linalg.norm(acc, axis=-1), axis=-1)


def accel_error(joints_gt: jax.Array, joints_pred: jax.Array) -> jax.Array:
    """Acceleration error between two sequences.

    Args:
      joints_gt, joints_pred: [N, J, 3].

    Returns:
      [N-2] per-frame mean acceleration error norms.
    """
    a_gt = joints_gt[:-2] - 2 * joints_gt[1:-1] + joints_gt[2:]
    a_pr = joints_pred[:-2] - 2 * joints_pred[1:-1] + joints_pred[2:]
    return jnp.mean(jnp.linalg.norm(a_pr - a_gt, axis=-1), axis=-1)
