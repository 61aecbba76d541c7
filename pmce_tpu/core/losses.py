"""Training losses: coordinate L1, surface normal, edge length, Laplacian.

Numerical parity targets: /root/reference/lib/core/loss.py:6-114.
All losses are batched jnp, statically shaped, and mask-aware:
- ``coord_l1``: L1 with optional validity mask applied multiplicatively to
  BOTH pred and target before the mean (exactly the reference semantics —
  the mean divides by the full element count, so masked joints dilute the
  loss rather than re-normalizing it);
- ``normal_loss``: mean |cos| between predicted triangle edges and GT face
  normals over the 3 edges of every face;
- ``edge_length_loss``: mean |Δ edge length| over the 3 edges of every face;
- ``laplacian_loss``: mean squared uniform-Laplacian coordinates (built but
  unused in the reference's default recipe; provided for completeness).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def coord_l1(pred: jax.Array, target: jax.Array,
             valid: jax.Array | None = None) -> jax.Array:
    """Mean L1 with the reference's multiplicative validity masking."""
    if valid is not None:
        pred = pred * valid
        target = target * valid
    return jnp.mean(jnp.abs(pred - target))


def _normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    # torch F.normalize semantics: x / max(||x||, eps).
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def normal_loss(coord_out: jax.Array, coord_gt: jax.Array,
                faces: jax.Array) -> jax.Array:
    """Predicted edges ⟂ GT face normals.

    Args:
      coord_out, coord_gt: [B, V, 3]; faces: [F, 3] int.
    """
    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]

    v1_out = _normalize(coord_out[:, f1] - coord_out[:, f0])
    v2_out = _normalize(coord_out[:, f2] - coord_out[:, f0])
    v3_out = _normalize(coord_out[:, f2] - coord_out[:, f1])

    v1_gt = _normalize(coord_gt[:, f1] - coord_gt[:, f0])
    v2_gt = _normalize(coord_gt[:, f2] - coord_gt[:, f0])
    normal_gt = _normalize(jnp.cross(v1_gt, v2_gt))

    cos1 = jnp.abs(jnp.sum(v1_out * normal_gt, axis=-1))
    cos2 = jnp.abs(jnp.sum(v2_out * normal_gt, axis=-1))
    cos3 = jnp.abs(jnp.sum(v3_out * normal_gt, axis=-1))
    return jnp.mean(jnp.stack([cos1, cos2, cos3]))


def edge_length_loss(coord_out: jax.Array, coord_gt: jax.Array,
                     faces: jax.Array) -> jax.Array:
    """|pred edge length − gt edge length| averaged over all face edges."""
    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]

    def elen(c, a, b):
        return jnp.sqrt(jnp.sum((c[:, a] - c[:, b]) ** 2, axis=-1))

    d1 = jnp.abs(elen(coord_out, f0, f1) - elen(coord_gt, f0, f1))
    d2 = jnp.abs(elen(coord_out, f0, f2) - elen(coord_gt, f0, f2))
    d3 = jnp.abs(elen(coord_out, f1, f2) - elen(coord_gt, f1, f2))
    return jnp.mean(jnp.stack([d1, d2, d3]))


def build_laplacian(faces: np.ndarray, num_verts: int) -> np.ndarray:
    """Row-normalized uniform Laplacian (dense [V, V], host-side)."""
    L = np.zeros((num_verts, num_verts), dtype=np.float32)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        L[faces[:, a], faces[:, b]] = -1
        L[faces[:, b], faces[:, a]] = -1
    np.fill_diagonal(L, -L.sum(1))
    diag = np.diag(L).copy()
    L /= (diag[:, None] + 1e-8)
    return L


def laplacian_loss(laplacian: jax.Array, verts: jax.Array) -> jax.Array:
    """Mean squared Laplacian coordinates: [V, V] × [B, V, 3]."""
    lap = jnp.einsum("vw,bwk->bvk", laplacian, verts, precision=_HI)
    return jnp.mean(jnp.sum(lap ** 2, axis=-1))


def pmce_total_loss(pred_mesh, evo_pose, pose3d,
                    gt_mesh, gt_lift_pose, gt_reg_pose,
                    mesh_valid, lift_valid, reg_valid,
                    faces, J_regressor_target,
                    normal_weight: float, edge_weight: float,
                    joint_weight: float, use_edge_loss) -> tuple:
    """The reference trainer's 6-term mesh loss (base.py:132-148).

    Units follow the reference: mesh losses in meters, joint losses in mm
    (mesh regressed to joints at ×1000, lifter output already mm).

    Args:
      pred_mesh [B,V,3] m; evo_pose [B,J,3] m; pose3d [B,J,3] mm.
      gt_mesh [B,V,3] m; gt_lift_pose [B,J,3] mm; gt_reg_pose [B,17,3] mm.
      *_valid: broadcastable validity masks or None.
      J_regressor_target: [17, V] (target_joint_set regressor).
      use_edge_loss: bool or traced 0/1 scalar gating the edge term.

    Returns:
      (total, dict of per-term values).
    """
    pred_reg_pose = jnp.einsum(
        "jv,bvk->bjk", J_regressor_target, pred_mesh * 1000.0, precision=_HI)

    l_vertex = coord_l1(pred_mesh, gt_mesh, mesh_valid)
    l_normal = normal_weight * normal_loss(pred_mesh, gt_mesh, faces)
    l_edge = edge_weight * edge_length_loss(pred_mesh, gt_mesh, faces)
    l_reg = joint_weight * coord_l1(pred_reg_pose, gt_reg_pose, reg_valid)
    l_evo = joint_weight * coord_l1(evo_pose * 1000.0, gt_lift_pose,
                                    lift_valid)
    l_lift = joint_weight * coord_l1(pose3d, gt_lift_pose, lift_valid)

    edge_gate = jnp.asarray(use_edge_loss, l_edge.dtype)
    total = l_vertex + l_normal + edge_gate * l_edge + l_reg + l_evo + l_lift
    terms = {
        "vertex": l_vertex, "normal": l_normal, "edge": l_edge,
        "reg_joint": l_reg, "evo_joint": l_evo, "lift_joint": l_lift,
    }
    return total, terms
