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


def build_face_losses(faces: np.ndarray, num_verts: int):
    """Fused normal+edge loss with a segment-sum backward (TPU-fast).

    The straightforward formulation gathers triangle vertices, and XLA
    differentiates the gathers into generic scatter-adds — the single most
    expensive piece of the training step (~1/3 of a full PMCE step).
    This builder returns a ``custom_vjp`` callable computing BOTH face
    losses from one shared gather; its backward accumulates per-vertex
    gradients with a PRE-SORTED ``segment_sum`` (indices_are_sorted), which
    lowers ~3× faster than the generic scatters while matching autodiff to
    float32 accumulation order.

    Args:
      faces: [F, 3] host triangle indices.
      num_verts: V.

    Returns:
      fn(pred_mesh [B,V,3], gt_mesh [B,V,3]) -> (normal_loss, edge_loss).
    """
    faces = np.asarray(faces)
    flat_idx = faces.reshape(-1)
    order = np.argsort(flat_idx, kind="stable")
    sorted_ids = jnp.asarray(flat_idx[order])
    order_j = jnp.asarray(order)
    faces_j = jnp.asarray(faces)
    F = len(faces)

    def _h(P, Pg):
        """Both losses from gathered triangles P, Pg: [B, F, 3, 3]."""
        v1o = _normalize(P[:, :, 1] - P[:, :, 0])
        v2o = _normalize(P[:, :, 2] - P[:, :, 0])
        v3o = _normalize(P[:, :, 2] - P[:, :, 1])
        v1g = _normalize(Pg[:, :, 1] - Pg[:, :, 0])
        v2g = _normalize(Pg[:, :, 2] - Pg[:, :, 0])
        ng = _normalize(jnp.cross(v1g, v2g))
        ln = jnp.mean(jnp.stack([
            jnp.abs(jnp.sum(v * ng, -1)) for v in (v1o, v2o, v3o)]))

        def elen(Q, a, b):
            return jnp.sqrt(jnp.sum((Q[:, :, a] - Q[:, :, b]) ** 2, -1))

        le = jnp.mean(jnp.stack([
            jnp.abs(elen(P, a, b) - elen(Pg, a, b))
            for a, b in ((0, 1), (0, 2), (1, 2))]))
        return ln, le

    @jax.custom_vjp
    def face_losses(pred, gt):
        return _h(pred[:, faces_j], gt[:, faces_j])

    def fwd(pred, gt):
        P, Pg = pred[:, faces_j], gt[:, faces_j]
        return _h(P, Pg), (P, Pg)

    def bwd(res, ct):
        P, Pg = res
        _, vjp = jax.vjp(_h, P, Pg)
        dP, _ = vjp(ct)
        dP_flat = dP.reshape(dP.shape[0], 3 * F, 3)[:, order_j]
        dm = jax.ops.segment_sum(
            jnp.swapaxes(dP_flat, 0, 1), sorted_ids,
            num_segments=num_verts, indices_are_sorted=True)
        return (jnp.swapaxes(dm, 0, 1),
                jnp.zeros((dP.shape[0], num_verts, 3), dP.dtype))

    face_losses.defvjp(fwd, bwd)
    return face_losses


def pmce_total_loss(pred_mesh, evo_pose, pose3d,
                    gt_mesh, gt_lift_pose, gt_reg_pose,
                    mesh_valid, lift_valid, reg_valid,
                    faces, J_regressor_target,
                    normal_weight: float, edge_weight: float,
                    joint_weight: float, use_edge_loss,
                    face_loss_fn=None) -> tuple:
    """The reference trainer's 6-term mesh loss (base.py:132-148).

    Units follow the reference: mesh losses in meters, joint losses in mm
    (mesh regressed to joints at ×1000, lifter output already mm).

    Args:
      pred_mesh [B,V,3] m; evo_pose [B,J,3] m; pose3d [B,J,3] mm.
      gt_mesh [B,V,3] m; gt_lift_pose [B,J,3] mm; gt_reg_pose [B,17,3] mm.
      *_valid: broadcastable validity masks or None.
      J_regressor_target: [17, V] (target_joint_set regressor).
      use_edge_loss: bool or traced 0/1 scalar gating the edge term.
      face_loss_fn: optional fused normal+edge callable from
        ``build_face_losses`` (the fast path for training).

    Returns:
      (total, dict of per-term values).
    """
    pred_reg_pose = jnp.einsum(
        "jv,bvk->bjk", J_regressor_target, pred_mesh * 1000.0, precision=_HI)

    l_vertex = coord_l1(pred_mesh, gt_mesh, mesh_valid)
    if face_loss_fn is not None:
        ln, le = face_loss_fn(pred_mesh, gt_mesh)
    else:
        ln = normal_loss(pred_mesh, gt_mesh, faces)
        le = edge_length_loss(pred_mesh, gt_mesh, faces)
    l_normal = normal_weight * ln
    l_edge = edge_weight * le
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
