"""Batched SMPL forward pass in JAX (blend shapes + kinematics + LBS).

Numerical parity target: /root/reference/smplpytorch/smplpytorch/pytorch/
smpl_layer.py:65-158 (axis-angle → rotmats, shape/pose blendshapes, the
24-joint kinematic chain, inverse-bind subtraction, linear blend skinning).

TPU-first design choices (vs the reference's per-sample CPU loop):
- everything is batched over B; matmuls ([V,10]·β, [V,207]·pose_map, LBS)
  are single dense contractions that map straight onto the MXU;
- the kinematic chain is composed level-by-level over the tree depth
  (max 7 levels) instead of 23 serial steps — identical association order,
  so values match the reference bit-for-bit in float32;
- the skinning application can optionally run through the fused Pallas
  kernel in ``pmce_tpu.smpl.kernels`` (see ``smpl_forward``'s ``fused`` arg).

Called per-batch on device during training-data synthesis instead of
per-sample inside dataloader workers (reference behavior at
/root/reference/data/Human36M/dataset.py:354-398).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pmce_tpu.ops.geometry import axis_angle_to_rotmat
from pmce_tpu.smpl.artifacts import SMPLArtifacts, kintree_levels

# SMPL parity is specified at ≤0.1 mm; the TPU's default bf16 matmul
# precision costs ~10 mm, so every contraction here pins full float32.
_HIGHEST = jax.lax.Precision.HIGHEST


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SMPLModel:
    """Device-resident SMPL parameters plus static tree metadata."""

    v_template: jax.Array   # [V, 3]
    shapedirs: jax.Array    # [V, 3, 10]
    posedirs: jax.Array     # [V, 3, 207]
    J_regressor: jax.Array  # [J, V]
    lbs_weights: jax.Array  # [V, J]
    faces: jax.Array        # [F, 3] int32
    # Static (hashable) tree structure — aux data, not traced.
    parents: tuple = dataclasses.field(default=(), metadata={"static": True})
    levels: tuple = dataclasses.field(default=(), metadata={"static": True})

    @classmethod
    def from_artifacts(cls, art: SMPLArtifacts, dtype=jnp.float32) -> "SMPLModel":
        levels = tuple(
            tuple(int(i) for i in lvl) for lvl in kintree_levels(art.kintree_parents)
        )
        return cls(
            v_template=jnp.asarray(art.v_template, dtype),
            shapedirs=jnp.asarray(art.shapedirs, dtype),
            posedirs=jnp.asarray(art.posedirs, dtype),
            J_regressor=jnp.asarray(art.J_regressor, dtype),
            lbs_weights=jnp.asarray(art.lbs_weights, dtype),
            faces=jnp.asarray(art.faces, jnp.int32),
            parents=tuple(int(p) for p in art.kintree_parents),
            levels=levels,
        )

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    def tree_flatten(self):
        children = (
            self.v_template, self.shapedirs, self.posedirs,
            self.J_regressor, self.lbs_weights, self.faces,
        )
        aux = (self.parents, self.levels)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, parents=aux[0], levels=aux[1])


def _compose_chain(rotmats: jax.Array, joints: jax.Array,
                   parents: tuple, levels: tuple) -> jax.Array:
    """Compose global joint transforms along the kinematic tree.

    Args:
      rotmats: [B, J, 3, 3] per-joint local rotations.
      joints: [B, J, 3] rest-pose joint positions.
      parents: static parent indices.
      levels: static level-order grouping from ``kintree_levels``.

    Returns:
      [B, J, 4, 4] global rigid transforms (rotation + joint position).
    """
    B, J = rotmats.shape[0], rotmats.shape[1]
    parents_arr = np.asarray(parents)

    # Local relative transforms: [R_i | j_i - j_parent(i)] (root keeps j_0).
    rel_t = joints - joints[:, parents_arr]
    rel_t = rel_t.at[:, 0].set(joints[:, 0])
    rel = jnp.zeros((B, J, 4, 4), rotmats.dtype)
    rel = rel.at[:, :, :3, :3].set(rotmats)
    rel = rel.at[:, :, :3, 3].set(rel_t)
    rel = rel.at[:, :, 3, 3].set(1.0)

    out = rel
    # Level 0 is the root — its global transform is its relative transform.
    for lvl in levels[1:]:
        lvl = np.asarray(lvl)
        par = parents_arr[lvl]
        composed = jnp.einsum(
            "bjmk,bjkn->bjmn", out[:, par], rel[:, lvl],
            precision=_HIGHEST,
        )
        out = out.at[:, lvl].set(composed)
    return out


def skinning_transforms(model: SMPLModel, pose: jax.Array,
                        betas: jax.Array):
    """Everything before the per-vertex skinning application.

    Args:
      model: SMPLModel.
      pose: [B, 72] axis-angle (24 joints × 3).
      betas: [B, 10] shape coefficients.

    Returns:
      (v_posed [B, V, 3], A_skin [B, J, 4, 4], joints_out [B, J, 3])
      where ``A_skin`` already has the inverse-bind translation folded in
      (reference smpl_layer.py:122-132).
    """
    B = pose.shape[0]
    J = model.num_joints

    rotmats = axis_angle_to_rotmat(pose.reshape(B, J, 3))
    eye = jnp.eye(3, dtype=rotmats.dtype)
    pose_map = (rotmats[:, 1:] - eye).reshape(B, 9 * (J - 1))

    v_shaped = model.v_template + jnp.einsum(
        "vki,bi->bvk", model.shapedirs, betas,
        precision=_HIGHEST,
    )
    joints_rest = jnp.einsum(
        "jv,bvk->bjk", model.J_regressor, v_shaped,
        precision=_HIGHEST,
    )
    v_posed = v_shaped + jnp.einsum(
        "vkp,bp->bvk", model.posedirs, pose_map,
        precision=_HIGHEST,
    )

    A = _compose_chain(rotmats, joints_rest, model.parents, model.levels)
    joints_out = A[:, :, :3, 3]

    # Inverse-bind: subtract the transform of the rest joint location so the
    # skinning transform acts on rest-pose vertex coordinates directly.
    shifted = jnp.einsum(
        "bjmk,bjk->bjm", A[:, :, :3, :3], joints_rest,
        precision=_HIGHEST,
    )
    A_skin = A.at[:, :, :3, 3].add(-shifted)
    return v_posed, A_skin, joints_out


def apply_skinning(v_posed: jax.Array, A_skin: jax.Array,
                   lbs_weights: jax.Array) -> jax.Array:
    """Linear blend skinning application (XLA path).

    Args:
      v_posed: [B, V, 3].
      A_skin: [B, J, 4, 4] inverse-bind-corrected transforms.
      lbs_weights: [V, J].

    Returns:
      [B, V, 3] posed vertices.
    """
    # Blend transforms per vertex: one [V,J]×[B,J,12] matmul on the MXU.
    A_flat = A_skin[:, :, :3, :].reshape(A_skin.shape[0], A_skin.shape[1], 12)
    T = jnp.einsum(
        "vj,bjk->bvk", lbs_weights, A_flat,
        precision=_HIGHEST,
    ).reshape(A_skin.shape[0], -1, 3, 4)
    return (
        jnp.einsum("bvmk,bvk->bvm", T[..., :3], v_posed,
                   precision=_HIGHEST)
        + T[..., 3]
    )


@partial(jax.jit, static_argnames=("fused",))
def smpl_forward(model: SMPLModel, pose: jax.Array, betas: jax.Array,
                 trans: jax.Array | None = None,
                 fused: bool | None = None):
    """Full SMPL forward: (pose, betas[, trans]) → vertices and joints.

    Args:
      model: SMPLModel pytree.
      pose: [B, 72] axis-angle.
      betas: [B, 10].
      trans: optional [B, 3] translation added to the output (the reference
        applies it whenever its norm is nonzero; passing zeros here is
        equivalent to the reference's no-trans path with ``center_idx=None``).
      fused: route the skinning application through the Pallas kernel.
        Default (None): on TPU, where it beats the XLA two-step by ~12%
        with forced-execution timing (tools/probe_skinning.py: 2.21 vs
        2.51 ms at B=256); off elsewhere (the CPU interpreter is slow).

    Returns:
      (verts [B, V, 3], joints [B, J, 3]) in meters.
    """
    if fused is None:
        fused = jax.default_backend() == "tpu"
    v_posed, A_skin, joints = skinning_transforms(model, pose, betas)
    if fused:
        from pmce_tpu.smpl.kernels import fused_skinning
        verts = fused_skinning(v_posed, A_skin, model.lbs_weights)
    else:
        verts = apply_skinning(v_posed, A_skin, model.lbs_weights)
    if trans is not None:
        verts = verts + trans[:, None, :]
        joints = joints + trans[:, None, :]
    return verts, joints


@jax.jit
def regress_joints(J_regressor: jax.Array, verts: jax.Array) -> jax.Array:
    """Regress a joint set from mesh vertices: [K,V] × [B,V,3] → [B,K,3]."""
    return jnp.einsum(
        "kv,bvc->bkc", J_regressor, verts,
        precision=_HIGHEST,
    )
