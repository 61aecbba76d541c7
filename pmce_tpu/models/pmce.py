"""Composed two-stage PMCE model: pose lifter + co-evolution decoder.

Parity target: /root/reference/lib/models/PMCE.py:7-26. The lifter outputs
millimeters; the decoder consumes meters (÷1000); outputs are
(mesh [B, 6890, 3] meters, evo_pose [B, J, 3] meters, pose3d [B, J, 3] mm) —
the same triple the reference trainer consumes
(/root/reference/lib/core/base.py:132-134).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pmce_tpu.models.coevo import CoevolutionDecoder
from pmce_tpu.models.pose_lifter import PoseLifter
from pmce_tpu.smpl.artifacts import SMPLArtifacts
from pmce_tpu.smpl.mesh import (
    MeshCoarsening,
    downsample,
    nearest_joint_per_vertex,
)


def resolve_compute_dtype(name: str):
    """Map a config ``MODEL.compute_dtype`` string to the model policy.

    ``"float32"`` → None (pinned-precision f32 path); ``"bfloat16"`` →
    jnp.bfloat16 (params stay f32, matmuls/activations run bf16,
    coordinate-valued heads pinned f32).
    """
    table = {"float32": None, "f32": None,
             "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}
    try:
        return table[name]
    except KeyError:
        raise ValueError(
            f"MODEL.compute_dtype {name!r}: use float32 or bfloat16"
        ) from None


class PMCE(nn.Module):
    """Video 2D pose + image features → mid-frame 3D pose and SMPL mesh."""

    num_joint: int = 17
    embed_dim: int = 256
    depth: int = 3
    vj_relation: tuple = ()
    num_vertx: int = 431
    num_verts_full: int = 6890
    seqlen: int = 16
    # Decoder width knobs (reference defaults; reducible for test harnesses).
    joint_dim: int = 64
    vertx_dim: int = 64
    gru_hidden: int = 1024
    # Compute dtype policy: None = float32 with pinned-precision attention
    # (metric-grade); jnp.bfloat16 = serving fast path (params stay f32,
    # activations/matmuls run bf16, outputs cast back to f32).
    dtype: Any = None
    # Route lifter self-attention through the fused short-sequence Pallas
    # kernel (ops/fused_attention.py). Same params/math; big TPU win.
    fused_attn: bool = False
    # Run each CoevoBlock as ONE Pallas kernel (fused_coevo_block) instead
    # of fused-SA + XLA-CA. Same param tree either way.
    whole_block_kernel: bool = False

    def setup(self):
        self.pose_lifter = PoseLifter(
            num_joints=self.num_joint, num_frames=self.seqlen,
            embed_dim=self.embed_dim, depth=self.depth, dtype=self.dtype,
            fused_attn=self.fused_attn, name="pose_lifter")
        self.pose_mesh_coevo = CoevolutionDecoder(
            num_joint=self.num_joint, vj_relation=self.vj_relation,
            num_vertx=self.num_vertx, num_verts_full=self.num_verts_full,
            joint_dim=self.joint_dim, vertx_dim=self.vertx_dim,
            gru_hidden=self.gru_hidden,
            seqlen=self.seqlen, dtype=self.dtype,
            fused_attn=self.fused_attn,
            whole_block_kernel=self.whole_block_kernel,
            name="pose_mesh_coevo")

    def __call__(self, pose2d: jax.Array, img_feat: jax.Array,
                 deterministic: bool = True):
        """pose2d: [B, T, J, 2]; img_feat: [B, T, 2048].

        Returns:
          (mesh [B, 6890, 3] m, evo_pose [B, J, 3] m, pose3d [B, J, 3] mm).
        """
        pose3d = self.pose_lifter(pose2d, img_feat, deterministic)
        evo_pose, mesh = self.pose_mesh_coevo(
            pose3d / 1000.0, img_feat, deterministic)
        return mesh, evo_pose, pose3d


def build_vj_relation(mean_vertices: np.ndarray,
                      joint_regressor: np.ndarray,
                      coarsening: MeshCoarsening) -> tuple:
    """Nearest-template-joint index for each coarse (431) vertex.

    Mirrors the reference's decoder init (CoevoDecoder.py:199-209): template
    joints are regressed from the FULL-resolution mean mesh; the relation is
    computed against the twice-downsampled (431) mean mesh.

    Args:
      mean_vertices: [6890, 3] template mesh.
      joint_regressor: [J, 6890] (H36M 17-joint regressor in the reference).
      coarsening: mesh coarsening operators.

    Returns:
      tuple of 431 ints in [0, J).
    """
    joints_template = joint_regressor @ mean_vertices
    # One-off constant computation: pin to the host CPU backend so model
    # construction never issues eager ops over the TPU tunnel. Downsample
    # to the coarsening's LAST level — the same level create_pmce reads
    # num_vertx from (a hardcoded level 2 would disagree with the vertex
    # token count for coarsenings with more levels).
    levels = len(coarsening.sizes) - 1
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        coarse = np.asarray(
            downsample(coarsening, jnp.asarray(mean_vertices), 0, levels)
        )
    return tuple(
        int(i) for i in nearest_joint_per_vertex(joints_template, coarse)
    )


@dataclasses.dataclass(frozen=True)
class PMCEAssets:
    """Static data a PMCE model instance is built around."""

    mean_vertices: np.ndarray      # [6890, 3]
    joint_regressor_h36m: np.ndarray   # [17, 6890]
    vj_relation: tuple


def default_assets(art: SMPLArtifacts, coarsening: MeshCoarsening,
                   joint_regressor_h36m: np.ndarray | None = None
                   ) -> PMCEAssets:
    """Build decoder assets from SMPL artifacts.

    If no H36M 17-joint regressor is supplied (the converted real
    ``J_regressor_h36m`` npz), a deterministic stand-in is derived from the
    24-joint SMPL regressor by selecting/averaging rows onto the H36M joint
    set — structurally faithful (sparse, row-stochastic) for tests.
    """
    if joint_regressor_h36m is None:
        jr24 = art.J_regressor
        # H36M-17 from SMPL-24 joints: pelvis, hips, knees, ankles, spine,
        # neck/nose/head approximations, shoulders, elbows, wrists.
        picks = [
            (0,), (2,), (5,), (8,), (1,), (4,), (7,), (3, 6), (12,), (15,),
            (15,), (16,), (18,), (20,), (17,), (19,), (21,),
        ]
        rows = []
        for p in picks:
            rows.append(np.mean([jr24[i] for i in p], axis=0))
        joint_regressor_h36m = np.stack(rows).astype(np.float32)

    vj = build_vj_relation(art.v_template, joint_regressor_h36m, coarsening)
    return PMCEAssets(
        mean_vertices=art.v_template.copy(),
        joint_regressor_h36m=joint_regressor_h36m,
        vj_relation=vj,
    )


def create_pmce(num_joint: int, art: SMPLArtifacts,
                coarsening: MeshCoarsening,
                joint_regressor_h36m: np.ndarray | None = None,
                embed_dim: int = 256, depth: int = 3,
                seqlen: int = 16, dtype=None,
                fused_attn: bool = False,
                whole_block_kernel: bool = False) -> tuple[PMCE, PMCEAssets]:
    """Factory mirroring the reference's ``models.PMCE.get_model``."""
    assets = default_assets(art, coarsening, joint_regressor_h36m)
    model = PMCE(
        num_joint=num_joint, embed_dim=embed_dim, depth=depth,
        vj_relation=assets.vj_relation,
        num_vertx=coarsening.sizes[-1],
        num_verts_full=art.num_verts, seqlen=seqlen, dtype=dtype,
        fused_attn=fused_attn, whole_block_kernel=whole_block_kernel,
    )
    return model, assets
