"""Stage-2 pose↔mesh co-evolution decoder.

Architecture parity target: /root/reference/lib/models/CoevoDecoder.py
(classes ``CoevoBlock`` and ``Pose2Mesh``):

- a 2-layer bidirectional GRU aggregates the T per-frame 2048-d image
  features; the mid-frame output (2048-d) conditions every AdaLayerNorm and
  the three per-axis residual heads;
- 431 coarse mesh vertices are initialized by copying each vertex's nearest
  template joint from the lifted pose (static gather indices precomputed
  from the template mesh);
- three CoevoBlocks run bidirectional joint↔vertex cross-attention with
  separate learned Q/K embeddings and per-stream AdaLayerNorm, then
  self-attention + FFN per stream, then project features back to 3D
  coordinate residuals;
- deliberate reference quirks preserved: every CoevoBlock consumes the
  ORIGINAL lifted joints (only the vertex stream chains through blocks,
  CoevoDecoder.py:235-237), and both cross-attentions read the PRE-update
  features of the other stream (simultaneous update, CoevoDecoder.py:183-184);
- a Conv1d(431→6890, k=3) over the coordinate axis upsamples the coarse
  vertices, and three Linear(2048→6890) heads add per-axis residuals from
  the ReLU'd GRU feature.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pmce_tpu.models.layers import (
    AdaBlock,
    AdaBlockParams,
    BiGRU,
    Conv1dParams,
    CrossAttentionBlock,
    CrossAttentionBlockParams,
    DenseParams,
)

_HIGHEST = jax.lax.Precision.HIGHEST


class CoevoBlock(nn.Module):
    """One co-evolution step between joint and vertex token streams."""

    num_joint: int
    num_vertx: int
    joint_dim: int = 64
    vertx_dim: int = 64
    joint_heads: int = 8
    vertx_heads: int = 2
    mlp_ratio: float = 4.0
    drop_path: float = 0.2
    dtype: Any = None
    fused: bool = False
    # Run the whole block as ONE kernel per clip (fused_coevo_block).
    # Measured SLOWER than fused-SA + XLA-CA on v5e at batch 256 (9.8k vs
    # 10.9k mid-frames/s: the per-clip grid under-fills the MXU), so off
    # by default; kept as a tested variant for future shapes.
    whole_block_kernel: bool = False

    @nn.compact
    def __call__(self, joint: jax.Array, vertx: jax.Array, cond: jax.Array,
                 deterministic: bool = True, return_params: bool = False):
        """joint: [B, J, 3]; vertx: [B, V, 3]; cond: [B, 2048].

        ``return_params=True`` declares the block's FULL parameter tree
        (identical names to the compute paths) and returns the packed
        weights + per-clip AdaLN stacks for the whole-chain kernel
        (ops/fused_coevo_chain.py) instead of computing.
        """
        init = nn.initializers.normal(1.0)
        joint_pos = self.param("joint_pos_embed", init,
                               (1, self.num_joint, self.joint_dim))
        vertx_pos = self.param("vertx_pos_embed", init,
                               (1, self.num_vertx, self.vertx_dim))
        j_Q = self.param("j_Q_embed", init,
                         (1, self.num_joint, self.joint_dim))
        v_Q = self.param("v_Q_embed", init,
                         (1, self.num_vertx, self.vertx_dim))
        v2j_K = self.param("v2j_K_embed", init,
                           (1, self.num_vertx, self.joint_dim))
        j2v_K = self.param("j2v_K_embed", init,
                           (1, self.num_joint, self.vertx_dim))

        if return_params:
            wjp, bjp = DenseParams(3, self.joint_dim, name="joint_proj")()
            wvp, bvp = DenseParams(3, self.vertx_dim, name="vertx_proj")()
            gammas, betas, params = self._kernel_pack(
                cond, joint_pos, vertx_pos, j_Q, v_Q, v2j_K, j2v_K)
            whj, bhj = DenseParams(self.joint_dim, 3,
                                   name="proj_joint_feat2coor")()
            whv, bhv = DenseParams(self.vertx_dim, 3,
                                   name="proj_vertx_feat2coor")()
            return (wjp, bjp, wvp, bvp, gammas, betas, params,
                    whj, bhj, whv, bhv)

        joint_feat = nn.Dense(self.joint_dim, dtype=self.dtype,
                              name="joint_proj")(joint)
        vertx_feat = nn.Dense(self.vertx_dim, dtype=self.dtype,
                              name="vertx_proj")(vertx)

        # Inference runs the ENTIRE block (pos/Q/K embeds, both
        # cross-attention+FFN blocks, both conditioned self-attention
        # blocks) as one Pallas kernel per clip — only the f32 coordinate
        # heads stay outside. Training (stochastic depth active) keeps the
        # modular path, whose SA blocks still use their own fused kernels.
        if (self.fused and self.whole_block_kernel and deterministic
                and self.joint_dim == self.vertx_dim):
            return self._fused_block(joint, vertx, joint_feat, vertx_feat,
                                     joint_pos, vertx_pos, j_Q, v_Q,
                                     v2j_K, j2v_K, cond)

        joint_feat = joint_feat + joint_pos
        vertx_feat = vertx_feat + vertx_pos

        # Simultaneous cross-attention update: both directions read the
        # PRE-update features of the other stream.
        v_as_j = nn.Dense(self.joint_dim, dtype=self.dtype,
                          name="proj_v2j_dim")(vertx_feat)
        j_as_v = nn.Dense(self.vertx_dim, dtype=self.dtype,
                          name="proj_j2v_dim")(joint_feat)
        joint_new = CrossAttentionBlock(
            q_dim=self.joint_dim, k_dim=self.joint_dim, v_dim=self.vertx_dim,
            num_heads=self.joint_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=True, drop_path=self.drop_path, dtype=self.dtype,
            fused=self.fused, name="joint_CA_FFN",
        )(joint_feat + j_Q, v_as_j + v2j_K, vertx_feat, cond, deterministic)
        vertx_new = CrossAttentionBlock(
            q_dim=self.vertx_dim, k_dim=self.vertx_dim, v_dim=self.joint_dim,
            num_heads=self.vertx_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=True, drop_path=self.drop_path, dtype=self.dtype,
            fused=self.fused, name="vertx_CA_FFN",
        )(vertx_feat + v_Q, j_as_v + j2v_K, joint_feat, cond, deterministic)

        joint_new = AdaBlock(
            self.joint_dim, self.joint_heads, self.mlp_ratio, qkv_bias=True,
            drop_path=self.drop_path, dtype=self.dtype, fused=self.fused,
            name="joint_SA_FFN",
        )(joint_new, cond, deterministic)
        vertx_new = AdaBlock(
            self.vertx_dim, self.vertx_heads, self.mlp_ratio, qkv_bias=True,
            drop_path=self.drop_path, dtype=self.dtype, fused=self.fused,
            name="vertx_SA_FFN",
        )(vertx_new, cond, deterministic)

        # Coordinate heads ALWAYS f32: outputs are meter-scale positions
        # where bf16 quantizes at ~0.4% of magnitude (millimeters); the
        # dim→3 projections are negligible FLOPs.
        joint_out = (
            nn.Dense(3, dtype=jnp.float32,
                     name="proj_joint_feat2coor")(joint_new)
            + joint[..., :3].astype(jnp.float32)
        )
        vertx_out = (
            nn.Dense(3, dtype=jnp.float32,
                     name="proj_vertx_feat2coor")(vertx_new)
            + vertx[..., :3].astype(jnp.float32)
        )
        return joint_out, vertx_out

    def _kernel_pack(self, cond, joint_pos, vertx_pos, j_Q, v_Q,
                     v2j_K, j2v_K):
        """Declare the CA/SA weight holders (tree identical to the modular
        path) and return the per-clip AdaLN stacks + the 14-tuple the
        fused kernels consume (ops.fused_attention._COEVO_SLOTS order)."""
        cd = cond.shape[-1]
        caj_gb, caj_w = CrossAttentionBlockParams(
            self.joint_dim, self.joint_dim, self.vertx_dim, cd,
            self.mlp_ratio, qkv_bias=True, dtype=self.dtype,
            name="joint_CA_FFN")(cond)
        cav_gb, cav_w = CrossAttentionBlockParams(
            self.vertx_dim, self.vertx_dim, self.joint_dim, cd,
            self.mlp_ratio, qkv_bias=True, dtype=self.dtype,
            name="vertx_CA_FFN")(cond)
        saj_gb, saj_w = AdaBlockParams(
            self.joint_dim, cd, self.mlp_ratio, qkv_bias=True,
            dtype=self.dtype, name="joint_SA_FFN")(cond)
        sav_gb, sav_w = AdaBlockParams(
            self.vertx_dim, cd, self.mlp_ratio, qkv_bias=True,
            dtype=self.dtype, name="vertx_SA_FFN")(cond)
        wv2j, bv2j = DenseParams(self.vertx_dim, self.joint_dim,
                                 name="proj_v2j_dim")()
        wj2v, bj2v = DenseParams(self.joint_dim, self.vertx_dim,
                                 name="proj_j2v_dim")()

        gammas = jnp.stack(
            [caj_gb[0], caj_gb[2], caj_gb[4], caj_gb[6],
             cav_gb[0], cav_gb[2], cav_gb[4], cav_gb[6],
             saj_gb[0], saj_gb[2], sav_gb[0], sav_gb[2]], axis=1)
        betas = jnp.stack(
            [caj_gb[1], caj_gb[3], caj_gb[5], caj_gb[7],
             cav_gb[1], cav_gb[3], cav_gb[5], cav_gb[7],
             saj_gb[1], saj_gb[3], sav_gb[1], sav_gb[3]], axis=1)

        params = (joint_pos[0], vertx_pos[0], j_Q[0], v_Q[0],
                  v2j_K[0], j2v_K[0], wv2j, bv2j, wj2v, bj2v,
                  caj_w, cav_w, saj_w, sav_w)
        return gammas, betas, params

    def _fused_block(self, joint, vertx, joint_feat, vertx_feat,
                     joint_pos, vertx_pos, j_Q, v_Q, v2j_K, j2v_K, cond):
        """Inference path: one fused_coevo_block kernel call per clip.

        Parameters are declared through the unapplied holders so the tree
        is IDENTICAL to the modular path (checkpoints interchangeable)."""
        from pmce_tpu.ops.fused_attention import fused_coevo_block

        dt = self.dtype or joint_feat.dtype
        gammas, betas, params = self._kernel_pack(
            cond, joint_pos, vertx_pos, j_Q, v_Q, v2j_K, j2v_K)
        jf_out, vf_out = fused_coevo_block(
            joint_feat.astype(dt), vertx_feat.astype(dt), gammas, betas,
            params, self.joint_heads, self.vertx_heads)

        joint_out = (
            nn.Dense(3, dtype=jnp.float32,
                     name="proj_joint_feat2coor")(jf_out)
            + joint[..., :3].astype(jnp.float32))
        vertx_out = (
            nn.Dense(3, dtype=jnp.float32,
                     name="proj_vertx_feat2coor")(vf_out)
            + vertx[..., :3].astype(jnp.float32))
        return joint_out, vertx_out


class CoevolutionDecoder(nn.Module):
    """Pose + image features → full-resolution mesh (meters).

    Args (static config):
      num_joint: lifted-pose joint count (17 h36m / 19 coco).
      num_vertx: coarse mesh size (431).
      num_verts_full: output mesh size (6890).
      vj_relation: length-``num_vertx`` tuple mapping each coarse vertex to
        its nearest template joint (precomputed from the template mesh and
        the H36M joint regressor, reference CoevoDecoder.py:206-209).
    """

    num_joint: int
    vj_relation: tuple
    num_vertx: int = 431
    num_verts_full: int = 6890
    joint_dim: int = 64
    vertx_dim: int = 64
    num_blocks: int = 3
    gru_hidden: int = 1024
    seqlen: int = 16
    dtype: Any = None
    fused_attn: bool = False
    whole_block_kernel: bool = False

    @nn.compact
    def __call__(self, joints: jax.Array, img_feats: jax.Array,
                 deterministic: bool = True):
        """joints: [B, J, 3] (meters); img_feats: [B, T, 2048].

        Returns:
          (evo_pose [B, J, 3], mesh [B, 6890, 3]) in meters.
        """
        B = joints.shape[0]

        # Temporal aggregation: BiGRU over T, mid-frame output only — the
        # final GRU layer scans just the steps that output depends on
        # (bit-identical to slicing the full sequence; see BiGRU.__call__).
        cond = BiGRU(self.gru_hidden, num_layers=2, dtype=self.dtype,
                     name="gru_cur")(jnp.swapaxes(img_feats, 0, 1),
                                     mid_index=self.seqlen // 2)  # [B, 2048]

        # Initialize each coarse vertex at its nearest template joint.
        rel = jnp.asarray(self.vj_relation, jnp.int32)
        vertx = joints[:, rel, :3]                    # [B, V, 3]

        # Every block re-consumes the ORIGINAL lifted joints (reference
        # quirk); only vertices evolve through the chain.
        blocks = [CoevoBlock(
            self.num_joint, self.num_vertx, self.joint_dim,
            self.vertx_dim, dtype=self.dtype, fused=self.fused_attn,
            whole_block_kernel=self.whole_block_kernel,
            name=f"coevoblock{i + 1}") for i in range(self.num_blocks)]

        if (self.fused_attn and deterministic
                and not self.whole_block_kernel
                and self.joint_dim == self.vertx_dim):
            # Inference: the WHOLE three-block chain + coordinate heads in
            # one Pallas kernel (ops/fused_coevo_chain.py) — streams stay
            # VMEM-resident across all blocks, G clips per grid step.
            from pmce_tpu.ops.fused_coevo_chain import fused_coevo_chain

            dt = self.dtype or joints.dtype
            packs = [b(joints, vertx, cond, True, return_params=True)
                     for b in blocks]
            gammas = jnp.stack([p[4] for p in packs], axis=1)
            betas = jnp.stack([p[5] for p in packs], axis=1)
            chain_blocks = tuple(
                (p[0].astype(dt), p[1], p[2].astype(dt), p[3], p[6],
                 p[7], p[8], p[9], p[10]) for p in packs)
            evo_pose, vertx = fused_coevo_chain(
                joints.astype(jnp.float32), vertx.astype(jnp.float32),
                gammas, betas, chain_blocks,
                blocks[0].joint_heads, blocks[0].vertx_heads)
        else:
            evo_pose = joints
            for blk in blocks:
                evo_pose, vertx = blk(joints, vertx, cond, deterministic)

        # Conv1d(431→6890, k=3, pad 1) over the coordinate axis: treat the
        # 431 vertices as channels and x/y/z as the length-3 spatial dim.
        # f32: it maps meter-scale coordinates to meter-scale coordinates.
        # Expressed as ONE [3B, 3·431] @ [3·431, 6890] GEMM instead of an
        # XLA conv: the length-3 windowed-conv emitter ran at ~18 TFLOP/s
        # device-measured (the pathological batched-matmul class
        # ops/fused_coevo_chain.py documents); this is the identical
        # contraction — out[i] = Σ_k x_pad[i+k]·W[k] — as a clean MXU tile.
        wk, wb = Conv1dParams(3, self.num_vertx, self.num_verts_full,
                              name="upsample_conv")()
        vf = vertx.astype(jnp.float32)
        x0, x1, x2 = vf[:, :, 0], vf[:, :, 1], vf[:, :, 2]  # [B, 431]
        z = jnp.zeros_like(x0)
        x3 = jnp.stack([
            jnp.concatenate([z, x0, x1], axis=-1),   # out pos 0: (pad,x,y)
            jnp.concatenate([x0, x1, x2], axis=-1),  # out pos 1
            jnp.concatenate([x1, x2, z], axis=-1),   # out pos 2: (y,z,pad)
        ], axis=1)                                   # [B, 3, 3·431]
        wf = wk.reshape(3 * self.num_vertx, self.num_verts_full)
        mesh = (x3.reshape(B * 3, -1) @ wf + wb).reshape(
            B, 3, self.num_verts_full).transpose(0, 2, 1)  # [B, 6890, 3]

        # Per-axis residuals from the ReLU'd GRU mid feature. The matmuls
        # run in the compute dtype (they are the decoder's biggest dense
        # layers) but accumulate and emit f32 — the outputs are meter-scale
        # coordinates, where a bf16 output cast costs millimeters.
        feat = jax.nn.relu(cond)
        dt = self.dtype or feat.dtype
        res_axes = []
        for i in range(3):
            w, b = DenseParams(feat.shape[-1], self.num_verts_full,
                               name=f"linear_cur{i + 1}")()
            res_axes.append(
                jnp.dot(feat.astype(dt), w.astype(dt),
                        preferred_element_type=jnp.float32) + b)
        res = jnp.stack(res_axes, axis=-1)            # [B, 6890, 3]
        out = (mesh + res).astype(jnp.float32)
        return evo_pose.astype(jnp.float32), out
