"""Stage-1 spatio-temporal 2D→3D pose lifter ("PoseLifter").

Architecture parity target: the reference "GraphormerNet"
(/root/reference/lib/models/PoseEstimation.py:31-120):

- per-frame joint embedding Linear(2→C) plus a per-frame image-feature bias
  Linear(2048→C) broadcast over all joint tokens;
- learned spatial (J tokens) and temporal (T tokens) position embeddings;
- ``depth`` interleaved (spatial-attention over J, temporal-attention over T)
  transformer block pairs with SHARED post-block norms ``norm_s``/``norm_t``;
- regression head LayerNorm(eps 1e-5) + Linear(C→3);
- frame fusion: a 1×1 Conv2d over the T axis — i.e. a learned linear
  combination of the T per-frame pose maps — producing the mid-clip pose.

Everything is statically shaped ([B, T=16, J, 2] in, [B, J, 3] out, values
in millimeters like the reference) and reshapes between (B·T, J, C) and
(B·J, T, C) token layouts are pure ``reshape``/``transpose`` — free under
XLA.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pmce_tpu.models.layers import Block, LayerNormParams


class PoseLifter(nn.Module):
    """Factorized spatial/temporal transformer lifting 2D pose sequences."""

    num_joints: int = 17
    num_frames: int = 16
    embed_dim: int = 256
    depth: int = 3
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    img_feat_dim: int = 2048
    dtype: Any = None
    fused_attn: bool = False

    def setup(self):
        C = self.embed_dim
        self.joint_embed = nn.Dense(C, dtype=self.dtype, name="joint_embed")
        self.imgfeat_embed = nn.Dense(C, dtype=self.dtype,
                                      name="imgfeat_embed")
        self.spatial_pos_embed = self.param(
            "spatial_pos_embed", nn.initializers.zeros,
            (1, self.num_joints, C))
        self.temporal_pos_embed = self.param(
            "temporal_pos_embed", nn.initializers.zeros,
            (1, self.num_frames, C))
        self.pos_drop = nn.Dropout(self.drop_rate)

        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        self.spatial_blocks = [
            Block(C, self.num_heads, self.mlp_ratio, self.qkv_bias,
                  self.drop_rate, self.attn_drop_rate, float(dpr[i]),
                  dtype=self.dtype, fused=self.fused_attn,
                  name=f"spatial_block{i}")
            for i in range(self.depth)
        ]
        self.temporal_blocks = [
            Block(C, self.num_heads, self.mlp_ratio, self.qkv_bias,
                  self.drop_rate, self.attn_drop_rate, float(dpr[i]),
                  dtype=self.dtype, fused=self.fused_attn,
                  name=f"temporal_block{i}")
            for i in range(self.depth)
        ]
        # Shared across all depths, applied after every block — a deliberate
        # quirk of the reference (PoseEstimation.py:59-60,85,92,104,107).
        # In fused mode the params are held unapplied (same tree) and the
        # norm runs inside each block's Pallas kernel as its post-norm.
        if self.fused_attn:
            self.norm_s_params = LayerNormParams(C, name="norm_s")
            self.norm_t_params = LayerNormParams(C, name="norm_t")
        else:
            self.norm_s = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       name="norm_s")
            self.norm_t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                       name="norm_t")

        # Regression head: torch's default LayerNorm eps (1e-5) here.
        # ALWAYS f32: outputs are millimeter-scale coordinates (|v|~1e3),
        # where bf16's 8-bit mantissa quantizes at ~4 mm — the head is a
        # C→3 projection, so full precision costs nothing.
        self.head_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                      name="head_norm")
        self.head_proj = nn.Dense(3, dtype=jnp.float32, name="head_proj")
        # Frame fusion — Conv2d(T→1, k=1) ≡ a [T] weight vector + bias.
        bound = 1.0 / float(np.sqrt(self.num_frames))
        self.fusion_weight = self.param(
            "fusion_weight",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-bound, maxval=bound),
            (self.num_frames,))
        self.fusion_bias = self.param(
            "fusion_bias", nn.initializers.zeros, (1,))

    def __call__(self, pose2d: jax.Array, img_feat: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """Lift a clip of 2D poses to the mid-frame 3D pose.

        Args:
          pose2d: [B, T, J, 2] width-normalized 2D joints.
          img_feat: [B, T, 2048] per-frame image features.
          deterministic: disables dropout / stochastic depth.

        Returns:
          [B, J, 3] mid-frame 3D pose (millimeters).
        """
        B, T, J, _ = pose2d.shape
        C = self.embed_dim

        if self.fused_attn:
            norm_s = self.norm_s_params()
            norm_t = self.norm_t_params()
            apply_s = apply_t = lambda x: x  # fused into the block kernel
        else:
            norm_s, norm_t = None, None
            apply_s, apply_t = self.norm_s, self.norm_t

        x = self.joint_embed(pose2d)                       # [B,T,J,C]
        x = x + self.imgfeat_embed(img_feat)[:, :, None, :]
        x = x + self.spatial_pos_embed[None]
        x = self.pos_drop(x, deterministic=deterministic)

        # bf16-only: the trunk holds all 6 blocks' weights in VMEM for the
        # whole grid (6.3 MB bf16; the f32 set plus masks overflows the
        # ~16 MB budget — measured OOM on v5e).
        if (self.fused_attn and deterministic
                and self.dtype == jnp.bfloat16):
            # Whole trunk — all depth×(spatial, temporal) blocks + the
            # shared norms + the temporal pos-embed — as ONE kernel per
            # clip: both attention patterns become static masks over the
            # clip's [T·J, C] token block (ops/fused_attention.py).
            from pmce_tpu.ops.fused_attention import fused_lifter_trunk

            blocks = []
            for i in range(self.depth):
                blocks.append(self.spatial_blocks[i](
                    x, True, None, return_params=True))
                blocks.append(self.temporal_blocks[i](
                    x, True, None, return_params=True))
            # The pos-embed adds above promote x to f32 (f32 params):
            # re-enter the compute dtype before the kernel.
            x = fused_lifter_trunk(
                x.astype(self.dtype).reshape(B, T * J, C), tuple(blocks),
                norm_s, norm_t, self.temporal_pos_embed[0], T, J,
                self.depth, self.num_heads)
            x = x.reshape(B, T, J, C)
            x = self.head_proj(self.head_norm(x.astype(jnp.float32)))
            out = jnp.einsum("t,btjc->bjc", self.fusion_weight, x,
                             precision=jax.lax.Precision.HIGHEST)
            return (out + self.fusion_bias[0]).astype(jnp.float32)

        # --- head pair (block 0): spatial then temporal ---
        x = x.reshape(B * T, J, C)
        x = self.spatial_blocks[0](x, deterministic, post_norm=norm_s)
        x = apply_s(x)

        x = x.reshape(B, T, J, C).transpose(0, 2, 1, 3).reshape(B * J, T, C)
        x = x + self.temporal_pos_embed
        x = self.pos_drop(x, deterministic=deterministic)
        x = self.temporal_blocks[0](x, deterministic, post_norm=norm_t)
        x = apply_t(x)

        # --- remaining pairs ---
        for i in range(1, self.depth):
            x = x.reshape(B, J, T, C).transpose(0, 2, 1, 3).reshape(B * T, J, C)
            x = self.spatial_blocks[i](x, deterministic, post_norm=norm_s)
            x = apply_s(x)
            x = x.reshape(B, T, J, C).transpose(0, 2, 1, 3).reshape(B * J, T, C)
            x = self.temporal_blocks[i](x, deterministic, post_norm=norm_t)
            x = apply_t(x)

        x = x.reshape(B, J, T, C).transpose(0, 2, 1, 3)    # [B,T,J,C]
        x = self.head_proj(self.head_norm(x.astype(jnp.float32)))
        out = jnp.einsum("t,btjc->bjc", self.fusion_weight, x,
                         precision=jax.lax.Precision.HIGHEST)
        return (out + self.fusion_bias[0]).astype(jnp.float32)
