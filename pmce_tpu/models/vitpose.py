"""ViTPose: top-down 2D keypoint estimation with a plain ViT backbone.

Architecture parity target: the mmpose ViTPose-Huge top-down heatmap config
the reference demo uses (/root/reference/pose_detector/
ViTPose_huge_coco_256x192.py — ViT-Huge patch-16 backbone, classic
2-deconv heatmap head, 256×192 input, 17 COCO keypoints, UDP-style
decoding by argmax + quarter-pixel offset).

The reference runs it through mmpose ONE frame × ONE person per call
(/root/reference/main/run_demo.py:273-284) — the demo's true bottleneck.
Here inference is a single jitted batched call over all (frame, person)
crops, which is where the ≥5× end-to-end speedup headroom comes from.

``ViTPoseConfig.huge()`` matches the reference deployment;
``ViTPoseConfig.tiny()`` is the test-size variant.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pmce_tpu.models.layers import Block


@dataclasses.dataclass(frozen=True)
class ViTPoseConfig:
    img_size: tuple = (256, 192)      # (H, W)
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_keypoints: int = 17
    deconv_channels: int = 256
    # Compute dtype for the ViT trunk (params stay f32). The deconv head
    # and final conv always run f32: heatmap values feed an argmax whose
    # ties are decided at ~1e-3 — bf16 there visibly moves keypoints.
    dtype: Any = None

    @classmethod
    def huge(cls, dtype: Any = None) -> "ViTPoseConfig":
        return cls(dtype=dtype)

    @classmethod
    def tiny(cls, dtype: Any = None) -> "ViTPoseConfig":
        return cls(embed_dim=64, depth=2, num_heads=2, dtype=dtype)

    @property
    def grid(self) -> tuple:
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)


class ViTPose(nn.Module):
    cfg: ViTPoseConfig

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: [N, 3, H, W] normalized crops → heatmaps [N, K, H/4, W/4]."""
        c = self.cfg
        if x.shape[1] == 3:
            x = jnp.transpose(x, (0, 2, 3, 1))
        gh, gw = c.grid

        # Patch embed.
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=c.patch_size, dtype=c.dtype,
                    name="patch_embed")(x)
        x = x.reshape(x.shape[0], gh * gw, c.embed_dim)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, gh * gw, c.embed_dim))
        x = x + pos.astype(x.dtype)

        for i in range(c.depth):
            x = Block(c.embed_dim, c.num_heads, c.mlp_ratio, qkv_bias=True,
                      dtype=c.dtype,
                      name=f"block{i}")(x, deterministic=not train)
        x = x.astype(jnp.float32)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)

        # Classic heatmap head: 2 × (deconv ×2, BN, ReLU) + 1×1 conv.
        # Always f32 (see ViTPoseConfig.dtype note).
        x = x.reshape(x.shape[0], gh, gw, c.embed_dim)
        for i in range(2):
            # torch ConvTranspose2d(k=4, s=2, p=1) semantics: grad-of-conv
            # (transpose_kernel=True; SAME ≡ the (1,1) torch padding for
            # k=4/s=2). HIGHEST precision: the default conv precision costs
            # ~1e-3 absolute error, visible in heatmap argmax ties.
            x = nn.ConvTranspose(c.deconv_channels, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 transpose_kernel=True,
                                 precision=jax.lax.Precision.HIGHEST,
                                 name=f"deconv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"deconv_bn{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(c.num_keypoints, (1, 1), name="final")(x)
        return jnp.transpose(x, (0, 3, 1, 2))            # [N, K, h, w]


@jax.jit
def decode_heatmaps(heatmaps: jax.Array) -> tuple:
    """Heatmaps → (keypoints [N, K, 2] in heatmap pixels, scores [N, K]).

    Argmax with the classic quarter-pixel offset toward the second-highest
    neighbor (mmpose 'default' decoding).
    """
    N, K, h, w = heatmaps.shape
    flat = heatmaps.reshape(N, K, h * w)
    idx = jnp.argmax(flat, axis=-1)
    scores = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)

    # Quarter-offset along the gradient sign at the peak.
    def grad_at(hm, yy, xx, dy, dx):
        y1 = jnp.clip(yy + dy, 0, h - 1).astype(jnp.int32)
        x1 = jnp.clip(xx + dx, 0, w - 1).astype(jnp.int32)
        y0 = jnp.clip(yy - dy, 0, h - 1).astype(jnp.int32)
        x0 = jnp.clip(xx - dx, 0, w - 1).astype(jnp.int32)
        return hm[y1, x1] - hm[y0, x0]

    def per_kp(hm, yy, xx):
        gx = grad_at(hm, yy.astype(jnp.int32), xx.astype(jnp.int32), 0, 1)
        gy = grad_at(hm, yy.astype(jnp.int32), xx.astype(jnp.int32), 1, 0)
        # mmpose 'default' applies the offset only at INTERIOR peaks
        # (1 < px < W-1 and 1 < py < H-1): border peaks keep their
        # integer coordinate — an unconditional offset with clipped
        # neighbors can even go negative (peak at x=0, downhill right).
        interior = ((xx > 1.0) & (xx < w - 1.0)
                    & (yy > 1.0) & (yy < h - 1.0))
        off = jnp.where(interior, 0.25, 0.0)
        return (xx + off * jnp.sign(gx), yy + off * jnp.sign(gy))

    per_img = jax.vmap(jax.vmap(per_kp))
    xs2, ys2 = per_img(heatmaps, ys, xs)
    kps = jnp.stack([xs2, ys2], axis=-1)
    return kps, scores


def heatmap_to_image_coords(kps_hm: np.ndarray, bboxes: np.ndarray,
                            heatmap_size: tuple,
                            crop_size: tuple) -> np.ndarray:
    """Heatmap-pixel keypoints → full-frame pixel coordinates.

    Args:
      kps_hm: [N, K, 2]; bboxes: [N, 4] (x, y, w, h) of the crops;
      heatmap_size: (h, w); crop_size: (H, W).
    """
    hy, hx = heatmap_size
    cy, cx = crop_size
    scale = np.array([cx / hx, cy / hy], np.float32)
    kps_crop = kps_hm * scale                             # crop pixels
    wh = bboxes[:, None, 2:4]
    xy = bboxes[:, None, 0:2]
    return xy + kps_crop * wh / np.array([cx, cy], np.float32)
