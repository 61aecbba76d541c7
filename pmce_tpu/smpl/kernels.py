"""Pallas TPU kernels for the SMPL hot path.

``fused_skinning`` replaces the XLA two-step LBS application (blend the
per-joint transforms into per-vertex transforms, then apply them) with one
kernel that never materializes the [B, V, 12] blended-transform tensor in
HBM: each vertex tile loads its skinning weights once, contracts them with
the per-batch joint transforms on the MXU, and applies the result on the VPU
in VMEM.

Layout: vertices are processed as [3, V] (coordinates in sublanes, vertices
in lanes) so the 128-wide lane dimension runs over vertices — the natural
TPU tiling — instead of a 3-wide coordinate axis.

Reference equivalent (per-sample torch on CPU):
/root/reference/smplpytorch/smplpytorch/pytorch/smpl_layer.py:134-144.

On non-TPU backends (unit tests run on CPU) the kernel runs in interpreter
mode automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _skinning_kernel(a_ref, w_ref, v_ref, out_ref):
    """One (batch, vertex-tile) program.

    a_ref: [1, 12, J] this batch element's transforms ([:3, :4] row-major,
           transposed so the joint axis contracts on the MXU).
    w_ref: [J, TILE_V] skinning weights for this vertex tile.
    v_ref: [1, 3, TILE_V] posed vertices.
    out_ref: [1, 3, TILE_V].
    """
    # Blend transforms on the MXU: [12, J] @ [J, TILE_V] → [12, TILE_V].
    # Full f32 MXU passes: default bf16 precision costs ~5 mm on the mesh.
    t = jnp.dot(a_ref[0], w_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    vx = v_ref[0, 0:1, :]
    vy = v_ref[0, 1:2, :]
    vz = v_ref[0, 2:3, :]
    rows = []
    for m in range(3):
        rows.append(
            t[4 * m + 0 : 4 * m + 1, :] * vx
            + t[4 * m + 1 : 4 * m + 2, :] * vy
            + t[4 * m + 2 : 4 * m + 3, :] * vz
            + t[4 * m + 3 : 4 * m + 4, :]
        )
    out_ref[0] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("tile_v", "interpret"))
def fused_skinning(v_posed: jax.Array, A_skin: jax.Array,
                   lbs_weights: jax.Array, tile_v: int = 1024,
                   interpret: bool | None = None) -> jax.Array:
    """Apply linear blend skinning with a fused Pallas kernel.

    Args:
      v_posed: [B, V, 3] posed (pre-skinning) vertices.
      A_skin: [B, J, 4, 4] inverse-bind-corrected joint transforms.
      lbs_weights: [V, J].
      tile_v: vertex tile size per program (multiple of 128).
      interpret: force interpreter mode; default: interpret off-TPU.

    Returns:
      [B, V, 3] skinned vertices (float32).
    """
    B, V, _ = v_posed.shape
    J = A_skin.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pad = (-V) % tile_v
    Vp = V + pad

    # [B, 3, Vp] / [J, Vp] layouts: lane dim runs over vertices.
    v_t = jnp.swapaxes(v_posed.astype(jnp.float32), 1, 2)
    w_t = jnp.swapaxes(lbs_weights.astype(jnp.float32), 0, 1)
    if pad:
        v_t = jnp.pad(v_t, ((0, 0), (0, 0), (0, pad)))
        w_t = jnp.pad(w_t, ((0, 0), (0, pad)))

    a_flat = jnp.swapaxes(
        A_skin[:, :, :3, :].reshape(B, J, 12).astype(jnp.float32), 1, 2
    )  # [B, 12, J]

    out = pl.pallas_call(
        _skinning_kernel,
        grid=(B, Vp // tile_v),
        in_specs=[
            pl.BlockSpec((1, 12, J), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, tile_v), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_v), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, tile_v), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, Vp), jnp.float32),
        interpret=interpret,
    )(a_flat, w_t, v_t)
    return jnp.swapaxes(out[:, :, :V], 1, 2)
