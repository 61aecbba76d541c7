"""Fused multi-head self-attention Pallas kernel for SHORT token sequences.

Motivation (measured on TPU v5e, see docs/PERF.md): PMCE's transformers
attend over tiny token sets (J=19 joints / T=16 frames / V=431 coarse
vertices — reference /root/reference/lib/models/PoseEstimation.py:54-57 and
CoevoDecoder.py:89-131). Under plain XLA the per-head [B·T, H, N, dh]
layout is materialized through HBM (the qkv transpose alone costs more than
the matmuls) and each [N, dh] micro-matmul occupies a full MXU pass, so the
attention path runs at <1% MXU utilization and dominates the forward wall
clock (26 of 44 ms at batch 256).

This kernel instead packs G clips into one grid step and never leaves VMEM:

    x[R=G·N, C] ──qkv matmul──► qkv[R, 3C]
      per head h: scores[R, R] = q_h @ k_hᵀ  (block-diagonal masked)
                  p = softmax(scores)        (f32, masked)
                  o_h[R, dh] = p @ v_h
    out[R, C] = concat_h(o_h) @ w_proj + b_proj

The [R, R] score matrix computes G× redundant cross-clip products, but R is
MXU-tile sized (e.g. 304 for G=16, N=19) so the redundant FLOPs are ~free
compared to the HBM round-trips they replace. HBM traffic per layer drops
from ~5 tensor materializations to exactly one read + one write of x.

Training still works: a ``jax.custom_vjp`` recomputes the backward pass
through a numerically-equivalent pure-XLA reference implementation
(flash-attention-style recompute — no residuals besides the inputs).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pick_group(num_clips: int, tokens: int) -> int:
    """Clips per grid step: R = G·N must be sublane-aligned (multiple of 16
    covers both f32 and bf16 tiling), targeting R ≈ 256-512 rows."""
    step = 16 // math.gcd(tokens, 16)
    g = step
    while (g + step) * tokens <= 512:
        g += step
    return g


def _mhsa_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, out_ref,
                 *, num_heads: int, tokens: int):
    R, C = x_ref.shape
    dh = C // num_heads
    scale = 1.0 / math.sqrt(dh)

    x = x_ref[:]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:]).astype(x.dtype)          # [R, 3C]

    # Block-diagonal clip mask: row r may attend to col c iff same clip.
    row_clip = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // tokens
    col_clip = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // tokens
    neg = jnp.where(row_clip == col_clip, 0.0, _NEG_INF)  # [R, R] f32

    outs = []
    for h in range(num_heads):
        q = jax.lax.slice(qkv, (0, h * dh), (R, (h + 1) * dh))
        k = jax.lax.slice(qkv, (0, C + h * dh), (R, C + (h + 1) * dh))
        v = jax.lax.slice(qkv, (0, 2 * C + h * dh), (R, 2 * C + (h + 1) * dh))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + neg
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(x.dtype), v,
                            preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1).astype(x.dtype)   # [R, C]
    out = jnp.dot(o, wproj_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (out + bproj_ref[:]).astype(out_ref.dtype)


def mhsa_reference(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                   wproj: jax.Array, bproj: jax.Array,
                   num_heads: int) -> jax.Array:
    """Pure-XLA reference with identical math (used for VJP + tests)."""
    B, N, C = x.shape
    dh = C // num_heads
    dtype = x.dtype
    qkv = (x @ wqkv.astype(dtype)) + bqkv.astype(dtype)
    qkv = qkv.reshape(B, N, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(dh)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
    return (o @ wproj.astype(dtype)) + bproj.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mhsa(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
               wproj: jax.Array, bproj: jax.Array,
               num_heads: int) -> jax.Array:
    """Fused short-sequence MHSA.

    Args:
      x: [B, N, C] token features (N small: ≤ ~512 rows per block).
      wqkv: [C, 3C] fused qkv projection (q | k | v along the last axis).
      bqkv: [3C]; wproj: [C, C]; bproj: [C].
      num_heads: head count (C divisible by it).

    Returns:
      [B, N, C] attention output (same dtype as x).
    """
    return _fused_mhsa_impl(x, wqkv, bqkv, wproj, bproj, num_heads)


def _fused_mhsa_impl(x, wqkv, bqkv, wproj, bproj, num_heads):
    B, N, C = x.shape
    dtype = x.dtype
    if N > 64:
        # Long sequences (e.g. the 431-vertex stream) don't fit the
        # G-clips-per-block design; XLA's native path is fine there.
        return mhsa_reference(x, wqkv, bqkv, wproj, bproj, num_heads)
    G = _pick_group(B, N)
    pad = (-B) % G
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, N, C), dtype)], axis=0)
    Bp = B + pad
    R = G * N

    x2 = x.reshape(Bp * N, C)
    wqkv = wqkv.astype(dtype)
    wproj = wproj.astype(dtype)
    bqkv = bqkv.astype(jnp.float32).reshape(1, 3 * C)
    bproj = bproj.astype(jnp.float32).reshape(1, C)

    flops = Bp // G * (2 * R * C * 3 * C + num_heads * 2 * 2 * R * R *
                       (C // num_heads) + 2 * R * C * C)
    out = pl.pallas_call(
        functools.partial(_mhsa_kernel, num_heads=num_heads, tokens=N),
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((R, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * N, C), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * Bp * N * C * x2.dtype.itemsize,
            transcendentals=Bp // G * num_heads * R * R,
        ),
        # CPU (the virtual-mesh test backend) runs the kernel interpreted.
        interpret=jax.default_backend() != "tpu",
    )(x2, wqkv, bqkv, wproj, bproj)
    out = out.reshape(Bp, N, C)
    return out[:B] if pad else out


def _fused_mhsa_fwd(x, wqkv, bqkv, wproj, bproj, num_heads):
    return (_fused_mhsa_impl(x, wqkv, bqkv, wproj, bproj, num_heads),
            (x, wqkv, bqkv, wproj, bproj))


def _fused_mhsa_bwd(num_heads, res, g):
    # Flash-style recompute through the XLA reference path; forward values
    # match the kernel to bf16 tolerance, which is ample for gradients.
    _, vjp = jax.vjp(
        lambda *a: mhsa_reference(*a, num_heads=num_heads), *res)
    return vjp(g)


fused_mhsa.defvjp(_fused_mhsa_fwd, _fused_mhsa_bwd)
