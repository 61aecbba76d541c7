"""Fused multi-head self-attention Pallas kernel for SHORT token sequences.

Motivation (measured on TPU v5e, see README "Measured performance") —
PMCE's transformers
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


import os

# Row target per fused-kernel grid step. The [R, R] score buffer grows
# quadratically in R (redundant cross-clip products), but each grid step
# pays a fixed dispatch/pipeline cost — at batch 256 the lifter runs
# 6 kernels × (B·T/G) steps, and fatter steps win until the score buffer
# crowds VMEM. Overridable for probing (tools/probe_stages.py sweeps).
_TARGET_ROWS = int(os.environ.get("PMCE_TPU_FUSED_ROWS", "256"))  # measured
# on v5e: lifter fwd 15.2 ms @256 vs 16.2 @128 (batch 256, bf16).


def _pick_group(num_clips: int, tokens: int) -> int:
    """Clips per grid step: R = G·N must be sublane-aligned (multiple of 16
    covers both f32 and bf16 tiling), targeting R ≈ _TARGET_ROWS rows."""
    step = 16 // math.gcd(tokens, 16)
    g = step
    while g * tokens < _TARGET_ROWS:
        g += step
    # Never group more clips than the batch has (rounded up to alignment):
    # padding a tiny batch to a full group would compute G× redundant rows.
    needed = -(-num_clips // step) * step
    return min(g, max(needed, step))


def _ones_col(rows: int, dtype):
    """[rows, 8] with lane 0 = 1: the row-sum column for _av_rowsum."""
    return jnp.concatenate([jnp.ones((rows, 1), dtype),
                            jnp.zeros((rows, 7), dtype)], axis=1)


def _av_rowsum(p, v, ones):
    """(p @ v, row-sums of p) via ONE matmul: p @ [v | 1 | 0×7].

    The softmax row-sum rides the MXU on the AV matmul instead of a
    cross-lane VPU reduce over the [R, R] probability block (measured
    0.8 ms across the trunk kernel; the AV matmul class runs ~4× the
    score matmuls' effective rate, so widening N by 8 lanes is ~free).
    Returns (o [R, dh] f32, r [R, 1] f32 clamped ≥1e-30 — fully-masked
    padding rows would otherwise divide by zero; callers slice them off).
    """
    dh = v.shape[1]
    vx = jnp.concatenate([v, ones], axis=1)               # [Rk, dh+8]
    o_ext = jnp.dot(p, vx, preferred_element_type=jnp.float32)
    o = jax.lax.slice(o_ext, (0, 0), (o_ext.shape[0], dh))
    r = jnp.maximum(
        jax.lax.slice(o_ext, (0, dh), (o_ext.shape[0], dh + 1)), 1e-30)
    return o, r


def _merge_factor(num_heads: int, dh: int) -> int:
    """Heads per merged score/AV matmul group (bf16 path): the largest
    divisor of num_heads whose merged channel band m·dh fits one lane
    tile (128). 1 disables merging.

    Only SUB-SUBLANE heads (dh ≤ 16) merge: at dh = 32 the per-head loop
    already wins (trunk measured 8.75 ms vs 11.58 ms merged — the +25%
    MXU instructions of the widened AV outweigh the saved per-head op
    overhead), while at dh = 8 every per-head k/v slice is an 8-lane
    sub-tile extract whose relayout dominates."""
    if dh > 16:
        return 1
    m = 1
    for cand in (2, 4, 8):
        if num_heads % cand == 0 and cand * dh <= 128:
            m = cand
    return m


def _head_band_mask(m: int, rows_per_block: int, band_per_head: int, dtype):
    """[m·R, m·d] 0/1 mask: stacked-copy b keeps only head b's channels."""
    shape = (m * rows_per_block, m * band_per_head)
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (r // rows_per_block == c // band_per_head).astype(dtype)


def _tile_rows(a, m: int):
    """[R, N] → [m·R, N] (m stacked copies; sublane-aligned concat)."""
    return jnp.concatenate([a] * m, axis=0) if m > 1 else a


def _merged_heads(q_all, k_all, v_all, maskb, num_heads: int, m: int):
    """bf16 multi-head attention with m heads per score/AV matmul pair.

    q_all [Nq, C] (pre-scaled), k_all [Nk, C], v_all [Nk, Cv]; maskb
    either [1, Nk] (key-validity, broadcasts) or [Nq, Nk] (dense 0/1,
    tiled m× over the stacked rows). Returns f32 [Nq, Cv] normalized
    head outputs (pre-output-projection).

    Head h's score matmul contracts ONLY over its own dh channels, so
    stacking m copies of the group's q band along SUBLANES and zeroing,
    per copy, every other head's channels makes ONE [m·Nq, m·dh] ⊙
    [Nk, m·dh] dot compute all m heads' [Nq, Nk] score blocks — the
    zeroed channels contribute exact 0s, so every score (and the AV
    contraction, which runs over the same Nk rows in the same order) is
    BIT-IDENTICAL to the per-head loop. The win is structural: m× fewer
    MXU ops and, above all, no per-head 32-lane (or 8-lane) k/v slices,
    whose Mosaic relayouts dominate the measured per-head cost (trunk:
    onehead 5.38 ms vs base 8.75 ms at identical arithmetic volume).
    The softmax row-sum rides the widened AV matmul (_av_rowsum form);
    the m stacked output blocks fold back to [Nq, Cv] by masked sums —
    adding exact zeros, still bit-identical.
    """
    Nq, C = q_all.shape
    Nk, Cv = v_all.shape
    dh = C // num_heads
    dv = Cv // num_heads
    bandq = m * dh
    bandv = m * dv
    groups = num_heads // m
    qmask = _head_band_mask(m, Nq, dh, jnp.bfloat16)
    omask = _head_band_mask(m, Nq, dv, jnp.float32)
    maskm = maskb if maskb.shape[0] == 1 else _tile_rows(maskb, m)
    ones = _ones_col(Nk, jnp.bfloat16)
    outs = []
    for g in range(groups):
        qg = jax.lax.slice(q_all, (0, g * bandq), (Nq, (g + 1) * bandq))
        kg = jax.lax.slice(k_all, (0, g * bandq), (Nk, (g + 1) * bandq))
        vg = jax.lax.slice(v_all, (0, g * bandv), (Nk, (g + 1) * bandv))
        q_stack = _tile_rows(qg, m) * qmask                  # [m·Nq, bandq]
        s = jax.lax.dot_general(q_stack, kg, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(jnp.minimum(s.astype(jnp.bfloat16),
                                jnp.bfloat16(30.0))) * maskm  # [m·Nq, Nk]
        vx = jnp.concatenate([vg, ones], axis=1)             # [Nk, bandv+8]
        o_ext = jnp.dot(p, vx, preferred_element_type=jnp.float32)
        r = jnp.maximum(
            jax.lax.slice(o_ext, (0, bandv), (m * Nq, bandv + 1)), 1e-30)
        on = (jax.lax.slice(o_ext, (0, 0), (m * Nq, bandv))
              * jnp.reciprocal(r)) * omask                   # [m·Nq, bandv]
        og = jax.lax.slice(on, (0, 0), (Nq, bandv))
        for b in range(1, m):
            og = og + jax.lax.slice(on, (b * Nq, 0), ((b + 1) * Nq, bandv))
        outs.append(og)
    return jnp.concatenate(outs, axis=-1) if groups > 1 else outs[0]


def _attn_core(h, wqkv, bqkv, wproj, bproj, mask01, num_heads: int,
               fold_rowsum: bool = True):
    """Masked MHSA on a VMEM-resident [R, C] row block; returns f32 [R, C].

    The additive -inf mask is materialized ONCE per call and shared by
    all heads; with the masked max as stabilizer, exp's argument stays
    ≤ 0 (no overflow) and masked entries exp to exactly 0 — so the per-
    head softmax needs neither a clamp nor a multiplicative re-mask
    pass. Normalization is deferred to the [R, dh] head outputs.
    """
    R, C = h.shape
    dh = C // num_heads
    scale = 1.0 / math.sqrt(dh)

    qkvf = jnp.dot(h, wqkv, preferred_element_type=jnp.float32) + bqkv
    bf16 = h.dtype == jnp.bfloat16
    if bf16:
        # The 1/sqrt(dh) scale is applied HERE, in f32, before the single
        # bf16 rounding of q: `q_bf16 * bf16(scale)` double-rounds every
        # score AND biases the softmax temperature by bf16(scale)'s ~1e-4
        # relative error — measured 0.114 mm MPJPE drift vs the f32 model,
        # over the documented 0.1 mm serving tolerance (round-3 verdict).
        # The multiply fuses into the bias-add chain: zero extra passes.
        q_all = (jax.lax.slice(qkvf, (0, 0), (R, C))
                 * jnp.float32(scale)).astype(h.dtype)
        kv = jax.lax.slice(qkvf, (0, C), (R, 3 * C)).astype(h.dtype)
        maskb = mask01.astype(jnp.bfloat16)              # one [R, R] pass
        m = _merge_factor(num_heads, dh)
        if m > 1:
            k_all = jax.lax.slice(kv, (0, 0), (R, C))
            v_all = jax.lax.slice(kv, (0, C), (R, 2 * C))
            o = _merged_heads(q_all, k_all, v_all, maskb, num_heads,
                              m).astype(h.dtype)
            return jnp.dot(o, wproj,
                           preferred_element_type=jnp.float32) + bproj
        ones = _ones_col(R, jnp.bfloat16) if fold_rowsum else None
    else:
        qkv = qkvf.astype(h.dtype)                       # [R, 3C]
        logmask = (mask01 - 1.0) * jnp.float32(-_NEG_INF)  # [R, R]

    outs = []
    for hd in range(num_heads):
        if bf16:
            q = jax.lax.slice(q_all, (0, hd * dh), (R, (hd + 1) * dh))
            k = jax.lax.slice(kv, (0, hd * dh), (R, (hd + 1) * dh))
            v = jax.lax.slice(kv, (0, C + hd * dh), (R, C + (hd + 1) * dh))
        else:
            q = jax.lax.slice(qkv, (0, hd * dh), (R, (hd + 1) * dh))
            k = jax.lax.slice(qkv, (0, C + hd * dh), (R, C + (hd + 1) * dh))
            v = jax.lax.slice(qkv, (0, 2 * C + hd * dh),
                              (R, 2 * C + (hd + 1) * dh))
        if bf16:
            # bf16 serving path: every [R, R]-extent op is the enemy (the
            # score stage is VPU-bound, not MXU-bound), so the score
            # matrix is touched as few times as possible: the 1/sqrt(dh)
            # scale rides on the [R, dh] q slice, the f32 MXU output is
            # converted once (Mosaic requires 32-bit matmul acc),
            # everything after runs packed-bf16 2-per-lane with
            # MULTIPLICATIVE masking AFTER exp (exp(min(s, 30)) is
            # finite; masked entries become exactly 0), and the row-sum
            # rides the AV matmul (_av_rowsum). The static min-30 clamp
            # replaces the max-stabilizer: softmax ratios need no shift,
            # and exp's bf16 argument quantizes scores at ~0.2% — the
            # same order as the bf16 rounding of v itself.
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jnp.exp(jnp.minimum(s.astype(jnp.bfloat16),
                                    jnp.bfloat16(30.0))) * maskb
            if fold_rowsum:
                o, r = _av_rowsum(p, v, ones)
            else:
                r = jnp.maximum(
                    jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
                    1e-30)
                o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + logmask
            m = jnp.max(s, axis=-1, keepdims=True)       # true masked max
            p = jnp.exp(s - m).astype(h.dtype)
            # max(r, eps): fully-masked (padding) rows would divide by
            # zero; their outputs are sliced away by the caller.
            r = jnp.maximum(
                jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
                1e-30)
            o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        outs.append(o * jnp.reciprocal(r))        # deferred softmax, [R,1] recip
    o = jnp.concatenate(outs, axis=-1).astype(h.dtype)   # [R, C]
    return jnp.dot(o, wproj, preferred_element_type=jnp.float32) + bproj


def _attn_core_cliploop(h, wqkv, bqkv, wproj, bproj, mask01, num_heads: int,
                        G: int, fold_rowsum: bool = True):
    """MHSA on [G·N, C] stacked clip rows with PER-CLIP score buffers.

    Same math as :func:`_attn_core` per clip; the dense QKV / output
    projections batch over all G clips (fewer, fatter ops — the per-op
    issue overhead dominates these kernels), while the score/softmax/AV
    stage slices each clip's rows (sublane slices — N is a multiple of 8)
    so the [N, N] buffers never grow with G.
    ``mask01``: single-clip [N, N] mask.
    """
    R, C = h.shape
    N = R // G
    dh = C // num_heads
    scale = 1.0 / math.sqrt(dh)
    bf16 = h.dtype == jnp.bfloat16

    qkvf = jnp.dot(h, wqkv, preferred_element_type=jnp.float32) + bqkv
    if bf16:
        # f32 scale on q before the single bf16 rounding — see _attn_core.
        q_all = (jax.lax.slice(qkvf, (0, 0), (R, C))
                 * jnp.float32(scale)).astype(h.dtype)
        kv = jax.lax.slice(qkvf, (0, C), (R, 3 * C)).astype(h.dtype)
        maskb = mask01.astype(jnp.bfloat16)               # [N, N]
        m = _merge_factor(num_heads, dh)
        if m > 1:
            # Per-clip sublane slices of the stacked rows, merged heads
            # within each clip (see _merged_heads).
            k_all = jax.lax.slice(kv, (0, 0), (R, C))
            v_all = jax.lax.slice(kv, (0, C), (R, 2 * C))
            clip_outs = []
            for g in range(G):
                o = _merged_heads(
                    jax.lax.slice(q_all, (g * N, 0), ((g + 1) * N, C)),
                    jax.lax.slice(k_all, (g * N, 0), ((g + 1) * N, C)),
                    jax.lax.slice(v_all, (g * N, 0), ((g + 1) * N, C)),
                    maskb, num_heads, m)
                clip_outs.append(o)
            o = jnp.concatenate(clip_outs, axis=0).astype(h.dtype)
            return jnp.dot(o, wproj,
                           preferred_element_type=jnp.float32) + bproj
        ones = _ones_col(N, jnp.bfloat16) if fold_rowsum else None
    else:
        qkv = qkvf.astype(h.dtype)                        # [G·N, 3C]
        logmask = (mask01 - 1.0) * jnp.float32(-_NEG_INF)  # [N, N]

    head_outs = []
    for hd in range(num_heads):
        if bf16:
            q = jax.lax.slice(q_all, (0, hd * dh), (R, (hd + 1) * dh))
            k = jax.lax.slice(kv, (0, hd * dh), (R, (hd + 1) * dh))
            v = jax.lax.slice(kv, (0, C + hd * dh), (R, C + (hd + 1) * dh))
        else:
            q = jax.lax.slice(qkv, (0, hd * dh), (R, (hd + 1) * dh))
            k = jax.lax.slice(qkv, (0, C + hd * dh), (R, C + (hd + 1) * dh))
            v = jax.lax.slice(qkv, (0, 2 * C + hd * dh),
                              (R, 2 * C + (hd + 1) * dh))
        clip_outs = []
        for g in range(G):
            qg = jax.lax.slice(q, (g * N, 0), ((g + 1) * N, dh))
            kg = jax.lax.slice(k, (g * N, 0), ((g + 1) * N, dh))
            vg = jax.lax.slice(v, (g * N, 0), ((g + 1) * N, dh))
            if bf16:
                # Minimal-pass [N, N] score stage (scale on the q slice,
                # one f32→bf16 convert, multiplicative post-exp mask,
                # row-sum on the AV matmul) — rationale in _attn_core.
                s = jax.lax.dot_general(
                    qg, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                p = jnp.exp(jnp.minimum(s.astype(jnp.bfloat16),
                                        jnp.bfloat16(30.0))) * maskb
                if fold_rowsum:
                    o, r = _av_rowsum(p, vg, ones)
                else:
                    r = jnp.maximum(
                        jnp.sum(p.astype(jnp.float32), axis=-1,
                                keepdims=True), 1e-30)
                    o = jnp.dot(p, vg,
                                preferred_element_type=jnp.float32)
            else:
                s = jax.lax.dot_general(
                    qg, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale + logmask
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m).astype(h.dtype)
                r = jnp.maximum(
                    jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
                    1e-30)
                o = jnp.dot(p, vg, preferred_element_type=jnp.float32)
            clip_outs.append(o * jnp.reciprocal(r))
        head_outs.append(jnp.concatenate(clip_outs, axis=0))  # [G·N, dh]
    o = jnp.concatenate(head_outs, axis=-1).astype(h.dtype)   # [G·N, C]
    return jnp.dot(o, wproj, preferred_element_type=jnp.float32) + bproj


def _mhsa_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, mask_ref,
                 out_ref, *, num_heads: int):
    out = _attn_core(x_ref[:], wqkv_ref[:], bqkv_ref[:], wproj_ref[:],
                     bproj_ref[:], mask_ref[:], num_heads)
    out_ref[:] = out.astype(out_ref.dtype)


def _erf_f32(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| ≤ 1.5e-7; Mosaic has no
    native erf primitive). Keeps the exact-GELU semantics to well below
    bf16/f32 test tolerance."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-a * a))


def _gelu(hh, dtype):
    """Exact (erf) GELU of an f32 block, returned in ``dtype``.

    bf16 path: the ONE existing f32→bf16 convert (fc2 consumes bf16
    anyway) happens first, then the whole tanh-form GELU runs in packed
    bf16 (two values per lane on the VPU) — no extra converts, no f32
    relayouts, no compares/divides (unsupported in bf16). tanh-GELU
    deviates from erf-GELU by ≤3e-3 absolute, BELOW the quantization
    the activations pick up from the bf16 cast itself (±0.02 at |x|≈5).
    """
    if dtype != jnp.bfloat16:
        return (0.5 * hh
                * (1.0 + _erf_f32(hh / math.sqrt(2.0)))).astype(dtype)
    x = hh.astype(jnp.bfloat16)
    inner = 0.7978845608028654 * (x + 0.044715 * (x * x * x))
    return 0.5 * x * (1.0 + jnp.tanh(inner))


def _row_mean_mxu(xf, mxu: bool = False):
    """Row-mean of an f32 [R, C] block, optionally as ONE thin MXU matmul.

    The C-lane reduce otherwise lowers to a multi-step VPU shuffle tree
    per statistic, and these kernels are VPU-bound (measured: the AdaLN
    stage alone is 1.47 ms of the 5.87 ms decoder chain). A constant
    [C, 8] column of 1/C turns the reduce into a matmul the MXU absorbs
    for free next to the blocks' own projections. Lanes 1–7 are padding.

    ``mxu`` must be passed True ONLY under the bf16 compute policy: the
    MXU's default single pass rounds f32 operands to bf16, so the stat
    carries bf16-level input rounding — inside the serving policy's
    one-bf16-ulp end-metric contract, but NOT acceptable for the f32
    fused path (CPU tests run true f32 matmuls and cannot see the
    difference; this gate is what keeps the f32 tier honest on TPU).
    Exact alternatives measured and rejected: Precision.HIGHEST blows
    the 16 MB scoped-VMEM budget (+1.85 MB, 6-pass scratch); a hi/lo
    bf16-split double matmul is f32-grade but costs the win back
    (chain 5.46 → 6.49 ms).

    Non-2D inputs (the XLA reference/VJP-recompute paths, which batch
    over clips and are not VPU-bound) keep the plain lane reduce — as do
    blocks wider than one lane tile (C > 128): at C = 256 the trunk's
    full-lane VPU reduce already beats the stat matmuls (measured
    8.75 → 9.28 ms regression), while the chain's half-lane C = 64
    reduce loses to the MXU (5.87 → 5.46 ms win).
    """
    if not mxu or xf.ndim != 2 or xf.shape[-1] > 128:
        return jnp.mean(xf, axis=-1, keepdims=True)
    R, C = xf.shape
    # All-lanes 1/C weight: the matmul emits the mean PRE-BROADCAST to
    # every lane ([R, C], one lane tile — the same MXU pass count as a
    # thin [C, 8] output). Every downstream consumer ((x−μ), μ², rsqrt,
    # the γ/σ multiplies) then runs element-wise on natural [R, C]
    # layouts: the previous [R, 1] thin-slice output forced a sublane-
    # scalar relayout + lane re-broadcast per consumer, and the AdaLN
    # knockout attributed 1.20 ms of the 5.53 ms chain to exactly those
    # stat-op seams (tools/probe_chain.py, noadaln, this host).
    w = jnp.full((C, C), 1.0 / C, jnp.float32)
    return jnp.dot(xf, w, preferred_element_type=jnp.float32)


def _ln_f32(xf, scale, bias, eps, mxu: bool = False):
    """LayerNorm on an f32 [R, C] block (f32 stats, like flax).

    Stats are E[x²] − E[x]² (no centered second pass). With ``mxu``
    (bf16 compute policy only — see _row_mean_mxu) both row reductions
    ride the MXU and the x² elementwise pass is the only VPU work the
    statistics cost."""
    mean = _row_mean_mxu(xf, mxu)
    # Clamp: with MXU stats the inputs to E[x²]−E[x]² carry ~2⁻⁹-relative
    # rounding, so var can come out slightly negative for near-constant
    # rows; eps (~1e-6) is smaller than that error scale and rsqrt of a
    # negative is NaN — which would survive the multiplicative post-exp
    # attention masks (NaN·0 = NaN).
    var = jnp.maximum(_row_mean_mxu(xf * xf, mxu) - mean * mean, 0.0)
    return (xf - mean) * (jax.lax.rsqrt(var + eps) * scale) + bias


def _block_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref,
                  bproj_ref, g2_ref, b2_ref, w1_ref, bb1_ref, w2_ref,
                  bb2_ref, gp_ref, bp_ref, mask_ref, m1_ref, m2_ref,
                  out_ref, *, num_heads: int, eps: float, post_norm: bool,
                  post_eps: float):
    """Whole pre-norm transformer block in one VMEM pass:

        x1 = x + m1·MHSA(LN1(x));  y = x1 + m2·MLP(LN2(x1));  [PostLN(y)]

    MLP is Dense → exact (erf) GELU → Dense, matching models/layers.Mlp.
    ``m1``/``m2`` are per-ROW residual-branch scales ([R, 1]): all-ones
    normally, {0, 1/keep} per clip under stochastic depth — droppath
    training runs fully fused instead of falling back to modular XLA.
    """
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mxu = x.dtype == jnp.bfloat16
    h1 = _ln_f32(xf, g1_ref[:], b1_ref[:], eps, mxu).astype(x.dtype)
    a = _attn_core(h1, wqkv_ref[:], bqkv_ref[:], wproj_ref[:], bproj_ref[:],
                   mask_ref[:], num_heads)
    x1 = xf + a * m1_ref[:]                              # f32 [R, C]

    h2 = _ln_f32(x1, g2_ref[:], b2_ref[:], eps, mxu).astype(x.dtype)
    hh = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32)
    hh = hh + bb1_ref[:]
    hh = _gelu(hh, x.dtype)                               # exact (erf) GELU
    mo = jnp.dot(hh, w2_ref[:],
                 preferred_element_type=jnp.float32) + bb2_ref[:]
    y = x1 + mo * m2_ref[:]
    if post_norm:
        y = _ln_f32(y, gp_ref[:], bp_ref[:], post_eps, mxu)
    out_ref[:] = y.astype(out_ref.dtype)


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


def _clip_mask(G: int, N: int) -> jnp.ndarray:
    """Block-diagonal 0/1 mask [G·N, G·N] (compile-time constant)."""
    import numpy as np

    clip = np.arange(G * N) // N
    return jnp.asarray((clip[:, None] == clip[None, :]).astype("float32"))


def _prep(x, wqkv, bqkv, wproj, bproj, G):
    """Pad clips to a multiple of G; cast weights to the compute dtype."""
    B, N, C = x.shape
    dtype = x.dtype
    pad = (-B) % G
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, N, C), dtype)], axis=0)
    return (x.reshape((B + pad) * N, C), wqkv.astype(dtype),
            bqkv.astype(jnp.float32).reshape(1, -1), wproj.astype(dtype),
            bproj.astype(jnp.float32).reshape(1, -1), B + pad, pad)


def _fused_mhsa_impl(x, wqkv, bqkv, wproj, bproj, num_heads):
    B, N, C = x.shape
    dtype = x.dtype
    if N > 64:
        # Long sequences (the 431-vertex stream): one clip per grid step,
        # tokens padded to a sublane multiple and masked out. Still one
        # HBM read/write of x — XLA's native path materializes the
        # [B, H, N, N] score tensor (hundreds of MB at batch 256).
        return _fused_mhsa_single(x, wqkv, bqkv, wproj, bproj, num_heads)
    G = _pick_group(B, N)
    R = G * N
    x2, wqkv, bqkv, wproj, bproj, Bp, pad = _prep(
        x, wqkv, bqkv, wproj, bproj, G)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    flops = Bp // G * (2 * R * C * 3 * C + num_heads * 2 * 2 * R * R *
                       (C // num_heads) + 2 * R * C * C)
    out = pl.pallas_call(
        functools.partial(_mhsa_kernel, num_heads=num_heads),
        grid=(Bp // G,),
        in_specs=[rows] + [full] * 5,
        out_specs=rows,
        out_shape=jax.ShapeDtypeStruct((Bp * N, C), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * Bp * N * C * x2.dtype.itemsize,
            transcendentals=Bp // G * num_heads * R * R,
        ),
        # CPU (the virtual-mesh test backend) runs the kernel interpreted.
        interpret=jax.default_backend() != "tpu",
    )(x2, wqkv, bqkv, wproj, bproj, _clip_mask(G, N))
    out = out.reshape(Bp, N, C)
    return out[:B] if pad else out


def _pad_tokens(N: int):
    """Single-clip-variant padding recipe, shared by forward and backward:
    sublane-aligned token count (multiple of 16 covers f32 AND bf16
    tiling) plus the valid-token outer-product mask."""
    import numpy as np

    Np = -(-N // 16) * 16
    valid = (np.arange(Np) < N).astype("float32")
    return Np, jnp.asarray(valid[:, None] * valid[None, :])


def _fused_mhsa_single(x, wqkv, bqkv, wproj, bproj, num_heads):
    """One-clip-per-program variant for token counts > 64 (e.g. N=431)."""
    B, N, C = x.shape
    dtype = x.dtype
    Np, mask = _pad_tokens(N)
    xp = (jnp.pad(x, ((0, 0), (0, Np - N), (0, 0))) if Np != N else x)
    x2 = xp.reshape(B * Np, C)
    wqkv = wqkv.astype(dtype)
    wproj = wproj.astype(dtype)
    bq = bqkv.astype(jnp.float32).reshape(1, -1)
    bp = bproj.astype(jnp.float32).reshape(1, -1)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((Np, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dh = C // num_heads
    flops = B * (2 * Np * C * 3 * C + num_heads * 4 * Np * Np * dh
                 + 2 * Np * C * C)
    out = pl.pallas_call(
        functools.partial(_mhsa_kernel, num_heads=num_heads),
        grid=(B,),
        in_specs=[rows] + [full] * 5,
        out_specs=rows,
        out_shape=jax.ShapeDtypeStruct((B * Np, C), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * Np * C * x2.dtype.itemsize,
            transcendentals=B * num_heads * Np * Np,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2, wqkv, bq, wproj, bp, mask)
    return out.reshape(B, Np, C)[:, :N]


def _fused_mhsa_fwd(x, wqkv, bqkv, wproj, bproj, num_heads):
    return (_fused_mhsa_impl(x, wqkv, bqkv, wproj, bproj, num_heads),
            (x, wqkv, bqkv, wproj, bproj))


def _attn_bwd_core(x, g, wqkv, bqkv, wproj, mask01, num_heads: int):
    """Recompute + backward of :func:`_attn_core` on one VMEM [R, C] block.

    Flash-attention-style: nothing is saved from the forward; qkv and the
    per-head probabilities are recomputed in VMEM (the recompute matmuls
    are ~free next to the HBM round-trips a residual stash would cost).
    Returns ``dx`` (compute dtype) and f32 parameter-gradient contributions
    for THIS row block — the kernel accumulates them across grid steps.
    """
    R, C = x.shape
    dh = C // num_heads
    scale = 1.0 / math.sqrt(dh)
    dtype = x.dtype

    qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv).astype(dtype)                     # [R, 3C]
    gf = g.astype(jnp.float32)
    # do = g @ wprojᵀ (contract the output channel of both).
    do = jax.lax.dot_general(g, wproj, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [R, C]

    dqs, dks, dvs, dwp_rows = [], [], [], []
    for hd in range(num_heads):
        q = jax.lax.slice(qkv, (0, hd * dh), (R, (hd + 1) * dh))
        k = jax.lax.slice(qkv, (0, C + hd * dh), (R, C + (hd + 1) * dh))
        v = jax.lax.slice(qkv, (0, 2 * C + hd * dh),
                          (R, 2 * C + (hd + 1) * dh))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        # Same valid-entry-max stabilizer as the forward (_attn_core).
        m = jnp.max(s + (mask01 - 1.0) * jnp.float32(-_NEG_INF),
                    axis=-1, keepdims=True)
        p = jnp.exp(jnp.minimum(s - m, 0.0)) * mask01
        r = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        pn = p / r                                       # f32 [R, R]
        pn_c = pn.astype(dtype)

        do_h = jax.lax.slice(do, (0, hd * dh), (R, (hd + 1) * dh))
        do_hc = do_h.astype(dtype)
        # o_h is only needed for dwproj's rows: o_hᵀ @ g.
        o_h = jnp.dot(pn_c, v, preferred_element_type=jnp.float32) \
            .astype(dtype)
        dwp_rows.append(jax.lax.dot_general(
            o_h, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))         # [dh, C]
        # Softmax-block backward (masked entries have pn == 0 → ds == 0).
        dpn = jax.lax.dot_general(do_hc, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(pn_c, do_hc, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = pn * (dpn - jnp.sum(dpn * pn, axis=-1, keepdims=True))
        ds = (ds * scale).astype(dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)

    dqkv = jnp.concatenate(
        [jnp.concatenate(dqs, -1), jnp.concatenate(dks, -1),
         jnp.concatenate(dvs, -1)], -1)                  # f32 [R, 3C]
    dqkv_c = dqkv.astype(dtype)
    dwqkv = jax.lax.dot_general(x, dqkv_c, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)         # [1, 3C]
    dwproj = jnp.concatenate(dwp_rows, 0)                # [C, C]
    dbproj = jnp.sum(gf, axis=0, keepdims=True)          # [1, C]
    dx = jax.lax.dot_general(dqkv_c, wqkv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dx.astype(dtype), dwqkv, dbqkv, dwproj, dbproj


def _attn_fwd_save(x, wqkv, bqkv, wproj, bproj, mask01, num_heads: int):
    """Attention forward with the BACKWARD's stabilizer math; returns
    (a [R, C] f32, saved) where ``saved`` feeds :func:`_attn_bwd_saved`.

    Used by the whole-block backward kernel: the block's value recompute
    (x1 = x + a·m1 is needed before any gradient exists) and the
    attention gradient share ONE probability computation instead of the
    two a naive compose-of-cores would do.
    """
    R, C = x.shape
    dh = C // num_heads
    scale = 1.0 / math.sqrt(dh)
    dtype = x.dtype
    qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv).astype(dtype)                      # [R, 3C]
    logmask = (mask01 - 1.0) * jnp.float32(-_NEG_INF)
    pns, os = [], []
    for hd in range(num_heads):
        q = jax.lax.slice(qkv, (0, hd * dh), (R, (hd + 1) * dh))
        k = jax.lax.slice(qkv, (0, C + hd * dh), (R, C + (hd + 1) * dh))
        v = jax.lax.slice(qkv, (0, 2 * C + hd * dh),
                          (R, 2 * C + (hd + 1) * dh))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s + logmask, axis=-1, keepdims=True)
        p = jnp.exp(jnp.minimum(s - m, 0.0)) * mask01
        r = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        pn = p / r                                        # f32 [R, R]
        pns.append(pn)
        os.append(jnp.dot(pn.astype(dtype), v,
                          preferred_element_type=jnp.float32))
    o_all = jnp.concatenate(os, -1).astype(dtype)         # [R, C]
    a = jnp.dot(o_all, wproj, preferred_element_type=jnp.float32) + bproj
    return a, (qkv, pns, o_all)


def _attn_bwd_saved(x, g, saved, wqkv, wproj, num_heads: int):
    """Gradient half of :func:`_attn_fwd_save` — the same math as
    :func:`_attn_bwd_core` minus the recompute. ``x`` is the attention
    input (for dwqkv), ``g`` the upstream grad in the compute dtype."""
    qkv, pns, o_all = saved
    R, C = x.shape
    dh = C // num_heads
    scale = 1.0 / math.sqrt(dh)
    dtype = x.dtype
    gf = g.astype(jnp.float32)
    do = jax.lax.dot_general(g, wproj, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [R, C]
    dqs, dks, dvs = [], [], []
    for hd in range(num_heads):
        q = jax.lax.slice(qkv, (0, hd * dh), (R, (hd + 1) * dh))
        k = jax.lax.slice(qkv, (0, C + hd * dh), (R, C + (hd + 1) * dh))
        v = jax.lax.slice(qkv, (0, 2 * C + hd * dh),
                          (R, 2 * C + (hd + 1) * dh))
        pn = pns[hd]
        pn_c = pn.astype(dtype)
        do_h = jax.lax.slice(do, (0, hd * dh), (R, (hd + 1) * dh))
        do_hc = do_h.astype(dtype)
        dpn = jax.lax.dot_general(do_hc, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(pn_c, do_hc, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = pn * (dpn - jnp.sum(dpn * pn, axis=-1, keepdims=True))
        ds = (ds * scale).astype(dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dqkv = jnp.concatenate(
        [jnp.concatenate(dqs, -1), jnp.concatenate(dks, -1),
         jnp.concatenate(dvs, -1)], -1)                   # f32 [R, 3C]
    dqkv_c = dqkv.astype(dtype)
    dwqkv = jax.lax.dot_general(x, dqkv_c, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)          # [1, 3C]
    # o_allᵀ @ g == the per-head dwp_rows concat of _attn_bwd_core.
    dwproj = jax.lax.dot_general(o_all, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dbproj = jnp.sum(gf, axis=0, keepdims=True)           # [1, C]
    dx = jax.lax.dot_general(dqkv_c, wqkv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dx.astype(dtype), dwqkv, dbqkv, dwproj, dbproj


def _mhsa_bwd_kernel(x_ref, g_ref, wqkv_ref, bqkv_ref, wproj_ref, mask_ref,
                     dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref,
                     *, num_heads: int):
    i = pl.program_id(0)
    dx, dwqkv, dbqkv, dwproj, dbproj = _attn_bwd_core(
        x_ref[:], g_ref[:], wqkv_ref[:], bqkv_ref[:], wproj_ref[:],
        mask_ref[:], num_heads)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    # Param grads accumulate sequentially across grid steps: constant
    # index maps keep these output blocks VMEM-resident for the whole grid.
    @pl.when(i == 0)
    def _init():
        dwqkv_ref[:] = dwqkv
        dbqkv_ref[:] = dbqkv
        dwproj_ref[:] = dwproj
        dbproj_ref[:] = dbproj

    @pl.when(i > 0)
    def _acc():
        dwqkv_ref[:] += dwqkv
        dbqkv_ref[:] += dbqkv
        dwproj_ref[:] += dwproj
        dbproj_ref[:] += dbproj


def _fused_mhsa_bwd(num_heads, res, g):
    """Pallas backward: same VMEM-resident row blocks as the forward.

    Per block: recompute qkv + per-head probabilities, run the head-wise
    backward chain entirely in VMEM, and accumulate the four parameter
    gradients across the (sequential) grid. HBM traffic per layer is one
    read of x and g plus one write of dx — the XLA recompute path this
    replaces materialized every per-head intermediate (measured: the
    lifter's backward dominated the whole train step).
    """
    x, wqkv, bqkv, wproj, bproj = res
    B, N, C = x.shape
    dtype = x.dtype

    if N > 64:
        # Single-clip-per-program variant (the 431-token vertex stream):
        # same padding recipe as the forward (_pad_tokens).
        Np, mask = _pad_tokens(N)
        if Np != N:
            x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
            g = jnp.pad(g, ((0, 0), (0, Np - N), (0, 0)))
        x2 = x.reshape(B * Np, C)
        g2 = g.astype(dtype).reshape(B * Np, C)
        wqkv_c, bq = wqkv.astype(dtype), \
            bqkv.astype(jnp.float32).reshape(1, -1)
        wproj_c = wproj.astype(dtype)
        R, grid, Bp = Np, B, B
    else:
        G = _pick_group(B, N)
        R = G * N
        x2, wqkv_c, bq, wproj_c, _, Bp, pad = _prep(
            x, wqkv, bqkv, wproj, bproj, G)
        if pad:
            g = jnp.concatenate(
                [g, jnp.zeros((pad, N, C), g.dtype)], axis=0)
        g2 = g.astype(dtype).reshape(Bp * N, C)
        mask = _clip_mask(G, N)
        grid = Bp // G

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    dh = C // num_heads
    # ~3× the forward matmul FLOPs (recompute + two backward chains).
    flops = grid * 3 * (2 * R * C * 3 * C + num_heads * 4 * R * R * dh
                        + 2 * R * C * C)
    dx2, dwqkv, dbqkv, dwproj, dbproj = pl.pallas_call(
        functools.partial(_mhsa_bwd_kernel, num_heads=num_heads),
        grid=(grid,),
        in_specs=[rows, rows] + [full] * 4,
        out_specs=[rows, acc((C, 3 * C)), acc((1, 3 * C)), acc((C, C)),
                   acc((1, C))],
        out_shape=[
            jax.ShapeDtypeStruct(x2.shape, dtype),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * x2.size * x2.dtype.itemsize,
            transcendentals=grid * num_heads * R * R,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2, g2, wqkv_c, bq, wproj_c, mask)

    if N > 64:
        dx = dx2.reshape(B, Np, C)[:, :N]
    else:
        dx = dx2.reshape(Bp, N, C)[:B]
    return (dx.astype(x.dtype),
            dwqkv.astype(wqkv.dtype),
            dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
            dwproj.astype(wproj.dtype),
            dbproj.reshape(bproj.shape).astype(bproj.dtype))


fused_mhsa.defvjp(_fused_mhsa_fwd, _fused_mhsa_bwd)


# ---------------------------------------------------------------------------
# Whole-transformer-block fusion: LN1 → MHSA → +res → LN2 → MLP → +res
# (→ optional shared post-LN, the lifter's norm_s/norm_t quirk).
# One HBM read + one write of x per layer.
# ---------------------------------------------------------------------------


def _ln_ref(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y


def block_reference(x, params, num_heads, eps=1e-6, post_eps=1e-6,
                    attn_fn=None, branch_masks=None):
    """Pure-XLA reference of the fused block (VJP + test oracle).

    ``attn_fn`` swaps the attention implementation while keeping the
    LN/residual/GELU chain single-sourced — the custom-VJP recompute path
    passes :func:`fused_mhsa` here so the Pallas backward kernel carries
    the dominant gradient cost. ``branch_masks`` = (m1, m2) per-sample
    [B, 1, 1] residual-branch scales (stochastic depth), or None.
    """
    if attn_fn is None:
        attn_fn = functools.partial(mhsa_reference, num_heads=num_heads)
    m1, m2 = branch_masks if branch_masks is not None else (1.0, 1.0)
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bb1, w2, bb2,
     gp, bp) = params
    dtype = x.dtype
    h1 = _ln_ref(x, g1, b1, eps).astype(dtype)
    x1 = (x.astype(jnp.float32)
          + attn_fn(h1, wqkv, bqkv, wproj, bproj).astype(jnp.float32) * m1)
    h2 = _ln_ref(x1, g2, b2, eps).astype(dtype)
    hh = (h2 @ w1.astype(dtype)).astype(jnp.float32) + bb1
    hh = 0.5 * hh * (1.0 + jax.lax.erf(hh / math.sqrt(2.0)))
    mo = (hh.astype(dtype) @ w2.astype(dtype)).astype(jnp.float32) + bb2
    y = x1 + mo * m2
    if gp is not None:
        y = _ln_ref(y, gp, bp, post_eps)
    return y.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_transformer_block(x, params, num_heads, eps=1e-6, post_eps=1e-6,
                            branch_masks=None):
    """Fused pre-norm transformer block for short token sequences.

    Args:
      x: [B, N, C] tokens (N ≤ 64).
      params: tuple (ln1_scale, ln1_bias, wqkv [C,3C], bqkv [3C],
        wproj [C,C], bproj [C], ln2_scale, ln2_bias, w_fc1 [C,hid],
        b_fc1 [hid], w_fc2 [hid,C], b_fc2 [C], post_scale|None, post_bias).
        A ``None`` post_scale skips the trailing shared LayerNorm.
      num_heads / eps / post_eps: static config.
      branch_masks: None, or (m1, m2) per-sample [B, 1, 1] residual-branch
        scales ({0, 1/keep} stochastic depth) applied to the attention and
        MLP branches respectively — droppath training stays fully fused.

    Returns:
      [B, N, C], same dtype as x.
    """
    return _fused_block_impl(x, params, num_heads, eps, post_eps,
                             branch_masks)


def _branch_mask_rows(m, B, N, Bp):
    """[B, 1, 1] per-clip scale → [Bp·N, 1] per-row f32 (pad clips = 1)."""
    rows = jnp.repeat(m.astype(jnp.float32).reshape(B, 1), N, axis=0)
    if Bp != B:
        rows = jnp.concatenate(
            [rows, jnp.ones(((Bp - B) * N, 1), jnp.float32)], axis=0)
    return rows


def _fused_block_impl(x, params, num_heads, eps, post_eps, branch_masks):
    B, N, C = x.shape
    dtype = x.dtype
    if N > 64:
        return block_reference(x, params, num_heads, eps, post_eps,
                               branch_masks=branch_masks)
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bb1, w2, bb2,
     gp, bp) = params
    post = gp is not None
    G = _pick_group(B, N)
    R = G * N
    x2, wqkv, bqkv, wproj, bproj, Bp, pad = _prep(
        x, wqkv, bqkv, wproj, bproj, G)
    hid = w1.shape[1]

    if branch_masks is None:
        ones = jnp.ones((Bp * N, 1), jnp.float32)
        m1r = m2r = ones
    else:
        m1r = _branch_mask_rows(branch_masks[0], B, N, Bp)
        m2r = _branch_mask_rows(branch_masks[1], B, N, Bp)

    def v(a):
        return a.astype(jnp.float32).reshape(1, -1)

    if not post:
        gp = jnp.ones((C,), jnp.float32)
        bp = jnp.zeros((C,), jnp.float32)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mrows = pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dh = C // num_heads
    flops = Bp // G * (2 * R * C * 3 * C + num_heads * 4 * R * R * dh
                       + 2 * R * C * C + 4 * R * C * hid)
    out = pl.pallas_call(
        functools.partial(_block_kernel, num_heads=num_heads, eps=eps,
                          post_norm=post, post_eps=post_eps),
        grid=(Bp // G,),
        in_specs=[rows] + [full] * 15 + [mrows, mrows],
        out_specs=rows,
        out_shape=jax.ShapeDtypeStruct((Bp * N, C), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * Bp * N * C * x2.dtype.itemsize,
            transcendentals=Bp // G * (num_heads * R * R + R * hid),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2, v(g1), v(b1), wqkv, bqkv, wproj, bproj, v(g2), v(b2),
      w1.astype(dtype), v(bb1), w2.astype(dtype), v(bb2), v(gp), v(bp),
      _clip_mask(G, N), m1r, m2r)
    out = out.reshape(Bp, N, C)
    return out[:B] if pad else out


def _fused_block_fwd(x, params, num_heads, eps, post_eps, branch_masks):
    return (_fused_block_impl(x, params, num_heads, eps, post_eps,
                              branch_masks),
            (x, params, branch_masks))


def _block_bwd_path(x, params, num_heads, eps, post_eps, branch_masks):
    """Differentiation path for the fused block: the single-sourced
    :func:`block_reference` chain with attention routed through
    :func:`fused_mhsa`, so its Pallas backward kernel carries the dominant
    cost. LN/MLP backward stays XLA (fat, MXU-friendly matmuls)."""
    return block_reference(
        x, params, num_heads, eps, post_eps,
        attn_fn=lambda h, wq, bq, wp, bp: fused_mhsa(
            h, wq, bq, wp, bp, num_heads),
        branch_masks=branch_masks)


def _ln_fwd_stats(xf, scale, bias, eps):
    """LN forward that also returns (x̂, inv) for the backward —
    same single-pass stats as :func:`_ln_f32`."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd_from_stats(dy, xhat, inv, scale):
    """LayerNorm backward given the forward's (x̂, inv).

    dx = inv·(dy·γ − mean(dy·γ) − x̂·mean(dy·γ·x̂));
    dγ = Σ_rows dy·x̂; dβ = Σ_rows dy.  All f32.
    """
    dyg = dy * scale
    mean1 = jnp.mean(dyg, axis=-1, keepdims=True)
    mean2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx = inv * (dyg - mean1 - xhat * mean2)
    dgamma = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dy, axis=0, keepdims=True)
    return dx, dgamma, dbeta


def _ln_bwd(dy, xf, scale, eps):
    """LayerNorm backward recomputing stats (for the post-LN, whose
    input y is already recomputed in the caller)."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    return _ln_bwd_from_stats(dy, xhat, inv, scale)


def _gelu_grad(hh, dtype):
    """d gelu(hh)/d hh as f32, matching :func:`_gelu` branch-for-branch
    (erf at f32; the tanh approximation evaluated in bf16 for bf16)."""
    if dtype != jnp.bfloat16:
        cdf = 0.5 * (1.0 + _erf_f32(hh / math.sqrt(2.0)))
        pdf = jnp.exp(-0.5 * hh * hh) * (1.0 / math.sqrt(2.0 * math.pi))
        return cdf + hh * pdf
    x = hh.astype(jnp.bfloat16)
    c = 0.7978845608028654
    a3 = 0.044715
    t = jnp.tanh(c * (x + a3 * (x * x * x)))
    d = 0.5 * (1.0 + t) + (0.5 * c) * x * (1.0 - t * t) \
        * (1.0 + 3.0 * a3 * (x * x))
    return d.astype(jnp.float32)


def _block_bwd_kernel(x_ref, g_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref,
                      wproj_ref, bproj_ref, g2_ref, b2_ref, w1_ref, bb1_ref,
                      w2_ref, bb2_ref, gp_ref, bp_ref, mask_ref, m1_ref,
                      m2_ref, dx_ref, dg1_ref, db1_ref, dwqkv_ref,
                      dbqkv_ref, dwproj_ref, dbproj_ref, dg2_ref, db2_ref,
                      dw1_ref, dbb1_ref, dw2_ref, dbb2_ref, dgp_ref,
                      dbp_ref, dm1_ref, dm2_ref, *, num_heads: int,
                      eps: float, post_norm: bool, post_eps: float):
    """Whole-block backward in one VMEM pass (recompute-in-VMEM).

    Replaces the XLA LN/MLP backward chain around the Pallas attention
    backward (round 2's split): the forward is recomputed from the saved
    row block x — LN stats and the per-head attention probabilities are
    computed ONCE and shared between the value recompute (x1 is needed
    before any gradient exists) and the gradient path — then both
    residual branches run their backward without touching HBM. Parameter
    gradients accumulate across the sequential grid exactly like
    :func:`_mhsa_bwd_kernel`.
    """
    i = pl.program_id(0)
    x = x_ref[:]
    dt = x.dtype
    xf = x.astype(jnp.float32)
    m1 = m1_ref[:]
    m2 = m2_ref[:]

    # ---- forward recompute, keeping backward state ----------------------
    h1f, xhat1, inv1 = _ln_fwd_stats(xf, g1_ref[:], b1_ref[:], eps)
    h1 = h1f.astype(dt)
    a, saved = _attn_fwd_save(h1, wqkv_ref[:], bqkv_ref[:], wproj_ref[:],
                              bproj_ref[:], mask_ref[:], num_heads)
    x1 = xf + a * m1                                      # f32 [R, C]
    h2f, xhat2, inv2 = _ln_fwd_stats(x1, g2_ref[:], b2_ref[:], eps)
    h2 = h2f.astype(dt)
    hh = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32) \
        + bb1_ref[:]
    ge = _gelu(hh, dt)
    mo = jnp.dot(ge, w2_ref[:], preferred_element_type=jnp.float32) \
        + bb2_ref[:]

    # ---- backward --------------------------------------------------------
    go = g_ref[:].astype(jnp.float32)
    if post_norm:
        y = x1 + mo * m2
        gy, dgp, dbp = _ln_bwd(go, y, gp_ref[:], post_eps)
    else:
        gy = go
        dgp = jnp.zeros_like(gp_ref[:])
        dbp = jnp.zeros_like(bp_ref[:])

    # MLP branch: y = x1 + m2·(W2·gelu(W1·h2 + b1) + b2)
    m2g = gy * m2
    dbb2 = jnp.sum(m2g, axis=0, keepdims=True)
    m2g_c = m2g.astype(dt)
    dw2 = jax.lax.dot_general(ge, m2g_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dge = jax.lax.dot_general(m2g_c, w2_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dhh = dge * _gelu_grad(hh, dt)
    dbb1 = jnp.sum(dhh, axis=0, keepdims=True)
    dhh_c = dhh.astype(dt)
    dw1 = jax.lax.dot_general(h2, dhh_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh2 = jax.lax.dot_general(dhh_c, w1_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx1_ln, dg2, db2 = _ln_bwd_from_stats(dh2, xhat2, inv2, g2_ref[:])
    dx1 = gy + dx1_ln

    # droppath-mask grads (per-row; caller reduces per clip)
    dm2_ref[:] = jnp.sum(gy * mo, axis=-1, keepdims=True)
    dm1_ref[:] = jnp.sum(dx1 * a, axis=-1, keepdims=True)

    # attention branch
    da = (dx1 * m1).astype(dt)
    dh1, dwqkv, dbqkv, dwproj, dbproj = _attn_bwd_saved(
        h1, da, saved, wqkv_ref[:], wproj_ref[:], num_heads)
    dx_ln, dg1, db1 = _ln_bwd_from_stats(dh1.astype(jnp.float32),
                                         xhat1, inv1, g1_ref[:])
    dx_ref[:] = (dx1 + dx_ln).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dg1_ref[:], db1_ref[:] = dg1, db1
        dwqkv_ref[:], dbqkv_ref[:] = dwqkv, dbqkv
        dwproj_ref[:], dbproj_ref[:] = dwproj, dbproj
        dg2_ref[:], db2_ref[:] = dg2, db2
        dw1_ref[:], dbb1_ref[:] = dw1, dbb1
        dw2_ref[:], dbb2_ref[:] = dw2, dbb2
        dgp_ref[:], dbp_ref[:] = dgp, dbp

    @pl.when(i > 0)
    def _acc():
        dg1_ref[:] += dg1
        db1_ref[:] += db1
        dwqkv_ref[:] += dwqkv
        dbqkv_ref[:] += dbqkv
        dwproj_ref[:] += dwproj
        dbproj_ref[:] += dbproj
        dg2_ref[:] += dg2
        db2_ref[:] += db2
        dw1_ref[:] += dw1
        dbb1_ref[:] += dbb1
        dw2_ref[:] += dw2
        dbb2_ref[:] += dbb2
        dgp_ref[:] += dgp
        dbp_ref[:] += dbp


def _fused_block_bwd(num_heads, eps, post_eps, res, g):
    x, params, branch_masks = res
    B, N, C = x.shape
    if N > 64:
        # The forward fell back to block_reference for N > 64 — keep the
        # matching XLA backward.
        _, vjp = jax.vjp(
            lambda x, p, m: _block_bwd_path(x, p, num_heads, eps,
                                            post_eps, m),
            x, params, branch_masks)
        return vjp(g)

    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bb1, w2, bb2,
     gp, bp) = params
    dtype = x.dtype
    post = gp is not None
    G = _pick_group(B, N)
    R = G * N
    x2, wqkv_c, bqkv_c, wproj_c, bproj_c, Bp, pad = _prep(
        x, wqkv, bqkv, wproj, bproj, G)
    if pad:
        g = jnp.concatenate([g, jnp.zeros((pad, N, C), g.dtype)], axis=0)
    g2rows = g.astype(dtype).reshape(Bp * N, C)
    hid = w1.shape[1]

    if branch_masks is None:
        ones = jnp.ones((Bp * N, 1), jnp.float32)
        m1r = m2r = ones
    else:
        m1r = _branch_mask_rows(branch_masks[0], B, N, Bp)
        m2r = _branch_mask_rows(branch_masks[1], B, N, Bp)

    def v(a):
        return a.astype(jnp.float32).reshape(1, -1)

    gp_in = v(gp) if post else jnp.ones((1, C), jnp.float32)
    bp_in = v(bp) if post else jnp.zeros((1, C), jnp.float32)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mrows = pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dh = C // num_heads
    flops = Bp // G * 3 * (2 * R * C * 3 * C + num_heads * 4 * R * R * dh
                           + 2 * R * C * C + 4 * R * C * hid)
    outs = pl.pallas_call(
        functools.partial(_block_bwd_kernel, num_heads=num_heads, eps=eps,
                          post_norm=post, post_eps=post_eps),
        grid=(Bp // G,),
        in_specs=[rows, rows] + [full] * 14 + [full, mrows, mrows],
        out_specs=[rows, acc((1, C)), acc((1, C)), acc((C, 3 * C)),
                   acc((1, 3 * C)), acc((C, C)), acc((1, C)), acc((1, C)),
                   acc((1, C)), acc((C, hid)), acc((1, hid)),
                   acc((hid, C)), acc((1, C)), acc((1, C)), acc((1, C)),
                   mrows, mrows],
        out_shape=[
            jax.ShapeDtypeStruct((Bp * N, C), dtype),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((C, 3 * C), f32),
            jax.ShapeDtypeStruct((1, 3 * C), f32),
            jax.ShapeDtypeStruct((C, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((C, hid), f32),
            jax.ShapeDtypeStruct((1, hid), f32),
            jax.ShapeDtypeStruct((hid, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((Bp * N, 1), f32),
            jax.ShapeDtypeStruct((Bp * N, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * Bp * N * C * x2.dtype.itemsize,
            transcendentals=Bp // G * (num_heads * R * R + 2 * R * hid),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2, g2rows, v(g1), v(b1), wqkv_c, bqkv_c, wproj_c, bproj_c,
      v(g2), v(b2), w1.astype(dtype), v(bb1), w2.astype(dtype), v(bb2),
      gp_in, bp_in, _clip_mask(G, N), m1r, m2r)
    (dx2, dg1, db1, dwqkv, dbqkv, dwproj, dbproj, dg2, db2, dw1, dbb1,
     dw2, dbb2, dgp, dbp, dm1_rows, dm2_rows) = outs

    dx = dx2.reshape(Bp, N, C)[:B].astype(x.dtype)
    dparams = (
        dg1.reshape(g1.shape).astype(g1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
        dwproj.astype(wproj.dtype),
        dbproj.reshape(bproj.shape).astype(bproj.dtype),
        dg2.reshape(g2.shape).astype(g2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
        dw1.astype(w1.dtype),
        dbb1.reshape(bb1.shape).astype(bb1.dtype),
        dw2.astype(w2.dtype),
        dbb2.reshape(bb2.shape).astype(bb2.dtype),
        dgp.reshape(gp.shape).astype(gp.dtype) if post else None,
        dbp.reshape(bp.shape).astype(bp.dtype) if post else None,
    )
    if branch_masks is None:
        dmasks = None
    else:
        m1, m2 = branch_masks
        dm1 = dm1_rows.reshape(Bp, N)[:B].sum(axis=1).reshape(m1.shape)
        dm2 = dm2_rows.reshape(Bp, N)[:B].sum(axis=1).reshape(m2.shape)
        dmasks = (dm1.astype(m1.dtype), dm2.astype(m2.dtype))
    return dx, dparams, dmasks


fused_transformer_block.defvjp(_fused_block_fwd, _fused_block_bwd)


# ---------------------------------------------------------------------------
# Fused AdaLayerNorm transformer block (the decoder's conditioned blocks):
#     x1 = x + m1·MHSA(AdaLN1(x; γ1,β1));  y = x1 + m2·MLP(AdaLN2(x1; γ2,β2))
# γ/β are PER-CLIP vectors (regressed outside from the GRU mid feature —
# reference AdaLayerNorm, /root/reference/lib/models/CoevoDecoder.py:16-29);
# one grid step per clip keeps the whole 431-token vertex stream (padded to
# 448 rows) VMEM-resident: one HBM read + one write of x per block instead
# of the XLA path's per-op materializations. This is the kernel that lifts
# the N>64 decoder stream the round-2 fused block could not cover.
# ---------------------------------------------------------------------------


def _adaln_f32(xf, gamma, beta, eps, mxu: bool = False):
    """Reference AdaLayerNorm on an f32 [R, C] block: UNBIASED std and eps
    OUTSIDE the sqrt (CoevoDecoder.py:24-29). γ/β broadcast rows."""
    C = xf.shape[-1]
    # With ``mxu`` (bf16 compute policy only) row stats ride the MXU
    # (_row_mean_mxu) — the decoder chain's AdaLN stage was its single
    # largest non-matmul cost (1.47 ms / 5.87 ms) with VPU lane-reduce
    # trees at half-lane occupancy (C=64).
    mean = _row_mean_mxu(xf, mxu)
    # maximum(·, 0): MXU-stat rounding can push E[x²]−E[x]² negative on
    # near-constant rows (error scale ~2⁻⁹·mean² beats eps), and sqrt of
    # a negative is NaN that survives multiplicative attention masks.
    var = jnp.maximum(_row_mean_mxu(xf * xf, mxu) - mean * mean,
                      0.0) * (C / (C - 1))
    # Reciprocal-multiply (vs a [R, C] divide): the inverse is a [R, 1]
    # column, so the divide collapses C-fold.
    inv = jnp.reciprocal(jnp.sqrt(var) + eps)
    return gamma * ((xf - mean) * inv) + beta


def _ada_block_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref,
                      bproj_ref, g2_ref, b2_ref, w1_ref, bb1_ref, w2_ref,
                      bb2_ref, mask_ref, m1_ref, m2_ref, out_ref, *,
                      num_heads: int, eps: float):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    # Per-clip vectors arrive as [1, 1, C] / [1, 1, 1] blocks (Mosaic
    # requires the last two block dims to match the array); [0] yields
    # [1, C] / [1, 1] rows that broadcast over the clip's tokens.
    mxu = x.dtype == jnp.bfloat16
    h1 = _adaln_f32(xf, g1_ref[0], b1_ref[0], eps, mxu).astype(x.dtype)
    a = _attn_core(h1, wqkv_ref[:], bqkv_ref[:], wproj_ref[:], bproj_ref[:],
                   mask_ref[:], num_heads)
    x1 = xf + a * m1_ref[0]

    h2 = _adaln_f32(x1, g2_ref[0], b2_ref[0], eps, mxu).astype(x.dtype)
    hh = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32)
    hh = hh + bb1_ref[:]
    hh = _gelu(hh, x.dtype)                               # exact (erf) GELU
    mo = jnp.dot(hh, w2_ref[:],
                 preferred_element_type=jnp.float32) + bb2_ref[:]
    out_ref[:] = (x1 + mo * m2_ref[0]).astype(out_ref.dtype)


def ada_block_reference(x, gamma1, beta1, gamma2, beta2, params, num_heads,
                        eps=1e-6, attn_fn=None, branch_masks=None):
    """Pure-XLA reference of the fused AdaLN block (VJP + test oracle).

    ``gamma*/beta*`` are the per-clip [B, C] conditioning vectors (already
    regressed from the image feature)."""
    if attn_fn is None:
        attn_fn = functools.partial(mhsa_reference, num_heads=num_heads)
    m1, m2 = branch_masks if branch_masks is not None else (1.0, 1.0)
    wqkv, bqkv, wproj, bproj, w1, bb1, w2, bb2 = params
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    h1 = _adaln_f32(xf, gamma1[:, None, :], beta1[:, None, :],
                    eps).astype(dtype)
    x1 = xf + attn_fn(h1, wqkv, bqkv, wproj, bproj).astype(jnp.float32) * m1
    h2 = _adaln_f32(x1, gamma2[:, None, :], beta2[:, None, :],
                    eps).astype(dtype)
    hh = (h2 @ w1.astype(dtype)).astype(jnp.float32) + bb1
    hh = 0.5 * hh * (1.0 + jax.lax.erf(hh / math.sqrt(2.0)))
    mo = (hh.astype(dtype) @ w2.astype(dtype)).astype(jnp.float32) + bb2
    return (x1 + mo * m2).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_ada_block(x, gamma1, beta1, gamma2, beta2, params, num_heads,
                    eps=1e-6, branch_masks=None):
    """Fused conditioned (AdaLayerNorm) transformer block.

    Args:
      x: [B, N, C] tokens — ANY N (one clip per grid step; tokens padded
        to the sublane multiple and masked).
      gamma1/beta1/gamma2/beta2: [B, C] per-clip AdaLN modulation vectors.
      params: tuple (wqkv [C,3C], bqkv [3C], wproj [C,C], bproj [C],
        w_fc1 [C,hid], b_fc1 [hid], w_fc2 [hid,C], b_fc2 [C]).
      num_heads / eps: static config.
      branch_masks: None, or per-clip [B, 1, 1] stochastic-depth scales
        (m1, m2) for the attention / MLP residual branches.

    Returns:
      [B, N, C], same dtype as x.
    """
    return _fused_ada_block_impl(x, gamma1, beta1, gamma2, beta2, params,
                                 num_heads, eps, branch_masks)


def _fused_ada_block_impl(x, gamma1, beta1, gamma2, beta2, params,
                          num_heads, eps, branch_masks):
    B, N, C = x.shape
    dtype = x.dtype
    wqkv, bqkv, wproj, bproj, w1, bb1, w2, bb2 = params
    hid = w1.shape[1]

    Np, mask = _pad_tokens(N)
    xp = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0))) if Np != N else x
    x2 = xp.reshape(B * Np, C)

    if branch_masks is None:
        ones = jnp.ones((B, 1), jnp.float32)
        m1c = m2c = ones
    else:
        m1c = branch_masks[0].astype(jnp.float32).reshape(B, 1)
        m2c = branch_masks[1].astype(jnp.float32).reshape(B, 1)

    def v(a):
        return a.astype(jnp.float32).reshape(1, -1)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((Np, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # Per-clip conditioning/mask vectors as [B, 1, C] / [B, 1, 1] arrays
    # with one [1, 1, ·] block per grid step: Mosaic requires the LAST TWO
    # block dims to match the array dims, so the clip axis must be the
    # leading (grid-indexed) one.
    clip = pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    mclip = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dh = C // num_heads
    flops = B * (2 * Np * C * 3 * C + num_heads * 4 * Np * Np * dh
                 + 2 * Np * C * C + 4 * Np * C * hid)

    def cvec(a):
        return a.astype(jnp.float32).reshape(B, 1, C)

    out = pl.pallas_call(
        functools.partial(_ada_block_kernel, num_heads=num_heads, eps=eps),
        grid=(B,),
        in_specs=[rows, clip, clip] + [full] * 4 + [clip, clip]
                 + [full] * 4 + [full, mclip, mclip],
        out_specs=rows,
        out_shape=jax.ShapeDtypeStruct((B * Np, C), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * Np * C * x2.dtype.itemsize,
            transcendentals=B * (num_heads * Np * Np + Np * hid),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2, cvec(gamma1), cvec(beta1),
      wqkv.astype(dtype), v(bqkv), wproj.astype(dtype), v(bproj),
      cvec(gamma2), cvec(beta2),
      w1.astype(dtype), v(bb1), w2.astype(dtype), v(bb2), mask,
      m1c.reshape(B, 1, 1), m2c.reshape(B, 1, 1))
    return out.reshape(B, Np, C)[:, :N]


def _fused_ada_block_fwd(x, gamma1, beta1, gamma2, beta2, params,
                         num_heads, eps, branch_masks):
    return (_fused_ada_block_impl(x, gamma1, beta1, gamma2, beta2, params,
                                  num_heads, eps, branch_masks),
            (x, gamma1, beta1, gamma2, beta2, params, branch_masks))


def _adaln_fwd_stats(xf, gamma, beta, eps):
    """AdaLN forward that also returns (u, inv, σ) for the backward —
    same single-pass stats / unbiased-σ / eps-outside math as
    :func:`_adaln_f32`."""
    C = xf.shape[-1]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = (jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean) \
        * (C / (C - 1))
    sigma = jnp.sqrt(var)
    inv = jnp.reciprocal(sigma + eps)
    u = xf - mean
    return gamma * (u * inv) + beta, u, inv, sigma


def _adaln_bwd_from_stats(dy, u, inv, sigma, gamma):
    """AdaLayerNorm backward given the forward's (u = x−μ, inv, σ).

    y = γ·u·inv + β with inv = 1/(σ+eps), σ = sqrt(Σu²/(C−1)):
      du = γdy·inv − u·(inv²·Σ(γdy·u)/((C−1)·σ));  dx = du − mean(du).
    σ is clamped away from 0 for all-zero (padding) rows, whose dy is
    zero anyway. dγ/dβ are per-CLIP sums (the caller's grid is per clip).
    """
    C = dy.shape[-1]
    dyg = dy * gamma
    sproj = jnp.sum(dyg * u, axis=-1, keepdims=True)
    ssafe = jnp.maximum(sigma, 1e-20)
    du = dyg * inv - u * (inv * inv * sproj * (1.0 / (C - 1.0)) / ssafe)
    dx = du - jnp.mean(du, axis=-1, keepdims=True)
    dgamma = jnp.sum(dy * (u * inv), axis=0, keepdims=True)
    dbeta = jnp.sum(dy, axis=0, keepdims=True)
    return dx, dgamma, dbeta


def _ada_block_bwd_kernel(x_ref, g_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref,
                          wproj_ref, bproj_ref, g2_ref, b2_ref, w1_ref,
                          bb1_ref, w2_ref, bb2_ref, mask_ref, m1_ref,
                          m2_ref, dx_ref, dg1_ref, db1_ref, dg2_ref,
                          db2_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                          dbproj_ref, dw1_ref, dbb1_ref, dw2_ref, dbb2_ref,
                          dm1_ref, dm2_ref, *, num_heads: int, eps: float):
    """Whole AdaLN-block backward, one clip per grid step (recompute in
    VMEM; see :func:`_block_bwd_kernel`). The AdaLN γ/β gradients are
    PER-CLIP row blocks (the conditioning is per clip); the weight
    gradients accumulate across the sequential grid."""
    i = pl.program_id(0)
    x = x_ref[:]
    dt = x.dtype
    xf = x.astype(jnp.float32)
    g1 = g1_ref[0]
    g2 = g2_ref[0]
    m1 = m1_ref[0]
    m2 = m2_ref[0]

    # ---- forward recompute with backward state ---------------------------
    h1f, u1, inv1, sig1 = _adaln_fwd_stats(xf, g1, b1_ref[0], eps)
    h1 = h1f.astype(dt)
    a, saved = _attn_fwd_save(h1, wqkv_ref[:], bqkv_ref[:], wproj_ref[:],
                              bproj_ref[:], mask_ref[:], num_heads)
    x1 = xf + a * m1
    h2f, u2, inv2, sig2 = _adaln_fwd_stats(x1, g2, b2_ref[0], eps)
    h2 = h2f.astype(dt)
    hh = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32) \
        + bb1_ref[:]
    ge = _gelu(hh, dt)
    mo = jnp.dot(ge, w2_ref[:], preferred_element_type=jnp.float32) \
        + bb2_ref[:]

    # ---- backward --------------------------------------------------------
    gy = g_ref[:].astype(jnp.float32)
    m2g = gy * m2
    dbb2 = jnp.sum(m2g, axis=0, keepdims=True)
    m2g_c = m2g.astype(dt)
    dw2 = jax.lax.dot_general(ge, m2g_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dge = jax.lax.dot_general(m2g_c, w2_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dhh = dge * _gelu_grad(hh, dt)
    dbb1 = jnp.sum(dhh, axis=0, keepdims=True)
    dhh_c = dhh.astype(dt)
    dw1 = jax.lax.dot_general(h2, dhh_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh2 = jax.lax.dot_general(dhh_c, w1_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx1_ln, dg2v, db2v = _adaln_bwd_from_stats(dh2, u2, inv2, sig2, g2)
    dx1 = gy + dx1_ln

    # Full-block (1,1,1) stores: Mosaic rejects scalar stores to VMEM
    # ("Cannot store scalars to VMEM"); interpret mode tolerated them, so
    # CPU tests passed while the kernel failed to lower on real TPU.
    dm2_ref[:] = jnp.sum(gy * mo, keepdims=True).reshape(1, 1, 1)
    dm1_ref[:] = jnp.sum(dx1 * a, keepdims=True).reshape(1, 1, 1)

    da = (dx1 * m1).astype(dt)
    dh1, dwqkv, dbqkv, dwproj, dbproj = _attn_bwd_saved(
        h1, da, saved, wqkv_ref[:], wproj_ref[:], num_heads)
    dx_ln, dg1v, db1v = _adaln_bwd_from_stats(dh1.astype(jnp.float32),
                                              u1, inv1, sig1, g1)
    dx_ref[:] = (dx1 + dx_ln).astype(dx_ref.dtype)

    # per-clip conditioning grads: [1, C] → this clip's [1, 1, C] block
    dg1_ref[0] = dg1v
    db1_ref[0] = db1v
    dg2_ref[0] = dg2v
    db2_ref[0] = db2v

    @pl.when(i == 0)
    def _init():
        dwqkv_ref[:], dbqkv_ref[:] = dwqkv, dbqkv
        dwproj_ref[:], dbproj_ref[:] = dwproj, dbproj
        dw1_ref[:], dbb1_ref[:] = dw1, dbb1
        dw2_ref[:], dbb2_ref[:] = dw2, dbb2

    @pl.when(i > 0)
    def _acc():
        dwqkv_ref[:] += dwqkv
        dbqkv_ref[:] += dbqkv
        dwproj_ref[:] += dwproj
        dbproj_ref[:] += dbproj
        dw1_ref[:] += dw1
        dbb1_ref[:] += dbb1
        dw2_ref[:] += dw2
        dbb2_ref[:] += dbb2


def _fused_ada_block_bwd(num_heads, eps, res, g):
    x, gamma1, beta1, gamma2, beta2, params, branch_masks = res
    B, N, C = x.shape
    dtype = x.dtype
    wqkv, bqkv, wproj, bproj, w1, bb1, w2, bb2 = params
    hid = w1.shape[1]

    Np, mask = _pad_tokens(N)
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, Np - N), (0, 0)))
    x2 = x.reshape(B * Np, C)
    g2rows = g.astype(dtype).reshape(B * Np, C)

    if branch_masks is None:
        ones = jnp.ones((B, 1), jnp.float32)
        m1c = m2c = ones
    else:
        m1c = branch_masks[0].astype(jnp.float32).reshape(B, 1)
        m2c = branch_masks[1].astype(jnp.float32).reshape(B, 1)

    def v(a):
        return a.astype(jnp.float32).reshape(1, -1)

    def cvec(a):
        return a.astype(jnp.float32).reshape(B, 1, C)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((Np, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    clip = pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    mclip = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dh = C // num_heads
    flops = B * 3 * (2 * Np * C * 3 * C + num_heads * 4 * Np * Np * dh
                     + 2 * Np * C * C + 4 * Np * C * hid)
    outs = pl.pallas_call(
        functools.partial(_ada_block_bwd_kernel, num_heads=num_heads,
                          eps=eps),
        grid=(B,),
        in_specs=[rows, rows, clip, clip] + [full] * 4 + [clip, clip]
                 + [full] * 4 + [full, mclip, mclip],
        out_specs=[rows, clip, clip, clip, clip,
                   acc((C, 3 * C)), acc((1, 3 * C)), acc((C, C)),
                   acc((1, C)), acc((C, hid)), acc((1, hid)),
                   acc((hid, C)), acc((1, C)), mclip, mclip],
        out_shape=[
            jax.ShapeDtypeStruct((B * Np, C), dtype),
            jax.ShapeDtypeStruct((B, 1, C), f32),
            jax.ShapeDtypeStruct((B, 1, C), f32),
            jax.ShapeDtypeStruct((B, 1, C), f32),
            jax.ShapeDtypeStruct((B, 1, C), f32),
            jax.ShapeDtypeStruct((C, 3 * C), f32),
            jax.ShapeDtypeStruct((1, 3 * C), f32),
            jax.ShapeDtypeStruct((C, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((C, hid), f32),
            jax.ShapeDtypeStruct((1, hid), f32),
            jax.ShapeDtypeStruct((hid, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((B, 1, 1), f32),
            jax.ShapeDtypeStruct((B, 1, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * B * Np * C * x2.dtype.itemsize,
            transcendentals=B * (num_heads * Np * Np + 2 * Np * hid),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2, g2rows, cvec(gamma1), cvec(beta1),
      wqkv.astype(dtype), v(bqkv), wproj.astype(dtype), v(bproj),
      cvec(gamma2), cvec(beta2),
      w1.astype(dtype), v(bb1), w2.astype(dtype), v(bb2), mask,
      m1c.reshape(B, 1, 1), m2c.reshape(B, 1, 1))
    (dx2, dg1, db1, dg2, db2, dwqkv, dbqkv, dwproj, dbproj,
     dw1, dbb1, dw2, dbb2, dm1c, dm2c) = outs

    dx = dx2.reshape(B, Np, C)[:, :N].astype(dtype)
    dparams = (
        dwqkv.astype(wqkv.dtype),
        dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
        dwproj.astype(wproj.dtype),
        dbproj.reshape(bproj.shape).astype(bproj.dtype),
        dw1.astype(w1.dtype),
        dbb1.reshape(bb1.shape).astype(bb1.dtype),
        dw2.astype(w2.dtype),
        dbb2.reshape(bb2.shape).astype(bb2.dtype),
    )
    if branch_masks is None:
        dmasks = None
    else:
        m1, m2 = branch_masks
        dmasks = (dm1c.reshape(m1.shape).astype(m1.dtype),
                  dm2c.reshape(m2.shape).astype(m2.dtype))
    return (dx,
            dg1.reshape(gamma1.shape).astype(gamma1.dtype),
            db1.reshape(beta1.shape).astype(beta1.dtype),
            dg2.reshape(gamma2.shape).astype(gamma2.dtype),
            db2.reshape(beta2.shape).astype(beta2.dtype),
            dparams, dmasks)


fused_ada_block.defvjp(_fused_ada_block_fwd, _fused_ada_block_bwd)


# ---------------------------------------------------------------------------
# Fused cross-attention block (the decoder's CA+FFN halves): AdaLN on all
# three streams, cross-attention, AdaLN'd MLP, both residuals — one kernel
# per clip, forward AND whole-block backward. This was the last fully-XLA
# block in the decoder's TRAINING path (the serving path runs it inside the
# whole-chain kernel); reference CrossAttentionBlock,
# /root/reference/lib/models/CoevoDecoder.py:60-89.
# ---------------------------------------------------------------------------


def _ca_fwd_save(nq, nk, nv, wq, bq, wk, bk, wv, bv, wproj, bproj,
                 kv_mask, num_heads: int):
    """Cross-attention forward with the backward's stabilizer math;
    returns (a [Nq, Cq] f32, saved) for :func:`_ca_bwd_saved`."""
    Nq, C = nq.shape
    Nk, Cv = nv.shape
    dh = C // num_heads
    dv = Cv // num_heads
    scale = 1.0 / math.sqrt(dh)
    dt = nq.dtype
    q = (jnp.dot(nq, wq, preferred_element_type=jnp.float32)
         + bq).astype(dt)
    k = (jnp.dot(nk, wk, preferred_element_type=jnp.float32)
         + bk).astype(dt)
    v = (jnp.dot(nv, wv, preferred_element_type=jnp.float32)
         + bv).astype(dt)
    logmask = (kv_mask - 1.0) * jnp.float32(-_NEG_INF)    # [1, Nk]
    pns, os = [], []
    for hd in range(num_heads):
        q_h = jax.lax.slice(q, (0, hd * dh), (Nq, (hd + 1) * dh))
        k_h = jax.lax.slice(k, (0, hd * dh), (Nk, (hd + 1) * dh))
        v_h = jax.lax.slice(v, (0, hd * dv), (Nk, (hd + 1) * dv))
        s = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s + logmask, axis=-1, keepdims=True)
        p = jnp.exp(jnp.minimum(s - m, 0.0)) * kv_mask
        r = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        pn = p / r                                        # f32 [Nq, Nk]
        pns.append(pn)
        os.append(jnp.dot(pn.astype(dt), v_h,
                          preferred_element_type=jnp.float32))
    o_all = jnp.concatenate(os, -1).astype(dt)            # [Nq, Cv]
    a = jnp.dot(o_all, wproj, preferred_element_type=jnp.float32) + bproj
    return a, (q, k, v, pns, o_all)


def _ca_bwd_saved(da, saved, wproj, num_heads: int):
    """Gradient half of :func:`_ca_fwd_save`: returns (dq_all [Nq, Cq],
    dk_all [Nk, Cq], dv_all [Nk, Cv], dwproj, dbproj) — the projection
    backward (through wq/wk/wv and the AdaLNs) stays with the caller."""
    q, k, v, pns, o_all = saved
    Nq, C = q.shape
    Nk, Cv = v.shape
    dh = C // num_heads
    dv_w = Cv // num_heads
    scale = 1.0 / math.sqrt(dh)
    dt = q.dtype
    do = jax.lax.dot_general(da, wproj, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [Nq, Cv]
    do_c = do.astype(dt)
    dqs, dks, dvs = [], [], []
    for hd in range(num_heads):
        q_h = jax.lax.slice(q, (0, hd * dh), (Nq, (hd + 1) * dh))
        k_h = jax.lax.slice(k, (0, hd * dh), (Nk, (hd + 1) * dh))
        v_h = jax.lax.slice(v, (0, hd * dv_w), (Nk, (hd + 1) * dv_w))
        pn = pns[hd]
        pn_c = pn.astype(dt)
        do_h = jax.lax.slice(do_c, (0, hd * dv_w), (Nq, (hd + 1) * dv_w))
        dpn = jax.lax.dot_general(do_h, v_h, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dvh = jax.lax.dot_general(pn_c, do_h, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = pn * (dpn - jnp.sum(dpn * pn, axis=-1, keepdims=True))
        ds = (ds * scale).astype(dt)
        dqh = jnp.dot(ds, k_h, preferred_element_type=jnp.float32)
        dkh = jax.lax.dot_general(ds, q_h, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dqs.append(dqh)
        dks.append(dkh)
        dvs.append(dvh)
    dq_all = jnp.concatenate(dqs, -1)                     # f32 [Nq, C]
    dk_all = jnp.concatenate(dks, -1)                     # f32 [Nk, C]
    dv_all = jnp.concatenate(dvs, -1)                     # f32 [Nk, Cv]
    dwproj = jax.lax.dot_general(o_all, da, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dbproj = jnp.sum(da.astype(jnp.float32), axis=0, keepdims=True)
    return dq_all, dk_all, dv_all, dwproj, dbproj


def _ca_block_kernel(xq_ref, xk_ref, xv_ref, gq_ref, bgq_ref, gk_ref,
                     bgk_ref, gv_ref, bgv_ref, g2_ref, b2_ref,
                     wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                     wproj_ref, bproj_ref, w1_ref, bb1_ref, w2_ref,
                     bb2_ref, kvmask_ref, m1_ref, m2_ref, out_ref, *,
                     num_heads: int, eps: float):
    """Forward: xq + m1·CA(AdaLN(xq), AdaLN(xk), AdaLN(xv)) → x1;
    x1 + m2·MLP(AdaLN(x1)) — one clip per grid step."""
    xq = xq_ref[:]
    dt = xq.dtype
    xqf = xq.astype(jnp.float32)
    mxu = dt == jnp.bfloat16
    nq = _adaln_f32(xqf, gq_ref[0], bgq_ref[0], eps, mxu).astype(dt)
    nk = _adaln_f32(xk_ref[:].astype(jnp.float32), gk_ref[0], bgk_ref[0],
                    eps, mxu).astype(dt)
    nv = _adaln_f32(xv_ref[:].astype(jnp.float32), gv_ref[0], bgv_ref[0],
                    eps, mxu).astype(dt)
    a = _cross_attn_core(nq, nk, nv, wq_ref[:], bq_ref[:], wk_ref[:],
                         bk_ref[:], wv_ref[:], bv_ref[:], wproj_ref[:],
                         bproj_ref[:], kvmask_ref[:], num_heads)
    x1 = xqf + a * m1_ref[0]
    h2 = _adaln_f32(x1, g2_ref[0], b2_ref[0], eps, mxu).astype(dt)
    hh = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32) \
        + bb1_ref[:]
    hh = _gelu(hh, dt)
    mo = jnp.dot(hh, w2_ref[:], preferred_element_type=jnp.float32) \
        + bb2_ref[:]
    out_ref[:] = (x1 + mo * m2_ref[0]).astype(out_ref.dtype)


def _ca_block_bwd_kernel(xq_ref, xk_ref, xv_ref, g_ref, gq_ref, bgq_ref,
                         gk_ref, bgk_ref, gv_ref, bgv_ref, g2_ref, b2_ref,
                         wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                         wproj_ref, bproj_ref, w1_ref, bb1_ref, w2_ref,
                         bb2_ref, kvmask_ref, m1_ref, m2_ref,
                         dxq_ref, dxk_ref, dxv_ref,
                         dgq_ref, dbgq_ref, dgk_ref, dbgk_ref, dgv_ref,
                         dbgv_ref, dg2_ref, db2_ref,
                         dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref,
                         dbv_ref, dwproj_ref, dbproj_ref, dw1_ref,
                         dbb1_ref, dw2_ref, dbb2_ref, dm1_ref, dm2_ref, *,
                         num_heads: int, eps: float):
    """Whole CA-block backward, one clip per grid step (recompute in
    VMEM). Per-clip AdaLN γ/β gradients for all four norms; weight
    gradients accumulate across the grid."""
    i = pl.program_id(0)
    xq = xq_ref[:]
    dt = xq.dtype
    xqf = xq.astype(jnp.float32)
    xkf = xk_ref[:].astype(jnp.float32)
    xvf = xv_ref[:].astype(jnp.float32)
    m1 = m1_ref[0]
    m2 = m2_ref[0]

    # ---- forward recompute with backward state ---------------------------
    nqf, uq, invq, sigq = _adaln_fwd_stats(xqf, gq_ref[0], bgq_ref[0], eps)
    nkf, uk, invk, sigk = _adaln_fwd_stats(xkf, gk_ref[0], bgk_ref[0], eps)
    nvf, uv, invv, sigv = _adaln_fwd_stats(xvf, gv_ref[0], bgv_ref[0], eps)
    nq = nqf.astype(dt)
    nk = nkf.astype(dt)
    nv = nvf.astype(dt)
    a, saved = _ca_fwd_save(nq, nk, nv, wq_ref[:], bq_ref[:], wk_ref[:],
                            bk_ref[:], wv_ref[:], bv_ref[:], wproj_ref[:],
                            bproj_ref[:], kvmask_ref[:], num_heads)
    x1 = xqf + a * m1
    h2f, u2, inv2, sig2 = _adaln_fwd_stats(x1, g2_ref[0], b2_ref[0], eps)
    h2 = h2f.astype(dt)
    hh = jnp.dot(h2, w1_ref[:], preferred_element_type=jnp.float32) \
        + bb1_ref[:]
    ge = _gelu(hh, dt)
    mo = jnp.dot(ge, w2_ref[:], preferred_element_type=jnp.float32) \
        + bb2_ref[:]

    # ---- backward --------------------------------------------------------
    gy = g_ref[:].astype(jnp.float32)
    m2g = gy * m2
    dbb2 = jnp.sum(m2g, axis=0, keepdims=True)
    m2g_c = m2g.astype(dt)
    dw2 = jax.lax.dot_general(ge, m2g_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dge = jax.lax.dot_general(m2g_c, w2_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dhh = dge * _gelu_grad(hh, dt)
    dbb1 = jnp.sum(dhh, axis=0, keepdims=True)
    dhh_c = dhh.astype(dt)
    dw1 = jax.lax.dot_general(h2, dhh_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh2 = jax.lax.dot_general(dhh_c, w1_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx1_ln, dg2v, db2v = _adaln_bwd_from_stats(dh2, u2, inv2, sig2,
                                               g2_ref[0])
    dx1 = gy + dx1_ln

    # Full-block (1,1,1) stores: Mosaic rejects scalar stores to VMEM
    # ("Cannot store scalars to VMEM"); interpret mode tolerated them, so
    # CPU tests passed while the kernel failed to lower on real TPU.
    dm2_ref[:] = jnp.sum(gy * mo, keepdims=True).reshape(1, 1, 1)
    dm1_ref[:] = jnp.sum(dx1 * a, keepdims=True).reshape(1, 1, 1)

    da = (dx1 * m1).astype(dt)
    dq_all, dk_all, dv_all, dwproj, dbproj = _ca_bwd_saved(
        da, saved, wproj_ref[:], num_heads)

    dq_c = dq_all.astype(dt)
    dk_c = dk_all.astype(dt)
    dv_c = dv_all.astype(dt)
    dwq = jax.lax.dot_general(nq, dq_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwk = jax.lax.dot_general(nk, dk_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwv = jax.lax.dot_general(nv, dv_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbq = jnp.sum(dq_all, axis=0, keepdims=True)
    dbk = jnp.sum(dk_all, axis=0, keepdims=True)
    dbv = jnp.sum(dv_all, axis=0, keepdims=True)
    dnq = jax.lax.dot_general(dq_c, wq_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dnk = jax.lax.dot_general(dk_c, wk_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dnv = jax.lax.dot_general(dv_c, wv_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    dxq_ln, dgqv, dbgqv = _adaln_bwd_from_stats(dnq, uq, invq, sigq,
                                                gq_ref[0])
    dxk_ln, dgkv, dbgkv = _adaln_bwd_from_stats(dnk, uk, invk, sigk,
                                                gk_ref[0])
    dxv_ln, dgvv, dbgvv = _adaln_bwd_from_stats(dnv, uv, invv, sigv,
                                                gv_ref[0])
    dxq_ref[:] = (dx1 + dxq_ln).astype(dxq_ref.dtype)
    dxk_ref[:] = dxk_ln.astype(dxk_ref.dtype)
    dxv_ref[:] = dxv_ln.astype(dxv_ref.dtype)

    dgq_ref[0] = dgqv
    dbgq_ref[0] = dbgqv
    dgk_ref[0] = dgkv
    dbgk_ref[0] = dbgkv
    dgv_ref[0] = dgvv
    dbgv_ref[0] = dbgvv
    dg2_ref[0] = dg2v
    db2_ref[0] = db2v

    @pl.when(i == 0)
    def _init():
        dwq_ref[:], dbq_ref[:] = dwq, dbq
        dwk_ref[:], dbk_ref[:] = dwk, dbk
        dwv_ref[:], dbv_ref[:] = dwv, dbv
        dwproj_ref[:], dbproj_ref[:] = dwproj, dbproj
        dw1_ref[:], dbb1_ref[:] = dw1, dbb1
        dw2_ref[:], dbb2_ref[:] = dw2, dbb2

    @pl.when(i > 0)
    def _acc():
        dwq_ref[:] += dwq
        dbq_ref[:] += dbq
        dwk_ref[:] += dwk
        dbk_ref[:] += dbk
        dwv_ref[:] += dwv
        dbv_ref[:] += dbv
        dwproj_ref[:] += dwproj
        dbproj_ref[:] += dbproj
        dw1_ref[:] += dw1
        dbb1_ref[:] += dbb1
        dw2_ref[:] += dw2
        dbb2_ref[:] += dbb2


def ca_block_reference(xq, xk, xv, gammas, betas, params, num_heads,
                       eps=1e-6, branch_masks=None):
    """Pure-XLA reference of the fused CA block (VJP recompute was never
    needed — the backward is a kernel — but this is the test oracle).

    gammas/betas: 4-tuples of [B, C*] per-clip AdaLN vectors
    (q, k, v, post); params: 12-tuple (wq,bq,wk,bk,wv,bv,wproj,bproj,
    w1,bb1,w2,bb2)."""
    (wq, bq, wk, bk, wv, bv, wproj, bproj, w1, bb1, w2, bb2) = params
    m1, m2 = branch_masks if branch_masks is not None else (1.0, 1.0)
    dt = xq.dtype
    xqf = xq.astype(jnp.float32)

    def adaln(x, g, b):
        return _adaln_f32(x.astype(jnp.float32), g[:, None, :],
                          b[:, None, :], eps)

    nq = adaln(xq, gammas[0], betas[0]).astype(dt)
    nk = adaln(xk, gammas[1], betas[1]).astype(dt)
    nv = adaln(xv, gammas[2], betas[2]).astype(dt)
    B, Nq, C = xq.shape
    M = xk.shape[1]
    Cv = xv.shape[2]
    H = num_heads
    dh = C // H
    dv = Cv // H
    q = (nq @ wq.astype(dt) + bq.astype(dt)) \
        .reshape(B, Nq, H, dh).transpose(0, 2, 1, 3)
    k = (nk @ wk.astype(dt) + bk.astype(dt)) \
        .reshape(B, M, H, dh).transpose(0, 2, 1, 3)
    v = (nv @ wv.astype(dt) + bv.astype(dt)) \
        .reshape(B, M, H, dv).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(dh)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(dt), v)
    o = o.transpose(0, 2, 1, 3).reshape(B, Nq, Cv)
    a = (o @ wproj.astype(dt) + bproj.astype(dt)).astype(jnp.float32)
    x1 = xqf + a * m1
    h2 = adaln(x1, gammas[3], betas[3]).astype(dt)
    hh = (h2 @ w1.astype(dt)).astype(jnp.float32) + bb1
    hh = 0.5 * hh * (1.0 + jax.lax.erf(hh / math.sqrt(2.0)))
    mo = (hh.astype(dt) @ w2.astype(dt)).astype(jnp.float32) + bb2
    return (x1 + mo * m2).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_ca_block(xq, xk, xv, gammas, betas, params, num_heads,
                   eps=1e-6, branch_masks=None):
    """Fused conditioned cross-attention + FFN block.

    Args:
      xq: [B, Nq, Cq] query-stream tokens; xk: [B, Nk, Cq] key stream;
        xv: [B, Nk, Cv] value stream (any Nq/Nk — one clip per grid
        step, token rows padded and masked).
      gammas/betas: 4-tuples of per-clip AdaLN vectors [B, C*]
        (normq, normk, normv, norm2).
      params: (wq, bq, wk, bk, wv, bv, wproj, bproj, w1, bb1, w2, bb2).
      num_heads / eps: static config.
      branch_masks: None, or ([B,1,1], [B,1,1]) stochastic-depth scales.

    Returns:
      [B, Nq, Cq], dtype of xq.
    """
    return _fused_ca_block_impl(xq, xk, xv, gammas, betas, params,
                                num_heads, eps, branch_masks)


def _ca_pack(xq, xk, xv, gammas, betas, params, branch_masks):
    """Shared fwd/bwd packing: pad token rows, build the kv mask and the
    per-clip conditioning stacks."""
    B, Nq, Cq = xq.shape
    Nk = xk.shape[1]
    Cv = xv.shape[2]
    dtype = xq.dtype
    Nqp, _ = _pad_tokens(Nq)
    Nkp, _ = _pad_tokens(Nk)
    import numpy as np
    kvmask = jnp.asarray(
        (np.arange(Nkp) < Nk).astype("float32").reshape(1, Nkp))
    if Nqp != Nq:
        xq = jnp.pad(xq, ((0, 0), (0, Nqp - Nq), (0, 0)))
    if Nkp != Nk:
        xk = jnp.pad(xk, ((0, 0), (0, Nkp - Nk), (0, 0)))
        xv = jnp.pad(xv, ((0, 0), (0, Nkp - Nk), (0, 0)))
    if branch_masks is None:
        ones = jnp.ones((B, 1, 1), jnp.float32)
        m1c = m2c = ones
    else:
        m1c = branch_masks[0].astype(jnp.float32).reshape(B, 1, 1)
        m2c = branch_masks[1].astype(jnp.float32).reshape(B, 1, 1)

    def cvec(a):
        return a.astype(jnp.float32).reshape(B, 1, -1)

    def v(a):
        return a.astype(jnp.float32).reshape(1, -1)

    (wq, bq, wk, bk, wv, bv, wproj, bproj, w1, bb1, w2, bb2) = params
    weights = (wq.astype(dtype), v(bq), wk.astype(dtype), v(bk),
               wv.astype(dtype), v(bv), wproj.astype(dtype), v(bproj),
               w1.astype(dtype), v(bb1), w2.astype(dtype), v(bb2))
    conds = (cvec(gammas[0]), cvec(betas[0]), cvec(gammas[1]),
             cvec(betas[1]), cvec(gammas[2]), cvec(betas[2]),
             cvec(gammas[3]), cvec(betas[3]))
    return (xq.reshape(B * Nqp, Cq), xk.reshape(B * Nkp, Cq),
            xv.reshape(B * Nkp, Cv), conds, weights, kvmask, m1c, m2c,
            B, Nqp, Nkp, Cq, Cv)


def _fused_ca_block_impl(xq, xk, xv, gammas, betas, params, num_heads,
                         eps, branch_masks):
    Nq = xq.shape[1]
    dtype = xq.dtype
    (xq2, xk2, xv2, conds, weights, kvmask, m1c, m2c,
     B, Nqp, Nkp, Cq, Cv) = _ca_pack(xq, xk, xv, gammas, betas, params,
                                     branch_masks)
    hid = params[8].shape[1]
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    qrows = pl.BlockSpec((Nqp, Cq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    krows = pl.BlockSpec((Nkp, Cq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    vrows = pl.BlockSpec((Nkp, Cv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    clip = lambda C: pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    mclip = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dh = Cq // num_heads
    flops = B * (2 * (2 * Nqp + 2 * Nkp) * Cq * Cq
                 + num_heads * 4 * Nqp * Nkp * dh + 4 * Nqp * Cq * hid)
    cspecs = [clip(Cq), clip(Cq), clip(Cq), clip(Cq), clip(Cv), clip(Cv),
              clip(Cq), clip(Cq)]
    out = pl.pallas_call(
        functools.partial(_ca_block_kernel, num_heads=num_heads, eps=eps),
        grid=(B,),
        in_specs=[qrows, krows, vrows] + cspecs + [full] * 12
                 + [full, mclip, mclip],
        out_specs=qrows,
        out_shape=jax.ShapeDtypeStruct((B * Nqp, Cq), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * (Nqp * Cq + Nkp * (Cq + Cv))
            * xq2.dtype.itemsize,
            transcendentals=B * (num_heads * Nqp * Nkp + Nqp * hid),
        ),
        interpret=jax.default_backend() != "tpu",
    )(xq2, xk2, xv2, conds[0], conds[1], conds[2], conds[3], conds[4],
      conds[5], conds[6], conds[7], *weights, kvmask, m1c, m2c)
    return out.reshape(B, Nqp, Cq)[:, :Nq]


def _fused_ca_block_fwd(xq, xk, xv, gammas, betas, params, num_heads,
                        eps, branch_masks):
    return (_fused_ca_block_impl(xq, xk, xv, gammas, betas, params,
                                 num_heads, eps, branch_masks),
            (xq, xk, xv, gammas, betas, params, branch_masks))


def _fused_ca_block_bwd(num_heads, eps, res, g):
    xq, xk, xv, gammas, betas, params, branch_masks = res
    B, Nq, Cq = xq.shape
    Nk = xk.shape[1]
    Cv = xv.shape[2]
    dtype = xq.dtype
    (xq2, xk2, xv2, conds, weights, kvmask, m1c, m2c,
     _, Nqp, Nkp, _, _) = _ca_pack(xq, xk, xv, gammas, betas, params,
                                   branch_masks)
    if Nqp != Nq:
        g = jnp.pad(g, ((0, 0), (0, Nqp - Nq), (0, 0)))
    g2rows = g.astype(dtype).reshape(B * Nqp, Cq)
    hid = params[8].shape[1]

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    qrows = pl.BlockSpec((Nqp, Cq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    krows = pl.BlockSpec((Nkp, Cq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    vrows = pl.BlockSpec((Nkp, Cv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    clip = lambda C: pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    mclip = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dh = Cq // num_heads
    cspecs = [clip(Cq), clip(Cq), clip(Cq), clip(Cq), clip(Cv), clip(Cv),
              clip(Cq), clip(Cq)]
    flops = B * 3 * (2 * (2 * Nqp + 2 * Nkp) * Cq * Cq
                     + num_heads * 4 * Nqp * Nkp * dh
                     + 4 * Nqp * Cq * hid)
    outs = pl.pallas_call(
        functools.partial(_ca_block_bwd_kernel, num_heads=num_heads,
                          eps=eps),
        grid=(B,),
        in_specs=[qrows, krows, vrows, qrows] + cspecs + [full] * 12
                 + [full, mclip, mclip],
        out_specs=[qrows, krows, vrows] + cspecs
                  + [acc((Cq, Cq)), acc((1, Cq)), acc((Cq, Cq)),
                     acc((1, Cq)), acc((Cv, Cv)), acc((1, Cv)),
                     acc((Cv, Cq)), acc((1, Cq)), acc((Cq, hid)),
                     acc((1, hid)), acc((hid, Cq)), acc((1, Cq)),
                     mclip, mclip],
        out_shape=[
            jax.ShapeDtypeStruct((B * Nqp, Cq), dtype),
            jax.ShapeDtypeStruct((B * Nkp, Cq), dtype),
            jax.ShapeDtypeStruct((B * Nkp, Cv), dtype),
            jax.ShapeDtypeStruct((B, 1, Cq), f32),
            jax.ShapeDtypeStruct((B, 1, Cq), f32),
            jax.ShapeDtypeStruct((B, 1, Cq), f32),
            jax.ShapeDtypeStruct((B, 1, Cq), f32),
            jax.ShapeDtypeStruct((B, 1, Cv), f32),
            jax.ShapeDtypeStruct((B, 1, Cv), f32),
            jax.ShapeDtypeStruct((B, 1, Cq), f32),
            jax.ShapeDtypeStruct((B, 1, Cq), f32),
            jax.ShapeDtypeStruct((Cq, Cq), f32),
            jax.ShapeDtypeStruct((1, Cq), f32),
            jax.ShapeDtypeStruct((Cq, Cq), f32),
            jax.ShapeDtypeStruct((1, Cq), f32),
            jax.ShapeDtypeStruct((Cv, Cv), f32),
            jax.ShapeDtypeStruct((1, Cv), f32),
            jax.ShapeDtypeStruct((Cv, Cq), f32),
            jax.ShapeDtypeStruct((1, Cq), f32),
            jax.ShapeDtypeStruct((Cq, hid), f32),
            jax.ShapeDtypeStruct((1, hid), f32),
            jax.ShapeDtypeStruct((hid, Cq), f32),
            jax.ShapeDtypeStruct((1, Cq), f32),
            jax.ShapeDtypeStruct((B, 1, 1), f32),
            jax.ShapeDtypeStruct((B, 1, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * B * (Nqp * Cq + Nkp * (Cq + Cv))
            * xq2.dtype.itemsize,
            transcendentals=B * (num_heads * Nqp * Nkp + 2 * Nqp * hid),
        ),
        interpret=jax.default_backend() != "tpu",
    )(xq2, xk2, xv2, g2rows, conds[0], conds[1], conds[2], conds[3],
      conds[4], conds[5], conds[6], conds[7], *weights, kvmask, m1c, m2c)
    (dxq2, dxk2, dxv2, dgq, dbgq, dgk, dbgk, dgv, dbgv, dg2, db2,
     dwq, dbq, dwk, dbk, dwv, dbv, dwproj, dbproj, dw1, dbb1, dw2, dbb2,
     dm1c, dm2c) = outs

    (wq, bq, wk, bk, wv, bv, wproj, bproj, w1, bb1, w2, bb2) = params
    dxq = dxq2.reshape(B, Nqp, Cq)[:, :Nq].astype(dtype)
    dxk = dxk2.reshape(B, Nkp, Cq)[:, :Nk].astype(xk.dtype)
    dxv = dxv2.reshape(B, Nkp, Cv)[:, :Nk].astype(xv.dtype)
    dgammas = tuple(
        d.reshape(gm.shape).astype(gm.dtype)
        for d, gm in zip((dgq, dgk, dgv, dg2), gammas))
    dbetas = tuple(
        d.reshape(bt.shape).astype(bt.dtype)
        for d, bt in zip((dbgq, dbgk, dbgv, db2), betas))
    dparams = (
        dwq.astype(wq.dtype), dbq.reshape(bq.shape).astype(bq.dtype),
        dwk.astype(wk.dtype), dbk.reshape(bk.shape).astype(bk.dtype),
        dwv.astype(wv.dtype), dbv.reshape(bv.shape).astype(bv.dtype),
        dwproj.astype(wproj.dtype),
        dbproj.reshape(bproj.shape).astype(bproj.dtype),
        dw1.astype(w1.dtype), dbb1.reshape(bb1.shape).astype(bb1.dtype),
        dw2.astype(w2.dtype), dbb2.reshape(bb2.shape).astype(bb2.dtype),
    )
    if branch_masks is None:
        dmasks = None
    else:
        m1, m2 = branch_masks
        dmasks = (dm1c.reshape(m1.shape).astype(m1.dtype),
                  dm2c.reshape(m2.shape).astype(m2.dtype))
    return dxq, dxk, dxv, dgammas, dbetas, dparams, dmasks


fused_ca_block.defvjp(_fused_ca_block_fwd, _fused_ca_block_bwd)


# ---------------------------------------------------------------------------
# Fused GRU layer scan. The BiGRU's recurrent chain is the only part of the
# whole model that cannot parallelize over time (reference nn.GRU,
# /root/reference/lib/models/CoevoDecoder.py:216-229); under XLA each of the
# 16 steps re-reads the [H, 3H] recurrent weights from HBM and pays a
# dispatch. Here ONE kernel runs the whole scan: the weights load into VMEM
# once, the hidden state lives in a VMEM scratch across the (sequential)
# time grid, and each step is a single well-shaped [B, H] x [H, 3H] MXU
# matmul plus a VPU gate pass. Input projections stay outside (they are fat
# time-parallel matmuls XLA already runs at full tilt).
# ---------------------------------------------------------------------------


def _gru_scan_kernel(gi_ref, whh_ref, bhh_ref, ys_ref, h_ref):
    """One time step per (sequential) grid index; h_ref is the carry.

    Grid is (batch_tiles, T) with time iterating fastest; the carry
    re-initializes at t == 0 of every batch tile."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]                                          # [B, H] f32
    H = h.shape[-1]
    gh = jnp.dot(h.astype(whh_ref.dtype), whh_ref[:],
                 preferred_element_type=jnp.float32) + bhh_ref[:]
    gi = gi_ref[0].astype(jnp.float32)                    # [B, 3H]
    B = gi.shape[0]
    i_r = jax.lax.slice(gi, (0, 0), (B, H))
    i_z = jax.lax.slice(gi, (0, H), (B, 2 * H))
    i_n = jax.lax.slice(gi, (0, 2 * H), (B, 3 * H))
    h_r = jax.lax.slice(gh, (0, 0), (B, H))
    h_z = jax.lax.slice(gh, (0, H), (B, 2 * H))
    h_n = jax.lax.slice(gh, (0, 2 * H), (B, 3 * H))
    # torch gate math: n = tanh(i_n + r * h_n)  (bias inside the reset
    # product — matches models/layers.TorchGRUCell.step).
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    hn = (1.0 - z) * n + z * h
    h_ref[:] = hn
    ys_ref[0] = hn.astype(ys_ref.dtype)


def gru_layer_scan_reference(gi: jax.Array, whh: jax.Array,
                             bhh: jax.Array) -> jax.Array:
    """Pure-XLA scan with identical math (VJP recompute + test oracle).

    gi: [T, B, 3H] precomputed input-gate projections; whh: [H, 3H];
    bhh: [3H]. Returns hidden states [T, B, H] (h0 = 0)."""
    H = whh.shape[0]
    dt = gi.dtype

    def step(h, gi_t):
        gh = (h.astype(dt) @ whh.astype(dt)).astype(jnp.float32) \
            + bhh.astype(jnp.float32)
        gif = gi_t.astype(jnp.float32)
        i_r, i_z, i_n = jnp.split(gif, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        hn = (1.0 - z) * n + z * h
        return hn, hn

    h0 = jnp.zeros((gi.shape[1], H), jnp.float32)
    _, ys = jax.lax.scan(step, h0, gi)
    return ys.astype(dt)


@jax.custom_vjp
def fused_gru_layer(gi: jax.Array, whh: jax.Array,
                    bhh: jax.Array) -> jax.Array:
    """Whole GRU-layer scan in one Pallas kernel.

    Args:
      gi: [T, B, 3H] input-gate projections (B a multiple of 8).
      whh: [H, 3H] recurrent kernel (resident in VMEM for the whole scan —
        at H=1024 that is ~6.3 MB bf16, within the ~16 MB/core budget).
      bhh: [3H] recurrent bias.

    Returns:
      [T, B, H] hidden states, dtype of gi.
    """
    return _fused_gru_layer_impl(gi, whh, bhh)


def _gru_batch_tile(B: int) -> int:
    """Largest batch tile ≤256 dividing B: the [Bt, 3H] stream buffers plus
    the [H, 3H] weights must fit the ~16 MB VMEM budget at H=1024."""
    for bt in (256, 128, 64, 32, 16, 8):
        if B % bt == 0:
            return bt
    return B


def _fused_gru_layer_impl(gi, whh, bhh, reverse: bool = False):
    T, B, threeH = gi.shape
    H = threeH // 3
    dtype = gi.dtype
    Bt = _gru_batch_tile(B)

    if reverse:
        # Reversed-time scan via the index maps alone: grid step t reads
        # gi row T−1−t and writes ys row T−1−t, so both the input
        # reversal and the output re-reversal of a backward GRU direction
        # cost zero HBM copies (they were [T, B, ·] rev ops in XLA).
        step_block = pl.BlockSpec((1, Bt, 3 * H),
                                  lambda b, t: (T - 1 - t, b, 0),
                                  memory_space=pltpu.VMEM)
        out_block = pl.BlockSpec((1, Bt, H), lambda b, t: (T - 1 - t, b, 0),
                                 memory_space=pltpu.VMEM)
    else:
        step_block = pl.BlockSpec((1, Bt, 3 * H), lambda b, t: (t, b, 0),
                                  memory_space=pltpu.VMEM)
        out_block = pl.BlockSpec((1, Bt, H), lambda b, t: (t, b, 0),
                                 memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gru_scan_kernel,
        grid=(B // Bt, T),
        in_specs=[step_block, full, full],
        out_specs=out_block,
        out_shape=jax.ShapeDtypeStruct((T, B, H), dtype),
        scratch_shapes=[pltpu.VMEM((Bt, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=T * 2 * B * H * 3 * H,
            bytes_accessed=(gi.size + T * B * H) * gi.dtype.itemsize
            + whh.size * whh.dtype.itemsize,
            transcendentals=T * B * 3 * H,
        ),
        interpret=jax.default_backend() != "tpu",
    )(gi, whh.astype(dtype), bhh.astype(jnp.float32).reshape(1, -1))


def _gru_scan_save_kernel(gi_ref, whh_ref, bhh_ref, ys_ref, hprev_ref,
                          r_ref, z_ref, n_ref, hn_ref, h_ref):
    """Forward scan that ALSO saves per-step backward state: the f32
    entry hidden state and the gate activations (r, z, n, and the
    h_n pre-gate the reset product multiplies). Used only under
    differentiation — the serving primal keeps :func:`_gru_scan_kernel`.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]                                          # [B, H] f32
    H = h.shape[-1]
    hprev_ref[0] = h
    gh = jnp.dot(h.astype(whh_ref.dtype), whh_ref[:],
                 preferred_element_type=jnp.float32) + bhh_ref[:]
    gi = gi_ref[0].astype(jnp.float32)                    # [B, 3H]
    B = gi.shape[0]
    i_r = jax.lax.slice(gi, (0, 0), (B, H))
    i_z = jax.lax.slice(gi, (0, H), (B, 2 * H))
    i_n = jax.lax.slice(gi, (0, 2 * H), (B, 3 * H))
    h_r = jax.lax.slice(gh, (0, 0), (B, H))
    h_z = jax.lax.slice(gh, (0, H), (B, 2 * H))
    h_n = jax.lax.slice(gh, (0, 2 * H), (B, 3 * H))
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    hn = (1.0 - z) * n + z * h
    r_ref[0], z_ref[0], n_ref[0], hn_ref[0] = r, z, n, h_n
    h_ref[:] = hn
    ys_ref[0] = hn.astype(ys_ref.dtype)


def _gru_bwd_kernel(g_ref, hprev_ref, r_ref, z_ref, n_ref, hn_ref,
                    whht_ref, dgi_ref, dgh_ref, carry_ref):
    """Reverse-time scan of the GRU backward; carry_ref holds dL/dh_t.

    Grid (batch_tiles, T) with time fastest; index maps run time
    REVERSED (t_real = T−1−t), so the carry re-initializes at t == 0.
    Per step: gate backward (elementwise) + ONE [B, 3H] @ [3H, H] matmul
    for the recurrent grad — the XLA backward this replaces dispatches
    a recompute matmul, the recurrent matmul AND a small-K dwhh
    accumulation per step (dwhh/dbhh here happen outside, as one fat
    time-batched matmul over the saved states).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    dh = g_ref[0].astype(jnp.float32) + carry_ref[:]      # [B, H]
    h_prev = hprev_ref[0]
    r = r_ref[0]
    z = z_ref[0]
    n = n_ref[0]
    h_n = hn_ref[0]
    dz = dh * (h_prev - n)
    dn_pre = (dh * (1.0 - z)) * (1.0 - n * n)
    dr_pre = (dn_pre * h_n) * (r * (1.0 - r))
    dz_pre = dz * (z * (1.0 - z))
    dgi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
    dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
    dgi_ref[0] = dgi
    dgh_ref[0] = dgh
    carry_ref[:] = dh * z + jnp.dot(
        dgh.astype(whht_ref.dtype), whht_ref[:],
        preferred_element_type=jnp.float32)


def _fused_gru_layer_fwd(gi, whh, bhh):
    T, B, threeH = gi.shape
    H = threeH // 3
    dtype = gi.dtype
    Bt = min(_gru_batch_tile(B), 64)  # bwd-state blocks cap the tile

    step_block = pl.BlockSpec((1, Bt, 3 * H), lambda b, t: (t, b, 0),
                              memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, Bt, H), lambda b, t: (t, b, 0),
                             memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    ys, hprev, r, z, n, hn = pl.pallas_call(
        _gru_scan_save_kernel,
        grid=(B // Bt, T),
        in_specs=[step_block, full, full],
        out_specs=[out_block] * 6,
        out_shape=[jax.ShapeDtypeStruct((T, B, H), dtype)]
        + [jax.ShapeDtypeStruct((T, B, H), f32)] * 5,
        scratch_shapes=[pltpu.VMEM((Bt, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=T * 2 * B * H * 3 * H,
            bytes_accessed=(gi.size + 6 * T * B * H) * 4,
            transcendentals=T * B * 3 * H,
        ),
        interpret=jax.default_backend() != "tpu",
    )(gi, whh.astype(dtype), bhh.astype(jnp.float32).reshape(1, -1))
    return ys, (gi, whh, bhh, hprev, r, z, n, hn)


def _fused_gru_layer_bwd(res, g):
    """Pallas reverse-time scan over the forward's saved gate state; the
    weight gradients batch over all T·B steps OUTSIDE the kernel as two
    fat matmul/reduce ops (the XLA scan backward accumulated them with a
    small-K matmul per step)."""
    gi, whh, bhh, hprev, r, z, n, hn = res
    T, B, threeH = gi.shape
    H = threeH // 3
    dtype = gi.dtype
    Bt = min(_gru_batch_tile(B), 64)

    hstep = pl.BlockSpec((1, Bt, H), lambda b, t: (T - 1 - t, b, 0),
                         memory_space=pltpu.VMEM)
    gstep = pl.BlockSpec((1, Bt, 3 * H), lambda b, t: (T - 1 - t, b, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dgi, dgh = pl.pallas_call(
        _gru_bwd_kernel,
        grid=(B // Bt, T),
        in_specs=[hstep] * 6 + [full],
        out_specs=[gstep, gstep],
        out_shape=[jax.ShapeDtypeStruct((T, B, 3 * H), f32)] * 2,
        scratch_shapes=[pltpu.VMEM((Bt, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=T * 2 * B * 3 * H * H,
            bytes_accessed=(6 * T * B * H + 2 * T * B * 3 * H) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(g.astype(f32), hprev, r, z, n, hn,
      jnp.transpose(whh).astype(dtype))

    # Weight grads: one fat time-batched matmul / reduce (operands cast
    # to the compute dtype exactly as the forward cast them).
    dgh_c = dgh.reshape(T * B, 3 * H).astype(dtype)
    dwhh = jax.lax.dot_general(
        hprev.reshape(T * B, H).astype(dtype), dgh_c,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(whh.dtype)
    dbhh = jnp.sum(dgh.reshape(T * B, 3 * H), axis=0).astype(bhh.dtype)
    return dgi.astype(gi.dtype), dwhh, dbhh


fused_gru_layer.defvjp(_fused_gru_layer_fwd, _fused_gru_layer_bwd)


@jax.custom_vjp
def fused_gru_layer_rev(gi: jax.Array, whh: jax.Array,
                        bhh: jax.Array) -> jax.Array:
    """Backward-direction GRU-layer scan with zero reversal copies.

    Semantics: ``fused_gru_layer_rev(gi)[t] ==
    fused_gru_layer(gi[::-1])[T-1-t]`` — i.e. the backward direction of a
    BiGRU, with its output already back in forward time order. The primal
    folds both [T, B, ·] reversals into the kernel's BlockSpec index maps
    (grid step t reads/writes row T−1−t), which under XLA were two real
    HBM copies per layer per batch. The VJP delegates to the forward
    layer's machinery on explicitly reversed arrays — the training path
    keeps its measured backward kernels, only serving takes the zero-copy
    route."""
    return _fused_gru_layer_impl(gi, whh, bhh, reverse=True)


def _fused_gru_layer_rev_fwd(gi, whh, bhh):
    ys, res = _fused_gru_layer_fwd(jnp.flip(gi, 0), whh, bhh)
    return jnp.flip(ys, 0), res


def _fused_gru_layer_rev_bwd(res, g):
    dgi, dwhh, dbhh = _fused_gru_layer_bwd(res, jnp.flip(g, 0))
    return jnp.flip(dgi, 0), dwhh, dbhh


fused_gru_layer_rev.defvjp(_fused_gru_layer_rev_fwd,
                           _fused_gru_layer_rev_bwd)


# ---------------------------------------------------------------------------
# Fused CoevoBlock: the decoder's whole per-block token program — pos/Q/K
# embeds, BOTH cross-attention+FFN blocks (simultaneous update), BOTH
# conditioned self-attention+FFN blocks — in ONE kernel per clip
# (reference: /root/reference/lib/models/CoevoDecoder.py:133-191). The
# coordinate projections (3→dim and dim→3 heads) stay outside in f32 —
# they are the pinned-precision seams of the compute policy.
#
# Under XLA each CoevoBlock materializes ~20 intermediates per stream
# through HBM; here the joint (≤32 rows) and vertex (448 rows) streams
# stay VMEM-resident end to end.
# ---------------------------------------------------------------------------


def _cross_attn_core(q_in, k_in, v_in, wq, bq, wk, bk, wv, bv, wproj, bproj,
                     kv_mask, num_heads: int, fold_rowsum: bool = False):
    """Masked cross-attention on VMEM blocks; returns f32 [Nq, Cq].

    kv_mask: [1, Nk] 0/1 validity of the key/value rows (padding). The
    additive key mask is materialized once and shared by all heads; with
    the masked max as stabilizer no clamp or re-mask pass is needed."""
    Nq, C = q_in.shape
    Nk, Cv = v_in.shape
    dh = C // num_heads
    dv = Cv // num_heads
    scale = 1.0 / math.sqrt(dh)
    dt = q_in.dtype

    bf16 = dt == jnp.bfloat16
    qf = jnp.dot(q_in, wq, preferred_element_type=jnp.float32) + bq
    if bf16:
        # f32 scale on q before the single bf16 rounding — see _attn_core.
        qf = qf * jnp.float32(scale)
    q = qf.astype(dt)
    k = (jnp.dot(k_in, wk, preferred_element_type=jnp.float32)
         + bk).astype(dt)
    v = (jnp.dot(v_in, wv, preferred_element_type=jnp.float32)
         + bv).astype(dt)
    if bf16:
        maskb = kv_mask.astype(jnp.bfloat16)                  # [1, Nk]
        m = min(_merge_factor(num_heads, dh), _merge_factor(num_heads, dv))
        if m > 1:
            o = _merged_heads(q, k, v, maskb, num_heads, m).astype(dt)
            return jnp.dot(o, wproj,
                           preferred_element_type=jnp.float32) + bproj
        ones = _ones_col(Nk, jnp.bfloat16) if fold_rowsum else None
    else:
        logmask = (kv_mask - 1.0) * jnp.float32(-_NEG_INF)    # [1, Nk]
    outs = []
    for hd in range(num_heads):
        q_h = jax.lax.slice(q, (0, hd * dh), (Nq, (hd + 1) * dh))
        k_h = jax.lax.slice(k, (0, hd * dh), (Nk, (hd + 1) * dh))
        v_h = jax.lax.slice(v, (0, hd * dv), (Nk, (hd + 1) * dv))
        if bf16:
            # Minimal-pass [Nq, Nk] score stage (f32 scale pre-folded into
            # q above, one f32→bf16 convert, multiplicative post-exp mask,
            # row-sum on the AV matmul) — rationale in _attn_core.
            s = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jnp.exp(jnp.minimum(s.astype(jnp.bfloat16),
                                    jnp.bfloat16(30.0))) * maskb
            if fold_rowsum:
                o, r = _av_rowsum(p, v_h, ones)
            else:
                r = jnp.maximum(
                    jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
                    1e-30)
                o = jnp.dot(p, v_h, preferred_element_type=jnp.float32)
        else:
            s = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + logmask
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m).astype(dt)
            r = jnp.maximum(
                jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
                1e-30)
            o = jnp.dot(p, v_h, preferred_element_type=jnp.float32)
        outs.append(o * jnp.reciprocal(r))
    o = jnp.concatenate(outs, axis=-1).astype(dt)             # [Nq, Cv]
    return jnp.dot(o, wproj, preferred_element_type=jnp.float32) + bproj


def _ca_ffn_block(xq, k_in, v_in, g, b, w, kv_mask, num_heads, eps):
    """AdaLN'd cross-attention + FFN (CoevoDecoder.py:66-89) on VMEM
    blocks. ``g``/``b`` are 4 [1, C] AdaLN rows (normq/normk/normv/norm2);
    ``w`` = (wq,bq,wk,bk,wv,bv,wproj,bproj,w1,bb1,w2,bb2)."""
    (wq, bq, wk, bk, wv, bv, wproj, bproj, w1, bb1, w2, bb2) = w
    dt = xq.dtype
    xqf = xq.astype(jnp.float32)
    mxu = dt == jnp.bfloat16
    nq = _adaln_f32(xqf, g[0], b[0], eps, mxu).astype(dt)
    nk = _adaln_f32(k_in.astype(jnp.float32), g[1], b[1], eps, mxu).astype(dt)
    nv = _adaln_f32(v_in.astype(jnp.float32), g[2], b[2], eps, mxu).astype(dt)
    a = _cross_attn_core(nq, nk, nv, wq, bq, wk, bk, wv, bv, wproj, bproj,
                         kv_mask, num_heads, fold_rowsum=True)
    x1 = xqf + a
    h = _adaln_f32(x1, g[3], b[3], eps, mxu).astype(dt)
    hh = jnp.dot(h, w1, preferred_element_type=jnp.float32) + bb1
    hh = _gelu(hh, dt)
    mo = jnp.dot(hh, w2, preferred_element_type=jnp.float32) + bb2
    return x1 + mo


def _sa_ffn_block(x, g, b, w, mask, num_heads, eps):
    """AdaLN'd self-attention + FFN (= the fused_ada_block math) on a VMEM
    block; ``g``/``b`` are 2 AdaLN rows, ``w`` = (wqkv,bqkv,wproj,bproj,
    w1,bb1,w2,bb2). Returns f32."""
    (wqkv, bqkv, wproj, bproj, w1, bb1, w2, bb2) = w
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mxu = dt == jnp.bfloat16
    h1 = _adaln_f32(xf, g[0], b[0], eps, mxu).astype(dt)
    a = _attn_core(h1, wqkv, bqkv, wproj, bproj, mask, num_heads)
    x1 = xf + a
    h2 = _adaln_f32(x1, g[1], b[1], eps, mxu).astype(dt)
    hh = jnp.dot(h2, w1, preferred_element_type=jnp.float32) + bb1
    hh = _gelu(hh, dt)
    mo = jnp.dot(hh, w2, preferred_element_type=jnp.float32) + bb2
    return x1 + mo


# Slot order of the packed per-clip AdaLN γ/β stacks ([B, 12, C]).
_COEVO_SLOTS = (
    "ca_j.normq", "ca_j.normk", "ca_j.normv", "ca_j.norm2",
    "ca_v.normq", "ca_v.normk", "ca_v.normv", "ca_v.norm2",
    "sa_j.norm1", "sa_j.norm2", "sa_v.norm1", "sa_v.norm2",
)


def _coevo_kernel(jf_ref, vf_ref, gam_ref, bet_ref,
                  jpos_ref, vpos_ref, jQ_ref, vQ_ref, v2jK_ref, j2vK_ref,
                  wv2j_ref, bv2j_ref, wj2v_ref, bj2v_ref,
                  *rest, num_heads_j: int, num_heads_v: int, eps: float):
    caj_refs = rest[0:12]
    cav_refs = rest[12:24]
    saj_refs = rest[24:32]
    sav_refs = rest[32:40]
    jmask_sq_ref, vmask_sq_ref, jmask_row_ref, vmask_row_ref = rest[40:44]
    jout_ref, vout_ref = rest[44:46]

    dt = jf_ref.dtype
    g = gam_ref[0]                                            # [12, C]
    b = bet_ref[0]
    C = g.shape[-1]

    def gb(*slots):
        gs = [jax.lax.slice(g, (s, 0), (s + 1, C)) for s in slots]
        bs = [jax.lax.slice(b, (s, 0), (s + 1, C)) for s in slots]
        return gs, bs

    jf = (jf_ref[:].astype(jnp.float32) + jpos_ref[:]).astype(dt)
    vf = (vf_ref[:].astype(jnp.float32) + vpos_ref[:]).astype(dt)
    v_as_j = (jnp.dot(vf, wv2j_ref[:], preferred_element_type=jnp.float32)
              + bv2j_ref[:] + v2jK_ref[:]).astype(dt)
    j_as_v = (jnp.dot(jf, wj2v_ref[:], preferred_element_type=jnp.float32)
              + bj2v_ref[:] + j2vK_ref[:]).astype(dt)
    jq = (jf.astype(jnp.float32) + jQ_ref[:]).astype(dt)
    vq = (vf.astype(jnp.float32) + vQ_ref[:]).astype(dt)

    gs, bs = gb(0, 1, 2, 3)
    joint1 = _ca_ffn_block(jq, v_as_j, vf, gs, bs,
                           tuple(r[:] for r in caj_refs),
                           vmask_row_ref[:], num_heads_j, eps)
    gs, bs = gb(4, 5, 6, 7)
    vertx1 = _ca_ffn_block(vq, j_as_v, jf, gs, bs,
                           tuple(r[:] for r in cav_refs),
                           jmask_row_ref[:], num_heads_v, eps)

    gs, bs = gb(8, 9)
    joint2 = _sa_ffn_block(joint1.astype(dt), gs, bs,
                           tuple(r[:] for r in saj_refs),
                           jmask_sq_ref[:], num_heads_j, eps)
    gs, bs = gb(10, 11)
    vertx2 = _sa_ffn_block(vertx1.astype(dt), gs, bs,
                           tuple(r[:] for r in sav_refs),
                           vmask_sq_ref[:], num_heads_v, eps)

    jout_ref[:] = joint2.astype(jout_ref.dtype)
    vout_ref[:] = vertx2.astype(vout_ref.dtype)


def coevo_block_reference(jf0, vf0, gammas, betas, params,
                          num_heads_j=8, num_heads_v=2, eps=1e-6):
    """Pure-XLA reference of the fused CoevoBlock token program (VJP +
    test oracle). jf0/vf0: [B, J, C]/[B, V, C] post-projection features;
    gammas/betas: [B, 12, C] AdaLN stacks in _COEVO_SLOTS order."""
    (jpos, vpos, jQ, vQ, v2jK, j2vK, wv2j, bv2j, wj2v, bj2v,
     ca_j, ca_v, sa_j, sa_v) = params
    dt = jf0.dtype

    def adaln(x, slot):
        return _adaln_f32(x.astype(jnp.float32),
                          gammas[:, slot][:, None, :],
                          betas[:, slot][:, None, :], eps).astype(dt)

    def ca_ffn(xq, k_in, v_in, w, s0, heads):
        (wq, bq, wk, bk, wv, bv, wproj, bproj, w1, bb1, w2, bb2) = w
        B, Nq, C = xq.shape
        Nk, Cv = v_in.shape[1], v_in.shape[2]
        dh, dv = C // heads, Cv // heads
        q = (adaln(xq, s0) @ wq.astype(dt)) + bq.astype(dt)
        k = (adaln(k_in, s0 + 1) @ wk.astype(dt)) + bk.astype(dt)
        v = (adaln(v_in, s0 + 2) @ wv.astype(dt)) + bv.astype(dt)
        q = q.reshape(B, Nq, heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, Nk, heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, Nk, heads, dv).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / math.sqrt(dh)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(dt), v)
        o = o.transpose(0, 2, 1, 3).reshape(B, Nq, Cv)
        a = (o @ wproj.astype(dt)).astype(jnp.float32) + bproj
        x1 = xq.astype(jnp.float32) + a
        h = adaln(x1, s0 + 3)
        hh = (h @ w1.astype(dt)).astype(jnp.float32) + bb1
        hh = 0.5 * hh * (1.0 + jax.lax.erf(hh / math.sqrt(2.0)))
        mo = (hh.astype(dt) @ w2.astype(dt)).astype(jnp.float32) + bb2
        return x1 + mo

    def sa_ffn(x, w, s0, heads):
        (wqkv, bqkv, wproj, bproj, w1, bb1, w2, bb2) = w
        h1 = adaln(x, s0)
        a = mhsa_reference(h1, wqkv, bqkv, wproj, bproj, heads)
        x1 = x.astype(jnp.float32) + a.astype(jnp.float32)
        h2 = adaln(x1, s0 + 1)
        hh = (h2 @ w1.astype(dt)).astype(jnp.float32) + bb1
        hh = 0.5 * hh * (1.0 + jax.lax.erf(hh / math.sqrt(2.0)))
        mo = (hh.astype(dt) @ w2.astype(dt)).astype(jnp.float32) + bb2
        return x1 + mo

    jf = (jf0.astype(jnp.float32) + jpos[None]).astype(dt)
    vf = (vf0.astype(jnp.float32) + vpos[None]).astype(dt)
    v_as_j = ((vf @ wv2j.astype(dt)).astype(jnp.float32)
              + bv2j + v2jK[None]).astype(dt)
    j_as_v = ((jf @ wj2v.astype(dt)).astype(jnp.float32)
              + bj2v + j2vK[None]).astype(dt)
    jq = (jf.astype(jnp.float32) + jQ[None]).astype(dt)
    vq = (vf.astype(jnp.float32) + vQ[None]).astype(dt)

    joint1 = ca_ffn(jq, v_as_j, vf, ca_j, 0, num_heads_j)
    vertx1 = ca_ffn(vq, j_as_v, jf, ca_v, 4, num_heads_v)
    joint2 = sa_ffn(joint1.astype(dt), sa_j, 8, num_heads_j)
    vertx2 = sa_ffn(vertx1.astype(dt), sa_v, 10, num_heads_v)
    return joint2.astype(dt), vertx2.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_coevo_block(jf0, vf0, gammas, betas, params,
                      num_heads_j=8, num_heads_v=2, eps=1e-6):
    """Whole CoevoBlock token program, one kernel per clip.

    Args:
      jf0: [B, J, C] joint features (3→C projection applied outside).
      vf0: [B, V, C] vertex features.
      gammas/betas: [B, 12, C] per-clip AdaLN stacks (_COEVO_SLOTS order).
      params: tuple (joint_pos [J,C], vertx_pos [V,C], jQ, vQ,
        v2jK [V,C], j2vK [J,C], wv2j [C,C], bv2j, wj2v, bj2v,
        ca_j 12-tuple, ca_v 12-tuple, sa_j 8-tuple, sa_v 8-tuple).

    Returns:
      (joint_feat [B, J, C], vertx_feat [B, V, C]) — post-SA features;
      the dim→3 coordinate heads apply outside in f32.
    """
    return _fused_coevo_impl(jf0, vf0, gammas, betas, params,
                             num_heads_j, num_heads_v, eps)


def _fused_coevo_impl(jf0, vf0, gammas, betas, params,
                      num_heads_j, num_heads_v, eps):
    B, J, C = jf0.shape
    V = vf0.shape[1]
    dtype = jf0.dtype
    (jpos, vpos, jQ, vQ, v2jK, j2vK, wv2j, bv2j, wj2v, bj2v,
     ca_j, ca_v, sa_j, sa_v) = params

    Jp, jmask_sq = _pad_tokens(J)
    Vp, vmask_sq = _pad_tokens(V)
    jmask_row = jmask_sq[:1]                                  # [1, Jp]
    vmask_row = vmask_sq[:1]

    def padrows(a, n):                                        # [N,C]→[n,C]
        return jnp.pad(a, ((0, n - a.shape[0]), (0, 0))) \
            if a.shape[0] != n else a

    jf2 = (jnp.pad(jf0, ((0, 0), (0, Jp - J), (0, 0)))
           if Jp != J else jf0).reshape(B * Jp, C)
    vf2 = (jnp.pad(vf0, ((0, 0), (0, Vp - V), (0, 0)))
           if Vp != V else vf0).reshape(B * Vp, C)

    def v(a):
        return a.astype(jnp.float32).reshape(1, -1)

    def wt(a):
        return a.astype(dtype)

    def ca_pack(w):
        (wq, bq, wk, bk, wv_, bv_, wproj, bproj, w1, bb1, w2, bb2) = w
        return [wt(wq), v(bq), wt(wk), v(bk), wt(wv_), v(bv_),
                wt(wproj), v(bproj), wt(w1), v(bb1), wt(w2), v(bb2)]

    def sa_pack(w):
        (wqkv, bqkv, wproj, bproj, w1, bb1, w2, bb2) = w
        return [wt(wqkv), v(bqkv), wt(wproj), v(bproj),
                wt(w1), v(bb1), wt(w2), v(bb2)]

    jrows = pl.BlockSpec((Jp, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vrows = pl.BlockSpec((Vp, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cstack = pl.BlockSpec((1, 12, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    hid = ca_j[8].shape[1]
    flops = B * (
        # dim projections + CA qkv/proj + CA mlp (both directions)
        2 * (Vp + Jp) * C * C * 4
        + num_heads_j * 4 * Jp * Vp * (C // num_heads_j) * 2
        + 4 * (Vp + Jp) * C * hid * 2
        # SA blocks
        + 2 * (Vp + Jp) * C * 4 * C
        + num_heads_j * 4 * Jp * Jp * (C // num_heads_j)
        + num_heads_v * 4 * Vp * Vp * (C // num_heads_v))

    inputs = ([jf2, vf2,
               gammas.astype(jnp.float32), betas.astype(jnp.float32),
               padrows(jpos.astype(jnp.float32), Jp),
               padrows(vpos.astype(jnp.float32), Vp),
               padrows(jQ.astype(jnp.float32), Jp),
               padrows(vQ.astype(jnp.float32), Vp),
               padrows(v2jK.astype(jnp.float32), Vp),
               padrows(j2vK.astype(jnp.float32), Jp),
               wt(wv2j), v(bv2j), wt(wj2v), v(bj2v)]
              + ca_pack(ca_j) + ca_pack(ca_v)
              + sa_pack(sa_j) + sa_pack(sa_v)
              + [jmask_sq, vmask_sq, jmask_row, vmask_row])
    jout, vout = pl.pallas_call(
        functools.partial(_coevo_kernel, num_heads_j=num_heads_j,
                          num_heads_v=num_heads_v, eps=eps),
        grid=(B,),
        in_specs=[jrows, vrows, cstack, cstack] + [full] * (10 + 40 + 4),
        out_specs=[jrows, vrows],
        out_shape=[jax.ShapeDtypeStruct((B * Jp, C), dtype),
                   jax.ShapeDtypeStruct((B * Vp, C), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * (jf2.size + vf2.size) * jf2.dtype.itemsize,
            transcendentals=B * (num_heads_j * Jp * (Vp + Jp)
                                 + num_heads_v * Vp * (Jp + Vp)
                                 + 2 * (Jp + Vp) * hid),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*inputs)
    return (jout.reshape(B, Jp, C)[:, :J],
            vout.reshape(B, Vp, C)[:, :V])


def _fused_coevo_fwd(jf0, vf0, gammas, betas, params,
                     num_heads_j, num_heads_v, eps):
    return (_fused_coevo_impl(jf0, vf0, gammas, betas, params,
                              num_heads_j, num_heads_v, eps),
            (jf0, vf0, gammas, betas, params))


def _fused_coevo_bwd(num_heads_j, num_heads_v, eps, res, g):
    jf0, vf0, gammas, betas, params = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, p: coevo_block_reference(
            a, b, c, d, p, num_heads_j, num_heads_v, eps),
        jf0, vf0, gammas, betas, params)
    return vjp(g)


fused_coevo_block.defvjp(_fused_coevo_fwd, _fused_coevo_bwd)


# ---------------------------------------------------------------------------
# Fused lifter trunk: ALL depth×(spatial, temporal) transformer blocks of
# the Stage-1 lifter in ONE kernel, one clip per grid step.
#
# Key observation: for a single video clip, both attention patterns act
# WITHIN the clip's [T, J] token grid — spatial attention couples tokens
# of the same frame (row-block-diagonal mask), temporal attention couples
# tokens of the same joint (stride-J mask). Laying the clip out as
# R = T·J = 304 rows turns the reference's rearranges
# (/root/reference/lib/models/PoseEstimation.py:85-107) into two STATIC
# masks, so the whole trunk — 6 blocks, shared norm_s/norm_t, the
# temporal pos-embed — runs without leaving VMEM: one HBM read and one
# write of x for the entire trunk, ~B grid steps instead of ~6·(B·T/G),
# and zero transposes.
# ---------------------------------------------------------------------------


def _lifter_masks(T: int, J: int):
    import numpy as np

    idx = np.arange(T * J)
    frame = idx // J
    joint = idx % J
    spatial = (frame[:, None] == frame[None, :]).astype("float32")
    temporal = (joint[:, None] == joint[None, :]).astype("float32")
    return jnp.asarray(spatial), jnp.asarray(temporal)


def _pre_norm_block(x, w, mask, num_heads, eps, G=1):
    """Pre-norm transformer block on a VMEM row block; returns dtype(x).

    With ``G`` > 1, ``x`` holds G clips' token rows stacked ([G·N, C]):
    the dense projections/MLP batch over all clips (fewer, fatter ops),
    while attention loops per clip against the single-clip ``mask``."""
    (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bb1, w2, bb2) = w
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mxu = dt == jnp.bfloat16
    h1 = _ln_f32(xf, g1, b1, eps, mxu).astype(dt)
    if G == 1:
        a = _attn_core(h1, wqkv, bqkv, wproj, bproj, mask, num_heads)
    else:
        a = _attn_core_cliploop(h1, wqkv, bqkv, wproj, bproj, mask,
                                num_heads, G)
    x1 = xf + a
    h2 = _ln_f32(x1, g2, b2, eps, mxu).astype(dt)
    hh = jnp.dot(h2, w1, preferred_element_type=jnp.float32) + bb1
    hh = _gelu(hh, dt)
    mo = jnp.dot(hh, w2, preferred_element_type=jnp.float32) + bb2
    return (x1 + mo).astype(dt)


def _lifter_trunk_kernel(x_ref, tpe_ref, smask_ref, tmask_ref, gs_ref,
                         bs_ref, gt_ref, bt_ref, *rest, depth: int,
                         num_heads: int, eps: float, G: int = 1):
    blk = [tuple(r[:] for r in rest[i * 12:(i + 1) * 12])
           for i in range(2 * depth)]
    out_ref = rest[2 * depth * 12]
    smask = smask_ref[:]
    tmask = tmask_ref[:]
    gs, bs = gs_ref[:], bs_ref[:]
    gt, bt = gt_ref[:], bt_ref[:]
    tpe = tpe_ref[:]                                      # [R, C] f32
    if G > 1:
        tpe = jnp.broadcast_to(tpe[None], (G,) + tpe.shape).reshape(
            G * tpe.shape[0], tpe.shape[1])

    x = x_ref[:]
    dt = x.dtype
    for i in range(depth):
        mxu = dt == jnp.bfloat16
        x = _pre_norm_block(x, blk[2 * i], smask, num_heads, eps, G)
        x = _ln_f32(x.astype(jnp.float32), gs, bs, eps, mxu).astype(dt)
        if i == 0:
            # Temporal pos-embed lands between the first spatial and
            # temporal blocks (SpaTemHead, PoseEstimation.py:86-90).
            x = (x.astype(jnp.float32) + tpe).astype(dt)
        x = _pre_norm_block(x, blk[2 * i + 1], tmask, num_heads, eps, G)
        x = _ln_f32(x.astype(jnp.float32), gt, bt, eps, mxu).astype(dt)
    out_ref[:] = x.astype(out_ref.dtype)


def lifter_trunk_reference(x, params, norm_s, norm_t, tpe, T, J, depth,
                           num_heads, eps=1e-6, attn_fn=None):
    """Pure-XLA reference of the trunk (VJP recompute + test oracle).

    x: [B, T·J, C] embedded tokens; params: 2·depth 12-tuples (spatial_0,
    temporal_0, spatial_1, ...); norm_s/norm_t: (scale, bias); tpe: [T, C]
    temporal pos-embed. Mirrors PoseLifter's loop via reshapes."""
    B, R, C = x.shape
    dt = x.dtype
    gs, bs = norm_s
    gt, bt = norm_t

    def block(x3, w, heads):
        (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bb1, w2, bb2) = w
        h = _ln_ref(x3, g1, b1, eps).astype(dt)
        if attn_fn is None:
            a = mhsa_reference(h, wqkv, bqkv, wproj, bproj, heads)
        else:
            a = attn_fn(h, wqkv, bqkv, wproj, bproj, heads)
        x1 = x3.astype(jnp.float32) + a.astype(jnp.float32)
        h2 = _ln_ref(x1, g2, b2, eps).astype(dt)
        hh = (h2 @ w1.astype(dt)).astype(jnp.float32) + bb1
        hh = 0.5 * hh * (1.0 + jax.lax.erf(hh / math.sqrt(2.0)))
        mo = (hh.astype(dt) @ w2.astype(dt)).astype(jnp.float32) + bb2
        return (x1 + mo).astype(dt)

    x = x.reshape(B, T, J, C)
    for i in range(depth):
        xs = block(x.reshape(B * T, J, C), params[2 * i], num_heads)
        xs = _ln_ref(xs, gs, bs, eps).astype(dt)
        x = xs.reshape(B, T, J, C)
        if i == 0:
            x = (x.astype(jnp.float32)
                 + tpe[None, :, None, :].astype(jnp.float32)).astype(dt)
        xt = x.transpose(0, 2, 1, 3).reshape(B * J, T, C)
        xt = block(xt, params[2 * i + 1], num_heads)
        xt = _ln_ref(xt, gt, bt, eps).astype(dt)
        x = xt.reshape(B, J, T, C).transpose(0, 2, 1, 3)
    return x.reshape(B, R, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_lifter_trunk(x, params, norm_s, norm_t, tpe, T, J, depth,
                       num_heads, eps=1e-6):
    """The whole lifter trunk in one kernel (see module comment).

    Args:
      x: [B, T·J, C] embedded tokens, (t, j) row order.
      params: tuple of 2·depth 12-tuples (spatial_i / temporal_i
        interleaved), each (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
        ln2_s, ln2_b, w_fc1, b_fc1, w_fc2, b_fc2).
      norm_s / norm_t: shared post-norm (scale, bias).
      tpe: [T, C] temporal pos-embed.
      T / J / depth / num_heads / eps: static config.

    Returns:
      [B, T·J, C] trunk output (pre-head), dtype of x.
    """
    return _fused_lifter_trunk_impl(x, params, norm_s, norm_t, tpe, T, J,
                                    depth, num_heads, eps)


def _fused_lifter_trunk_impl(x, params, norm_s, norm_t, tpe, T, J, depth,
                             num_heads, eps):
    B, R, C = x.shape
    dtype = x.dtype
    assert R == T * J and R % 8 == 0, (T, J, R)
    smask, tmask = _lifter_masks(T, J)
    if dtype == jnp.bfloat16:
        # Masks ride to VMEM in the compute dtype (halves footprint and
        # saves the in-kernel convert copy; see _attn_core's bf16 path).
        smask, tmask = smask.astype(dtype), tmask.astype(dtype)
    tpe_rows = jnp.repeat(tpe.astype(jnp.float32), J, axis=0)  # [R, C]

    def v(a):
        return a.astype(jnp.float32).reshape(1, -1)

    flat = []
    for w in params:
        (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, w1, bb1, w2, bb2) = w
        flat += [v(g1), v(b1), wqkv.astype(dtype), v(bqkv),
                 wproj.astype(dtype), v(bproj), v(g2), v(b2),
                 w1.astype(dtype), v(bb1), w2.astype(dtype), v(bb2)]

    # Clips per grid step: the dominant non-matmul cost is per-op issue
    # overhead, so dense/LN/MLP ops batch G clips ([G·R, C] rows) while
    # attention keeps per-clip [R, R] buffers (_attn_core_cliploop).
    # G=2 keeps peak VMEM (~6.3 MB weights + activations) under budget.
    G = int(os.environ.get("PMCE_TPU_TRUNK_G", "1"))
    while B % G:
        G //= 2
    G = max(G, 1)
    rows = pl.BlockSpec((G * R, C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    hid = params[0][8].shape[1]
    dh = C // num_heads
    flops = B * 2 * depth * (2 * R * C * 3 * C + num_heads * 4 * R * R * dh
                             + 2 * R * C * C + 4 * R * C * hid)
    out = pl.pallas_call(
        functools.partial(_lifter_trunk_kernel, depth=depth,
                          num_heads=num_heads, eps=eps, G=G),
        grid=(B // G,),
        in_specs=[rows] + [full] * (7 + len(flat)),
        out_specs=rows,
        out_shape=jax.ShapeDtypeStruct((B * R, C), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * R * C * x.dtype.itemsize,
            transcendentals=B * 2 * depth * (num_heads * R * R + R * hid),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x.reshape(B * R, C), tpe_rows, smask, tmask,
      v(norm_s[0]), v(norm_s[1]), v(norm_t[0]), v(norm_t[1]), *flat)
    return out.reshape(B, R, C)


def _fused_trunk_fwd(x, params, norm_s, norm_t, tpe, T, J, depth,
                     num_heads, eps):
    return (_fused_lifter_trunk_impl(x, params, norm_s, norm_t, tpe, T, J,
                                     depth, num_heads, eps),
            (x, params, norm_s, norm_t, tpe))


def _fused_trunk_bwd(T, J, depth, num_heads, eps, res, g):
    """Backward via the XLA chain with attention routed through fused_mhsa
    (Pallas attention backward carries the dominant cost)."""
    x, params, norm_s, norm_t, tpe = res
    _, vjp = jax.vjp(
        lambda x, p, ns, nt, tp: lifter_trunk_reference(
            x, p, ns, nt, tp, T, J, depth, num_heads, eps,
            attn_fn=lambda h, wq, bq, wp, bp, nh: fused_mhsa(
                h, wq, bq, wp, bp, nh)),
        x, params, norm_s, norm_t, tpe)
    return vjp(g)


fused_lifter_trunk.defvjp(_fused_trunk_fwd, _fused_trunk_bwd)
