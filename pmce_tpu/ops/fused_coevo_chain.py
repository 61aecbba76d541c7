"""Whole decoder-tail mega-kernel: ALL three CoevoBlocks + their f32
coordinate heads in ONE Pallas kernel, G clips per grid step.

Reference scope: /root/reference/lib/models/CoevoDecoder.py:133-254 — the
per-block loop (3→dim projections, pos/Q/K embeds, simultaneous bidirec-
tional cross-attention + FFN, conditioned self-attention + FFN, dim→3
coordinate heads with residuals, the original-joints-per-block quirk).

Why one kernel: under XLA the three blocks materialize ~60 small
[B, 431, 64]/[B, 19, 64] intermediates through HBM, several of which hit
pathological batched-matmul emitters (batch-in-lanes windowed convs, ~16×
slower than the flops demand). Here the joint (24-row) and vertex
(448-row) streams of G clips stay VMEM-resident across ALL THREE blocks
— one HBM read of the coordinates in, one write of the coordinates out.

Grouping strategy per attention pattern (G clips per grid step):
- dense ops (projections, MLPs) batch over the G·N stacked rows — this is
  where grouping pays: the joint stream alone goes from a 24-row (one
  fifth of an MXU tile) matmul per clip to G·24 rows;
- joint self-attention and both cross-attentions use ONE matmul over the
  stacked rows with a static block-diagonal clip mask (the score matrices
  are thin, so the G× redundant cross-clip entries are cheap);
- vertex self-attention ([448, 448] scores — G× redundancy would NOT be
  cheap) loops over clips with sublane slices, keeping per-clip buffers.

Coordinates ride in 8-lane-padded form ([*, 8], xyz in lanes 0-2) so the
3-wide projections/heads are well-formed tiles; the wrapper pads/strips.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pmce_tpu.ops.fused_attention import (
    _NEG_INF,
    _adaln_f32,
    _attn_core,
    _attn_core_cliploop,
    _cross_attn_core,
    _gelu,
    _pad_tokens,
    coevo_block_reference,
)

_COORD_LANES = 8  # xyz padded to a full sublane-tile lane group


def _expand_clip_rows(vec, G: int, N: int):
    """[G, C] per-clip vectors → [G·N, C] rows (broadcast, free reshape)."""
    return jnp.broadcast_to(vec[:, None, :],
                            (G, N, vec.shape[-1])).reshape(G * N, -1)


def _tile_clip_blocks(e, G: int):
    """[Np, C] shared-per-clip rows → [G·Np, C] (in-kernel broadcast; the
    embeds ride to VMEM untiled, G× smaller than pre-tiled inputs)."""
    return jnp.broadcast_to(e[None], (G,) + e.shape).reshape(
        G * e.shape[0], e.shape[1])


def _ca_ffn_grouped(xq, k_in, v_in, g, b, w, mask, num_heads, eps, G, Nq):
    """Grouped AdaLN'd cross-attention + FFN on stacked clip rows.

    ``g``/``b``: 4 per-clip [G, C] AdaLN vectors (normq/normk/normv/norm2);
    ``mask``: [G·Nq, G·Nk] block-diagonal 0/1; ``w`` as in _ca_ffn_block."""
    (wq, bq, wk, bk, wv, bv, wproj, bproj, w1, bb1, w2, bb2) = w
    dt = xq.dtype
    Nk = k_in.shape[0] // G
    xqf = xq.astype(jnp.float32)
    mxu = dt == jnp.bfloat16
    nq = _adaln_f32(xqf, _expand_clip_rows(g[0], G, Nq),
                    _expand_clip_rows(b[0], G, Nq), eps, mxu).astype(dt)
    nk = _adaln_f32(k_in.astype(jnp.float32),
                    _expand_clip_rows(g[1], G, Nk),
                    _expand_clip_rows(b[1], G, Nk), eps, mxu).astype(dt)
    nv = _adaln_f32(v_in.astype(jnp.float32),
                    _expand_clip_rows(g[2], G, Nk),
                    _expand_clip_rows(b[2], G, Nk), eps, mxu).astype(dt)
    # fold_rowsum: the joint-side CA sums softmax rows over G·448 = 1792
    # LANES — a deep VPU shuffle tree per head; folding it into the AV
    # matmul costs 8 extra lanes on an MXU op (see _av_rowsum).
    a = _cross_attn_core(nq, nk, nv, wq, bq, wk, bk, wv, bv, wproj, bproj,
                         mask, num_heads, fold_rowsum=True)
    x1 = xqf + a
    h = _adaln_f32(x1, _expand_clip_rows(g[3], G, Nq),
                   _expand_clip_rows(b[3], G, Nq), eps, mxu).astype(dt)
    hh = jnp.dot(h, w1, preferred_element_type=jnp.float32) + bb1
    hh = _gelu(hh, dt)
    mo = jnp.dot(hh, w2, preferred_element_type=jnp.float32) + bb2
    return x1 + mo


def _sa_ffn_grouped(x, g, b, w, num_heads, eps, G, N, attn):
    """Grouped AdaLN'd self-attention + FFN; ``attn(h)`` supplies the
    attention (block-diag-masked _attn_core or the clip-looped variant)."""
    (wqkv, bqkv, wproj, bproj, w1, bb1, w2, bb2) = w
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mxu = dt == jnp.bfloat16
    h1 = _adaln_f32(xf, _expand_clip_rows(g[0], G, N),
                    _expand_clip_rows(b[0], G, N), eps, mxu).astype(dt)
    x1 = xf + attn(h1, wqkv, bqkv, wproj, bproj)
    h2 = _adaln_f32(x1, _expand_clip_rows(g[1], G, N),
                    _expand_clip_rows(b[1], G, N), eps, mxu).astype(dt)
    hh = jnp.dot(h2, w1, preferred_element_type=jnp.float32) + bb1
    hh = _gelu(hh, dt)
    mo = jnp.dot(hh, w2, preferred_element_type=jnp.float32) + bb2
    return x1 + mo


def _chain_kernel(jc_ref, vc_ref, gam_ref, bet_ref,
                  jpos_ref, vpos_ref, jQ_ref, vQ_ref, v2jK_ref, j2vK_ref,
                  jsa_mask_ref, vsa_mask_ref, jca_mask_ref, vca_mask_ref,
                  *rest, num_blocks: int, num_heads_j: int, num_heads_v: int,
                  eps: float, G: int, Jp: int, Vp: int, dt):
    """One grid step: G clips through all ``num_blocks`` CoevoBlocks."""
    # rest: 12 stacked weight refs for the per-block glue
    # (wjp,bjp,wvp,bvp,wv2j,bv2j,wj2v,bj2v,whj,bhj,whv,bhv), then 12 CA_j,
    # 12 CA_v, 8 SA_j, 8 SA_v stacked refs, then the two outputs.
    glue = rest[0:12]
    caj = rest[12:24]
    cav = rest[24:36]
    saj = rest[36:44]
    sav = rest[44:52]
    jout_ref, vout_ref = rest[52:54]

    gam = gam_ref[:]                                      # [G, NB, 12, C]
    bet = bet_ref[:]
    jc = jc_ref[:].astype(jnp.float32)                    # [G·Jp, 8]
    vertx = vc_ref[:].astype(jnp.float32)                 # [G·Vp, 8]
    evo = jc

    for blk in range(num_blocks):
        (wjp, bjp, wvp, bvp, wv2j, bv2j, wj2v, bj2v,
         whj, bhj, whv, bhv) = (r[blk] for r in glue)
        caj_w = tuple(r[blk] for r in caj)
        cav_w = tuple(r[blk] for r in cav)
        saj_w = tuple(r[blk] for r in saj)
        sav_w = tuple(r[blk] for r in sav)
        g12 = gam[:, blk]                                 # [G, 12, C]
        b12 = bet[:, blk]

        # Two-step rounding (proj → dt, then +pos → dt) mirrors the
        # reference's cast points exactly (coevo_block_reference).
        jf0 = (jnp.dot(jc.astype(dt), wjp,
                       preferred_element_type=jnp.float32) + bjp).astype(dt)
        vf0 = (jnp.dot(vertx.astype(dt), wvp,
                       preferred_element_type=jnp.float32) + bvp).astype(dt)
        jf = (jf0.astype(jnp.float32)
              + _tile_clip_blocks(jpos_ref[blk], G)).astype(dt)
        vf = (vf0.astype(jnp.float32)
              + _tile_clip_blocks(vpos_ref[blk], G)).astype(dt)
        v_as_j = (jnp.dot(vf, wv2j, preferred_element_type=jnp.float32)
                  + bv2j + _tile_clip_blocks(v2jK_ref[blk], G)).astype(dt)
        j_as_v = (jnp.dot(jf, wj2v, preferred_element_type=jnp.float32)
                  + bj2v + _tile_clip_blocks(j2vK_ref[blk], G)).astype(dt)
        jq = (jf.astype(jnp.float32)
              + _tile_clip_blocks(jQ_ref[blk], G)).astype(dt)
        vq = (vf.astype(jnp.float32)
              + _tile_clip_blocks(vQ_ref[blk], G)).astype(dt)

        joint1 = _ca_ffn_grouped(
            jq, v_as_j, vf, [g12[:, s] for s in range(4)],
            [b12[:, s] for s in range(4)], caj_w,
            jca_mask_ref[:], num_heads_j, eps, G, Jp)
        vertx1 = _ca_ffn_grouped(
            vq, j_as_v, jf, [g12[:, 4 + s] for s in range(4)],
            [b12[:, 4 + s] for s in range(4)], cav_w,
            vca_mask_ref[:], num_heads_v, eps, G, Vp)

        joint2 = _sa_ffn_grouped(
            joint1.astype(dt), [g12[:, 8], g12[:, 9]],
            [b12[:, 8], b12[:, 9]], saj_w, num_heads_j, eps, G, Jp,
            attn=lambda h, wqkv, bqkv, wproj, bproj: _attn_core(
                h, wqkv, bqkv, wproj, bproj, jsa_mask_ref[:], num_heads_j,
                # fold_rowsum only reaches the per-head f32 path; under
                # the bf16 policy num_heads_j=8/dh=8 takes _attn_core's
                # merged-head branch, which always folds the row-sum into
                # the widened AV matmul and ignores this flag. For the
                # f32 per-head loop the unfolded [G·Jp, G·Jp] row-sum
                # stays cheaper (measured +1.1 ms with folding).
                fold_rowsum=False))
        vertx2 = _sa_ffn_grouped(
            vertx1.astype(dt), [g12[:, 10], g12[:, 11]],
            [b12[:, 10], b12[:, 11]], sav_w, num_heads_v, eps, G, Vp,
            attn=lambda h, wqkv, bqkv, wproj, bproj: _attn_core_cliploop(
                h, wqkv, bqkv, wproj, bproj, vsa_mask_ref[:], num_heads_v,
                G))

        # f32 coordinate heads + residuals (the pinned-precision seam).
        evo = jnp.dot(joint2, whj, preferred_element_type=jnp.float32) \
            + bhj + jc
        vertx = jnp.dot(vertx2, whv, preferred_element_type=jnp.float32) \
            + bhv + vertx

    jout_ref[:] = evo.astype(jout_ref.dtype)
    vout_ref[:] = vertx.astype(vout_ref.dtype)


def coevo_chain_reference(joints, vertx, gammas, betas, blocks,
                          num_heads_j=8, num_heads_v=2, eps=1e-6):
    """Pure-XLA reference of the whole chain (VJP recompute + test oracle).

    joints/vertx: [B, J, 3] / [B, V, 3] f32 coordinates (meters);
    gammas/betas: [B, NB, 12, C]; ``blocks``: per-block tuples
    (wjp, bjp, wvp, bvp, kernel_params_14tuple, whj, bhj, whv, bhv)
    where the 14-tuple is fused_coevo_block's ``params``. The compute
    dtype is taken from wjp (weights pre-cast by the caller).
    """
    evo = joints
    vx = vertx
    for blk, (wjp, bjp, wvp, bvp, kparams, whj, bhj, whv, bhv) \
            in enumerate(blocks):
        dt = wjp.dtype
        jf0 = (joints.astype(dt) @ wjp).astype(jnp.float32) + bjp
        vf0 = (vx.astype(dt) @ wvp).astype(jnp.float32) + bvp
        j2, v2 = coevo_block_reference(
            jf0.astype(dt), vf0.astype(dt), gammas[:, blk], betas[:, blk],
            kparams, num_heads_j, num_heads_v, eps)
        evo = (j2.astype(jnp.float32) @ whj.astype(jnp.float32)
               + bhj) + joints
        vx = (v2.astype(jnp.float32) @ whv.astype(jnp.float32)
              + bhv) + vx
    return evo, vx


def _pick_clip_group(B: int) -> int:
    for g in (4, 2):
        if B % g == 0:
            return g
    return 1


def _pad_coords(x, Np):
    """[B, N, 3] → [B·Np, 8] f32 (rows AND lanes padded)."""
    B, N, _ = x.shape
    x = jnp.pad(x.astype(jnp.float32),
                ((0, 0), (0, Np - N), (0, _COORD_LANES - 3)))
    return x.reshape(B * Np, _COORD_LANES)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_coevo_chain(joints, vertx, gammas, betas, blocks,
                      num_heads_j=8, num_heads_v=2, eps=1e-6):
    """All CoevoBlocks + coordinate heads in one kernel (module docstring).

    Args:
      joints: [B, J, 3] f32 lifted pose (meters) — re-consumed by every
        block (reference quirk).
      vertx: [B, V, 3] f32 initial coarse vertices.
      gammas/betas: [B, NB, 12, C] per-clip AdaLN stacks per block
        (fused_attention._COEVO_SLOTS order).
      blocks: per-block tuples (wjp, bjp, wvp, bvp, kernel_params_14tuple,
        whj, bhj, whv, bhv); the 14-tuple as in fused_coevo_block.

    Returns:
      (evo_pose [B, J, 3], vertx [B, V, 3]) f32.
    """
    return _chain_impl(joints, vertx, gammas, betas, blocks,
                       num_heads_j, num_heads_v, eps)


def _chain_impl(joints, vertx, gammas, betas, blocks,
                num_heads_j, num_heads_v, eps):
    B, J, _ = joints.shape
    V = vertx.shape[1]
    NB = len(blocks)
    C = gammas.shape[-1]
    # Compute dtype: the caller pre-casts the block weights (param trees
    # stay f32; gradients flow through the casts via the reference VJP).
    dt = blocks[0][0].dtype
    G = _pick_clip_group(B)
    Jp, _ = _pad_tokens(J)
    Vp, _ = _pad_tokens(V)

    # --- static masks -----------------------------------------------------
    vj = (np.arange(Jp) < J).astype("f")
    vv = (np.arange(Vp) < V).astype("f")
    cj = np.repeat(np.arange(G), Jp)
    cv = np.repeat(np.arange(G), Vp)
    vjg = np.tile(vj, G)
    vvg = np.tile(vv, G)

    # Masks ride to VMEM in the compute dtype: under bf16 that halves
    # their footprint AND saves the in-kernel f32→bf16 convert copy (the
    # [Vp, Vp] pair alone is ~1.1 MB of scoped VMEM at f32).
    mdt = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32

    def bd(cq, ck, vq, vk):
        return jnp.asarray(((cq[:, None] == ck[None, :])
                            * vq[:, None] * vk[None, :]).astype("f"), mdt)

    jsa_mask = bd(cj, cj, vjg, vjg)                       # [G·Jp, G·Jp]
    vsa_mask = jnp.asarray(vv[:, None] * vv[None, :], mdt)  # [Vp, Vp]
    jca_mask = bd(cj, cv, vjg, vvg)                       # [G·Jp, G·Vp]
    vca_mask = bd(cv, cj, vvg, vjg)                       # [G·Vp, G·Jp]

    # --- packing ----------------------------------------------------------
    def v(a):
        return a.astype(jnp.float32).reshape(1, -1)

    def vpad8(a):                                         # head bias → [1,8]
        return jnp.pad(a.astype(jnp.float32), (0, _COORD_LANES - 3)) \
            .reshape(1, -1)

    def wt(a):
        return a.astype(dt)

    def padrows_f32(a, n):
        a = a.astype(jnp.float32)
        return jnp.pad(a, ((0, n - a.shape[0]), (0, 0))) \
            if a.shape[0] != n else a


    def wpad_in(a):                                       # [3,C]→[8,C]
        return jnp.pad(wt(a), ((0, _COORD_LANES - 3), (0, 0)))

    def wpad_out(a):                                      # [C,3]→[C,8] f32
        return jnp.pad(a.astype(jnp.float32), ((0, 0), (0, _COORD_LANES - 3)))

    glue_stacks = [[] for _ in range(12)]
    caj_stacks = [[] for _ in range(12)]
    cav_stacks = [[] for _ in range(12)]
    saj_stacks = [[] for _ in range(8)]
    sav_stacks = [[] for _ in range(8)]
    embeds = None
    for (wjp, bjp, wvp, bvp, kparams, whj, bhj, whv, bhv) in blocks:
        (jpos, vpos, jQ, vQ, v2jK, j2vK, wv2j, bv2j, wj2v, bj2v,
         ca_j, ca_v, sa_j, sa_v) = kparams
        if embeds is None:
            embeds = [[] for _ in range(6)]
        for i, e in enumerate([(jpos, Jp), (vpos, Vp), (jQ, Jp), (vQ, Vp),
                               (v2jK, Vp), (j2vK, Jp)]):
            embeds[i].append(padrows_f32(*e))
        for i, g in enumerate([wpad_in(wjp), v(bjp), wpad_in(wvp), v(bvp),
                               wt(wv2j), v(bv2j), wt(wj2v), v(bj2v),
                               wpad_out(whj), vpad8(bhj),
                               wpad_out(whv), vpad8(bhv)]):
            glue_stacks[i].append(g)

        def pack12(w, out):
            (wq, bq, wk, bk, wv_, bv_, wproj, bproj, w1, bb1, w2, bb2) = w
            for i, g in enumerate([wt(wq), v(bq), wt(wk), v(bk), wt(wv_),
                                   v(bv_), wt(wproj), v(bproj), wt(w1),
                                   v(bb1), wt(w2), v(bb2)]):
                out[i].append(g)

        def pack8(w, out):
            (wqkv, bqkv, wproj, bproj, w1, bb1, w2, bb2) = w
            for i, g in enumerate([wt(wqkv), v(bqkv), wt(wproj), v(bproj),
                                   wt(w1), v(bb1), wt(w2), v(bb2)]):
                out[i].append(g)

        pack12(ca_j, caj_stacks)
        pack12(ca_v, cav_stacks)
        pack8(sa_j, saj_stacks)
        pack8(sa_v, sav_stacks)

    stacked = [jnp.stack(s) for s in
               (glue_stacks + caj_stacks + cav_stacks
                + saj_stacks + sav_stacks)]
    embed_stacks = [jnp.stack(e) for e in embeds]         # [NB, G·Np, C]

    jc2 = _pad_coords(joints, Jp)
    vc2 = _pad_coords(vertx, Vp)

    jrows = pl.BlockSpec((G * Jp, _COORD_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    vrows = pl.BlockSpec((G * Vp, _COORD_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    cstack = pl.BlockSpec((G, NB, 12, C), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    hid = blocks[0][4][10][8].shape[1]                    # ca_j w1 out dim
    flops = B * NB * (
        2 * (Vp + Jp) * C * C * 4
        + num_heads_j * 4 * Jp * Vp * (C // num_heads_j) * 2
        + 4 * (Vp + Jp) * C * hid * 2
        + 2 * (Vp + Jp) * C * 4 * C
        + num_heads_j * 4 * Jp * Jp * (C // num_heads_j) * G
        + num_heads_v * 4 * Vp * Vp * (C // num_heads_v))
    jout, vout = pl.pallas_call(
        functools.partial(
            _chain_kernel, num_blocks=NB, num_heads_j=num_heads_j,
            num_heads_v=num_heads_v, eps=eps, G=G, Jp=Jp, Vp=Vp, dt=dt),
        grid=(B // G,),
        in_specs=[jrows, vrows, cstack, cstack] + [full] * (6 + 4 + 52),
        out_specs=[jrows, vrows],
        out_shape=[
            jax.ShapeDtypeStruct((B * Jp, _COORD_LANES), jnp.float32),
            jax.ShapeDtypeStruct((B * Vp, _COORD_LANES), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (jc2.size + vc2.size) * 2,
            transcendentals=B * NB * (
                num_heads_j * Jp * (G * Vp + G * Jp)
                + num_heads_v * Vp * (G * Jp + Vp)
                + 2 * (Jp + Vp) * hid),
        ),
        interpret=jax.default_backend() != "tpu",
    )(jc2, vc2, gammas.astype(jnp.float32), betas.astype(jnp.float32),
      *embed_stacks, jsa_mask, vsa_mask, jca_mask, vca_mask, *stacked)
    return (jout.reshape(B, Jp, _COORD_LANES)[:, :J, :3],
            vout.reshape(B, Vp, _COORD_LANES)[:, :V, :3])


def _chain_fwd(joints, vertx, gammas, betas, blocks,
               num_heads_j, num_heads_v, eps):
    return (_chain_impl(joints, vertx, gammas, betas, blocks,
                        num_heads_j, num_heads_v, eps),
            (joints, vertx, gammas, betas, blocks))


def _chain_bwd(num_heads_j, num_heads_v, eps, res, g):
    joints, vertx, gammas, betas, blocks = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, e: coevo_chain_reference(
            a, b, c, d, e, num_heads_j, num_heads_v, eps),
        joints, vertx, gammas, betas, blocks)
    return vjp(g)


fused_coevo_chain.defvjp(_chain_fwd, _chain_bwd)
