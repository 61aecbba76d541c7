"""Fast-tier bf16 numeric canaries, one per fused serving kernel.

Round 3 shipped a bf16 score-stage rewrite whose precision regression was
only visible through a 10-minute slow-tier end-metric test (verdict weak
#7): the serving-policy MPJPE delta crossed its tolerance unseen. These
canaries pin the bf16-vs-f32 output delta of EVERY fused kernel on fixed
seeded inputs, with bounds recorded at ~1.5× the currently measured delta
— a kernel rewrite that shifts serving numerics now fails in seconds at
commit time.

Measurement: relative-max delta ``max|bf16(x) - f32(x)| / max|f32(x)|``
between the kernel run in bf16 (inputs/weights cast) and its pure-XLA f32
reference on identical values. Each bound is a REGRESSION PIN, not a
correctness tolerance — if an intentional numeric change moves a delta,
re-record the bound in the same commit and say why.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pmce_tpu.ops.fused_attention import (
    ada_block_reference,
    block_reference,
    ca_block_reference,
    fused_ada_block,
    fused_ca_block,
    fused_gru_layer,
    fused_lifter_trunk,
    fused_mhsa,
    fused_transformer_block,
    gru_layer_scan_reference,
    lifter_trunk_reference,
    mhsa_reference,
)
from pmce_tpu.ops.fused_coevo_chain import (
    coevo_chain_reference,
    fused_coevo_chain,
)

BF16 = jnp.bfloat16


def _delta(ref, out):
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    assert np.abs(ref).max() > 1e-3, "degenerate reference output"
    return float(np.abs(out - ref).max() / np.abs(ref).max())


def _t(rng, *shape, scale=0.1):
    return jnp.asarray(rng.normal(size=shape, scale=scale), jnp.float32)


def _cast(tree):
    return jax.tree.map(lambda a: a.astype(BF16), tree)


def test_canary_mhsa():
    rng = np.random.default_rng(100)
    B, N, C, H = 4, 19, 64, 8
    x = _t(rng, B, N, C, scale=1.0)
    w = (_t(rng, C, 3 * C), _t(rng, 3 * C), _t(rng, C, C), _t(rng, C))
    ref = mhsa_reference(x, *w, H)
    out = fused_mhsa(x.astype(BF16), *_cast(w), H)
    d = _delta(ref, out)
    assert d <= 0.008, f"mhsa bf16 delta drifted: {d:.5f}"


def test_canary_transformer_block():
    rng = np.random.default_rng(101)
    B, N, C, H = 4, 16, 64, 8
    x = _t(rng, B, N, C, scale=1.0)
    p = (_t(rng, C), _t(rng, C), _t(rng, C, 3 * C), _t(rng, 3 * C),
         _t(rng, C, C), _t(rng, C), _t(rng, C), _t(rng, C),
         _t(rng, C, 2 * C), _t(rng, 2 * C), _t(rng, 2 * C, C), _t(rng, C),
         _t(rng, C), _t(rng, C))
    ref = block_reference(x, p, H)
    out = fused_transformer_block(x.astype(BF16), _cast(p), H)
    d = _delta(ref, out)
    assert d <= 0.0065, f"transformer block bf16 delta drifted: {d:.5f}"


def test_canary_lifter_trunk():
    rng = np.random.default_rng(102)
    B, T, J, C, H, depth = 2, 16, 17, 64, 8, 2
    x = _t(rng, B, T * J, C, scale=1.0)
    params = tuple(
        (_t(rng, C), _t(rng, C), _t(rng, C, 3 * C), _t(rng, 3 * C),
         _t(rng, C, C), _t(rng, C), _t(rng, C), _t(rng, C),
         _t(rng, C, 2 * C), _t(rng, 2 * C), _t(rng, 2 * C, C), _t(rng, C))
        for _ in range(2 * depth))
    norm_s = (_t(rng, C), _t(rng, C))
    norm_t = (_t(rng, C), _t(rng, C))
    tpe = _t(rng, T, C)
    ref = lifter_trunk_reference(x, params, norm_s, norm_t, tpe, T, J,
                                 depth, H)
    out = fused_lifter_trunk(x.astype(BF16), _cast(params), _cast(norm_s),
                             _cast(norm_t), tpe, T, J, depth, H)
    d = _delta(ref, out)
    assert d <= 0.013, f"lifter trunk bf16 delta drifted: {d:.5f}"


def test_canary_ada_block():
    rng = np.random.default_rng(103)
    B, N, C, H = 2, 97, 64, 2
    x = _t(rng, B, N, C, scale=1.0)
    g1, b1 = _t(rng, B, C, scale=0.5), _t(rng, B, C, scale=0.5)
    g2, b2 = _t(rng, B, C, scale=0.5), _t(rng, B, C, scale=0.5)
    p = (_t(rng, C, 3 * C), _t(rng, 3 * C), _t(rng, C, C), _t(rng, C),
         _t(rng, C, 4 * C), _t(rng, 4 * C), _t(rng, 4 * C, C), _t(rng, C))
    ref = ada_block_reference(x, g1, b1, g2, b2, p, H)
    out = fused_ada_block(x.astype(BF16), g1, b1, g2, b2, _cast(p), H)
    d = _delta(ref, out)
    assert d <= 0.007, f"ada block bf16 delta drifted: {d:.5f}"


def test_canary_ca_block():
    rng = np.random.default_rng(104)
    B, Nq, Nk, C, Cv, H = 2, 17, 97, 64, 64, 8
    xq = _t(rng, B, Nq, C, scale=1.0)
    xk = _t(rng, B, Nk, C, scale=1.0)
    xv = _t(rng, B, Nk, Cv, scale=1.0)
    gammas = tuple(_t(rng, B, c, scale=0.5) for c in (C, C, Cv, C))
    betas = tuple(_t(rng, B, c, scale=0.5) for c in (C, C, Cv, C))
    p = (_t(rng, C, C), _t(rng, C), _t(rng, C, C), _t(rng, C),
         _t(rng, Cv, Cv), _t(rng, Cv), _t(rng, Cv, C), _t(rng, C),
         _t(rng, C, 4 * C), _t(rng, 4 * C), _t(rng, 4 * C, C), _t(rng, C))
    ref = ca_block_reference(xq, xk, xv, gammas, betas, p, H)
    out = fused_ca_block(xq.astype(BF16), xk.astype(BF16),
                         xv.astype(BF16), gammas, betas, _cast(p), H)
    d = _delta(ref, out)
    assert d <= 0.0055, f"CA block bf16 delta drifted: {d:.5f}"


def test_canary_gru_layer():
    rng = np.random.default_rng(105)
    T, B, Hd = 16, 8, 64
    gi = _t(rng, T, B, 3 * Hd, scale=1.0)
    whh = _t(rng, Hd, 3 * Hd)
    bhh = _t(rng, 3 * Hd)
    ref = gru_layer_scan_reference(gi, whh, bhh)
    out = fused_gru_layer(gi.astype(BF16), whh.astype(BF16),
                          bhh.astype(BF16))
    d = _delta(ref, out)
    assert d <= 0.0055, f"GRU layer bf16 delta drifted: {d:.5f}"


def test_canary_coevo_chain():
    rng = np.random.default_rng(106)
    J, V, C = 17, 97, 64
    HJ, HV, NB = 8, 2, 3
    B = 2

    def blocks(dt):
        r = np.random.default_rng(107)

        def t(*shape, scale=0.05):
            return jnp.asarray(r.normal(size=shape, scale=scale),
                               jnp.float32).astype(dt)

        out = []
        for _ in range(NB):
            ca_j = (t(C, C), t(C), t(C, C), t(C), t(C, C), t(C),
                    t(C, C), t(C), t(C, 4 * C), t(4 * C), t(4 * C, C),
                    t(C))
            ca_v = (t(C, C), t(C), t(C, C), t(C), t(C, C), t(C),
                    t(C, C), t(C), t(C, 4 * C), t(4 * C), t(4 * C, C),
                    t(C))
            sa_j = (t(C, 3 * C), t(3 * C), t(C, C), t(C),
                    t(C, 4 * C), t(4 * C), t(4 * C, C), t(C))
            sa_v = (t(C, 3 * C), t(3 * C), t(C, C), t(C),
                    t(C, 4 * C), t(4 * C), t(4 * C, C), t(C))
            kparams = (t(J, C), t(V, C), t(J, C), t(V, C), t(V, C),
                       t(J, C), t(C, C), t(C), t(C, C), t(C),
                       ca_j, ca_v, sa_j, sa_v)
            # coordinate heads stay f32 in both runs (they are f32 in the
            # serving model too — the [C,3] heads cost nothing).
            out.append((t(3, C), t(C).astype(jnp.float32),
                        t(3, C), t(C).astype(jnp.float32),
                        kparams,
                        t(C, 3).astype(jnp.float32),
                        t(3).astype(jnp.float32),
                        t(C, 3).astype(jnp.float32),
                        t(3).astype(jnp.float32)))
        return tuple(out)

    joints = _t(rng, B, J, 3, scale=0.3)
    vertx = _t(rng, B, V, 3, scale=0.3)
    gammas = _t(rng, B, NB, 12, C, scale=0.1)
    betas = _t(rng, B, NB, 12, C, scale=0.1)

    evo_r, vx_r = coevo_chain_reference(joints, vertx, gammas, betas,
                                        blocks(jnp.float32), HJ, HV)
    evo, vx = fused_coevo_chain(joints, vertx, gammas, betas,
                                blocks(BF16), HJ, HV)
    dj = _delta(evo_r, evo)
    dv = _delta(vx_r, vx)
    assert dj <= 0.001, f"chain evo-pose bf16 delta drifted: {dj:.5f}"
    assert dv <= 0.0011, f"chain vertex bf16 delta drifted: {dv:.5f}"
