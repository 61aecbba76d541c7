"""Fused short-sequence MHSA Pallas kernel vs the pure-XLA path.

The kernel (ops/fused_attention.py) must be a drop-in for the Attention
module: same parameters, same math, gradients flow (custom VJP recompute).
On the CPU test backend it runs in interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmce_tpu.models.layers import Attention
from pmce_tpu.ops.fused_attention import fused_mhsa, mhsa_reference


def _rand_weights(rng, C):
    return (
        jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * C,)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(C, C)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32),
    )


@pytest.mark.parametrize("B,N,C,H", [
    (48, 19, 256, 8),   # spatial blocks (19 joints)
    (32, 16, 256, 8),   # temporal blocks (16 frames)
    (7, 19, 64, 8),     # coevo joint stream dims; B not divisible by group
    (3, 431, 64, 2),    # coevo vertex stream (431 coarse vertices)
])
def test_fused_matches_reference(B, N, C, H):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    w = _rand_weights(rng, C)
    out = fused_mhsa(x, *w, H)
    ref = mhsa_reference(x, *w, num_heads=H)
    assert out.shape == (B, N, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_module_parity():
    """Attention(fused=True) == Attention(fused=False) with shared params."""
    rng = np.random.default_rng(1)
    B, N, C, H = 12, 19, 128, 8
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    plain = Attention(C, H, fused=False)
    fused = Attention(C, H, fused=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    y0 = plain.apply(params, x)
    y1 = fused.apply(params, x)  # same param tree must be accepted
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-5, atol=2e-5)


def test_fused_gradients_flow():
    rng = np.random.default_rng(2)
    B, N, C, H = 4, 16, 64, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    w = _rand_weights(rng, C)

    g_fused = jax.grad(lambda x, *w: jnp.sum(fused_mhsa(x, *w, H) ** 2),
                       argnums=(0, 1, 2, 3, 4))(x, *w)
    g_ref = jax.grad(
        lambda x, *w: jnp.sum(mhsa_reference(x, *w, num_heads=H) ** 2),
        argnums=(0, 1, 2, 3, 4))(x, *w)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("B,N,C,H", [
    (7, 19, 64, 4),     # grouped path, ragged group padding
    (2, 70, 64, 2),     # single-clip path (N > 64), 70→80 token padding
])
def test_fused_backward_kernel_parity(B, N, C, H):
    """The Pallas backward kernel (recompute-in-VMEM, accumulated param
    grads) must match the XLA reference VJP on both dispatch variants."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    w = _rand_weights(rng, C)
    ct = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

    g_fused = jax.grad(
        lambda x, *w: jnp.sum(fused_mhsa(x, *w, H) * ct),
        argnums=(0, 1, 2, 3, 4))(x, *w)
    g_ref = jax.grad(
        lambda x, *w: jnp.sum(mhsa_reference(x, *w, num_heads=H) * ct),
        argnums=(0, 1, 2, 3, 4))(x, *w)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_fused_bf16():
    rng = np.random.default_rng(3)
    B, N, C, H = 8, 19, 256, 8
    x32 = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    w = _rand_weights(rng, C)
    out = fused_mhsa(x32.astype(jnp.bfloat16), *w, H)
    assert out.dtype == jnp.bfloat16
    ref = mhsa_reference(x32, *w, num_heads=H)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.05, err.max() / scale


def test_fused_block_matches_modular():
    """Block(fused=True) == Block(fused=False) with shared params,
    including the shared post-norm folded into the kernel."""
    from pmce_tpu.models.layers import Block

    rng = np.random.default_rng(4)
    B, N, C, H = 10, 19, 128, 8
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    plain = Block(C, H, mlp_ratio=2.0, fused=False)
    fused = Block(C, H, mlp_ratio=2.0, fused=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    p2 = fused.init(jax.random.PRNGKey(0), x)
    assert (jax.tree.structure(params) == jax.tree.structure(p2))

    y0 = plain.apply(params, x)
    y1 = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=3e-5, atol=3e-5)

    post = (jnp.asarray(rng.normal(size=(C,)), jnp.float32),
            jnp.asarray(rng.normal(size=(C,)), jnp.float32))
    y0 = plain.apply(params, x, post_norm=post)
    y1 = fused.apply(params, x, post_norm=post)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=3e-5, atol=3e-5)


def test_fused_block_gradients():
    from pmce_tpu.models.layers import Block

    rng = np.random.default_rng(5)
    B, N, C, H = 4, 16, 64, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    plain = Block(C, H, mlp_ratio=2.0, fused=False)
    fused = Block(C, H, mlp_ratio=2.0, fused=True)
    params = plain.init(jax.random.PRNGKey(0), x)

    g0 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_block_gradients_post_norm_and_x():
    """The whole-block Pallas backward vs the XLA chain with the lifter's
    shared post-LN attached, including the INPUT gradient (the round-3
    kernel carries dx through both LN backwards in-kernel)."""
    from pmce_tpu.ops.fused_attention import (
        block_reference,
        fused_transformer_block,
    )

    rng = np.random.default_rng(11)
    B, N, C, H = 6, 19, 64, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

    def w(*s):
        return jnp.asarray(rng.normal(size=s) * 0.05, jnp.float32)

    params = (w(C), w(C), w(C, 3 * C), w(3 * C), w(C, C), w(C), w(C), w(C),
              w(C, 2 * C), w(2 * C), w(2 * C, C), w(C),
              1.0 + w(C), w(C))                       # post-LN scale/bias

    def loss_ref(x, p):
        return jnp.sum(block_reference(x, p, H) ** 3)

    def loss_fused(x, p):
        return jnp.sum(fused_transformer_block(x, p, H) ** 3)

    gx0, gp0 = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    gx1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(gp0), jax.tree.leaves(gp1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_block_branch_masks():
    """Stochastic-depth branch masks run INSIDE the kernel: the fused
    block with (m1, m2) must match the reference chain with the same
    masks, values and gradients."""
    from pmce_tpu.ops.fused_attention import (
        block_reference,
        fused_transformer_block,
    )

    rng = np.random.default_rng(9)
    B, N, C, H = 10, 19, 64, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

    def w(*s):
        return jnp.asarray(rng.normal(size=s) * 0.05, jnp.float32)

    params = (w(C), w(C), w(C, 3 * C), w(3 * C), w(C, C), w(C), w(C), w(C),
              w(C, 2 * C), w(2 * C), w(2 * C, C), w(C), None, None)
    keep = 0.8
    m = tuple(
        jnp.asarray((rng.random((B, 1, 1)) < keep) / keep, jnp.float32)
        for _ in range(2))

    y_kernel = fused_transformer_block(x, params, H, branch_masks=m)
    y_ref = block_reference(x, params, H, branch_masks=m)
    np.testing.assert_allclose(np.asarray(y_kernel), np.asarray(y_ref),
                               rtol=3e-5, atol=3e-5)
    # Some branches actually dropped (masks non-trivial for this seed).
    assert any(float(mm.min()) == 0.0 for mm in m)

    g0 = jax.grad(lambda p: jnp.sum(block_reference(
        x, p + (None, None), H, branch_masks=m) ** 2))(params[:12])
    g1 = jax.grad(lambda p: jnp.sum(fused_transformer_block(
        x, p + (None, None), H, branch_masks=m) ** 2))(params[:12])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_attention_with_dropout_rates_at_inference():
    """Nonzero CONFIGURED dropout must not disable the fused kernel at
    inference (deterministic=True makes the math identical), and the
    training path with active dropout must still run and differentiate."""
    from pmce_tpu.models.layers import Block

    rng = np.random.default_rng(8)
    B, N, C, H = 6, 19, 64, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    plain = Block(C, H, mlp_ratio=2.0, drop=0.1, attn_drop=0.1,
                  drop_path=0.1, fused=False)
    fused = Block(C, H, mlp_ratio=2.0, drop=0.1, attn_drop=0.1,
                  drop_path=0.1, fused=True)
    params = plain.init(jax.random.PRNGKey(0), x)

    # Inference: rates configured but inactive → identical math.
    y0 = plain.apply(params, x, deterministic=True)
    y1 = fused.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=3e-5, atol=3e-5)

    # Training: attention-probability and proj dropout are ACTIVE on the
    # fallback path (round-2 review: they were silently dropped).
    rngs = {"dropout": jax.random.PRNGKey(1),
            "droppath": jax.random.PRNGKey(2)}
    yt = fused.apply(params, x, deterministic=False, rngs=rngs)
    assert np.isfinite(np.asarray(yt)).all()
    assert not np.allclose(np.asarray(yt), np.asarray(y1))  # dropout acted
    g = jax.grad(lambda p: jnp.sum(fused.apply(
        p, x, deterministic=False, rngs=rngs) ** 2))(params)
    assert all(np.isfinite(np.asarray(le)).all()
               for le in jax.tree.leaves(g))


def test_fused_lifter_matches_modular():
    """Full PoseLifter parity: fused kernels vs modular XLA path."""
    from pmce_tpu.models.pose_lifter import PoseLifter

    rng = np.random.default_rng(6)
    B, T, J = 3, 16, 19
    pose2d = jnp.asarray(rng.normal(size=(B, T, J, 2)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(B, T, 512)), jnp.float32)
    kw = dict(num_joints=J, num_frames=T, embed_dim=64, depth=2,
              img_feat_dim=512)
    plain = PoseLifter(**kw, fused_attn=False)
    fused = PoseLifter(**kw, fused_attn=True)
    params = plain.init(jax.random.PRNGKey(0), pose2d, feat)
    p2 = fused.init(jax.random.PRNGKey(0), pose2d, feat)
    assert jax.tree.structure(params) == jax.tree.structure(p2)

    y0 = plain.apply(params, pose2d, feat)
    y1 = fused.apply(params, pose2d, feat)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=5e-5, atol=5e-5)


# ------------------------------------------------------- fused AdaLN block
def test_fused_ada_block_matches_modular():
    """AdaBlock(fused=True) at N=431 (the decoder's vertex stream) must
    equal AdaBlock(fused=False) with shared params — whole conditioned
    block in one kernel, γ/β regressed outside."""
    from pmce_tpu.models.layers import AdaBlock

    rng = np.random.default_rng(11)
    B, N, C, H = 3, 431, 64, 2
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, 96)), jnp.float32)
    plain = AdaBlock(C, H, mlp_ratio=4.0, qkv_bias=True, fused=False)
    fused = AdaBlock(C, H, mlp_ratio=4.0, qkv_bias=True, fused=True)
    params = plain.init(jax.random.PRNGKey(0), x, cond)
    p2 = fused.init(jax.random.PRNGKey(0), x, cond)
    assert jax.tree.structure(params) == jax.tree.structure(p2)

    y0 = plain.apply(params, x, cond)
    y1 = fused.apply(params, x, cond)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=3e-5, atol=3e-5)


def test_fused_ada_block_gradients():
    from pmce_tpu.models.layers import AdaBlock

    rng = np.random.default_rng(12)
    B, N, C, H = 2, 100, 32, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, 48)), jnp.float32)
    plain = AdaBlock(C, H, mlp_ratio=2.0, qkv_bias=True, fused=False)
    fused = AdaBlock(C, H, mlp_ratio=2.0, qkv_bias=True, fused=True)
    params = plain.init(jax.random.PRNGKey(0), x, cond)

    g0 = jax.grad(lambda p: jnp.sum(plain.apply(p, x, cond) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(fused.apply(p, x, cond) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_ada_block_branch_masks():
    """Per-clip stochastic-depth masks inside the AdaLN kernel must match
    the XLA reference chain with the same masks."""
    from pmce_tpu.ops.fused_attention import (
        ada_block_reference,
        fused_ada_block,
    )

    rng = np.random.default_rng(13)
    B, N, C, H = 4, 80, 32, 2
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    g1v = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    b1v = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    g2v = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    b2v = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    params = (
        jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * C,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(C, 2 * C)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(2 * C,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(2 * C, C)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32),
    )
    masks = (jnp.asarray([[[0.0]], [[2.0]], [[1.0]], [[0.0]]]),
             jnp.asarray([[[2.0]], [[0.0]], [[1.0]], [[2.0]]]))
    y = fused_ada_block(x, g1v, b1v, g2v, b2v, params, H, 1e-6, masks)
    ref = ada_block_reference(x, g1v, b1v, g2v, b2v, params, H, 1e-6,
                              branch_masks=masks)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)

    # Gradients through the round-3 whole-block Pallas backward: input,
    # conditioning vectors, and weights, with masks active.
    ga = jax.grad(lambda x, g1, b1, g2, b2, p: jnp.sum(fused_ada_block(
        x, g1, b1, g2, b2, p, H, 1e-6, masks) ** 3),
        argnums=(0, 1, 2, 3, 4, 5))(x, g1v, b1v, g2v, b2v, params)
    gb = jax.grad(lambda x, g1, b1, g2, b2, p: jnp.sum(ada_block_reference(
        x, g1, b1, g2, b2, p, H, 1e-6, branch_masks=masks) ** 3),
        argnums=(0, 1, 2, 3, 4, 5))(x, g1v, b1v, g2v, b2v, params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def _ca_fixture(rng, B, Nq, Nk, C, Cv):
    xq = jnp.asarray(rng.normal(size=(B, Nq, C)), jnp.float32)
    xk = jnp.asarray(rng.normal(size=(B, Nk, C)), jnp.float32)
    xv = jnp.asarray(rng.normal(size=(B, Nk, Cv)), jnp.float32)
    gammas = tuple(jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
                   for d in (C, C, Cv, C))
    betas = tuple(jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
                  for d in (C, C, Cv, C))

    def w(*s):
        return jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)

    params = (w(C, C), w(C), w(C, C), w(C), w(Cv, Cv), w(Cv),
              w(Cv, C), w(C), w(C, 2 * C), w(2 * C), w(2 * C, C), w(C))
    return xq, xk, xv, gammas, betas, params


@pytest.mark.parametrize("shape", [(19, 100, 4), (100, 19, 2)])
def test_fused_ca_block_matches_reference(shape):
    """Both decoder CA orientations (joints query vertices / vertices
    query joints): values and FULL gradients vs the XLA oracle."""
    from pmce_tpu.ops.fused_attention import (
        ca_block_reference,
        fused_ca_block,
    )

    Nq, Nk, H = shape
    rng = np.random.default_rng(21)
    B, C, Cv = 3, 32, 32
    xq, xk, xv, gammas, betas, params = _ca_fixture(rng, B, Nq, Nk, C, Cv)

    y = fused_ca_block(xq, xk, xv, gammas, betas, params, H)
    ref = ca_block_reference(xq, xk, xv, gammas, betas, params, H)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)

    masks = (jnp.asarray(rng.integers(0, 2, (B, 1, 1)) * 1.25,
                         jnp.float32),
             jnp.asarray(rng.integers(0, 2, (B, 1, 1)) * 1.25,
                         jnp.float32))
    ga = jax.grad(lambda *a: jnp.sum(fused_ca_block(
        *a, H, 1e-6, masks) ** 3), argnums=tuple(range(6)))(
        xq, xk, xv, gammas, betas, params)
    gb = jax.grad(lambda *a: jnp.sum(ca_block_reference(
        *a, H, 1e-6, branch_masks=masks) ** 3),
        argnums=tuple(range(6)))(xq, xk, xv, gammas, betas, params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_ca_block_module_parity():
    """CrossAttentionBlock(fused=True) must share the modular path's
    parameter tree and match its output and gradients."""
    from pmce_tpu.models.layers import CrossAttentionBlock

    rng = np.random.default_rng(22)
    B, Nq, Nk, C, H = 2, 100, 19, 32, 4
    xq = jnp.asarray(rng.normal(size=(B, Nq, C)), jnp.float32)
    xk = jnp.asarray(rng.normal(size=(B, Nk, C)), jnp.float32)
    xv = jnp.asarray(rng.normal(size=(B, Nk, C)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, 48)), jnp.float32)

    plain = CrossAttentionBlock(q_dim=C, k_dim=C, v_dim=C, num_heads=H,
                                mlp_ratio=2.0, fused=False)
    fused = CrossAttentionBlock(q_dim=C, k_dim=C, v_dim=C, num_heads=H,
                                mlp_ratio=2.0, fused=True)
    params = plain.init(jax.random.PRNGKey(0), xq, xk, xv, cond)
    p2 = fused.init(jax.random.PRNGKey(0), xq, xk, xv, cond)
    assert jax.tree.structure(params) == jax.tree.structure(p2)

    y0 = plain.apply(params, xq, xk, xv, cond)
    y1 = fused.apply(params, xq, xk, xv, cond)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=5e-5, atol=5e-5)

    g0 = jax.grad(lambda p: jnp.sum(plain.apply(p, xq, xk, xv,
                                                cond) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(fused.apply(p, xq, xk, xv,
                                                cond) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------- fused GRU scan
def test_fused_gru_layer_matches_reference():
    from pmce_tpu.ops.fused_attention import (
        fused_gru_layer,
        gru_layer_scan_reference,
    )

    rng = np.random.default_rng(21)
    T, B, H = 16, 8, 64
    gi = jnp.asarray(rng.normal(size=(T, B, 3 * H)), jnp.float32)
    whh = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.2, jnp.float32)
    bhh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.2, jnp.float32)
    ys = fused_gru_layer(gi, whh, bhh)
    ref = gru_layer_scan_reference(gi, whh, bhh)
    assert ys.shape == (T, B, H)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_gru_layer_rev_matches_flipped_forward():
    """rev(gi)[t] == fused(gi[::-1])[T-1-t] — the zero-copy backward
    direction must be bit-identical to the explicit-reversal formulation
    (same kernel arithmetic, only the index maps differ)."""
    from pmce_tpu.ops.fused_attention import (
        fused_gru_layer,
        fused_gru_layer_rev,
    )

    rng = np.random.default_rng(31)
    T, B, H = 9, 16, 64  # odd T: catches an off-by-one in T-1-t
    gi = jnp.asarray(rng.normal(size=(T, B, 3 * H)), jnp.float32)
    whh = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.2, jnp.float32)
    bhh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.2, jnp.float32)
    ys_rev = fused_gru_layer_rev(gi, whh, bhh)
    ys_ref = fused_gru_layer(gi[::-1], whh, bhh)[::-1]
    np.testing.assert_array_equal(np.asarray(ys_rev), np.asarray(ys_ref))


def test_fused_gru_layer_rev_gradients():
    from pmce_tpu.ops.fused_attention import (
        fused_gru_layer,
        fused_gru_layer_rev,
    )

    rng = np.random.default_rng(32)
    T, B, H = 5, 8, 32
    gi = jnp.asarray(rng.normal(size=(T, B, 3 * H)), jnp.float32)
    whh = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.2, jnp.float32)
    bhh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.2, jnp.float32)
    g0 = jax.grad(lambda *a: jnp.sum(fused_gru_layer_rev(*a) ** 2),
                  argnums=(0, 1, 2))(gi, whh, bhh)
    g1 = jax.grad(
        lambda gi_, w, b: jnp.sum(fused_gru_layer(gi_[::-1], w, b) ** 2),
        argnums=(0, 1, 2))(gi, whh, bhh)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("T,B,H", [(6, 8, 32), (3, 128, 16)])
def test_fused_gru_layer_gradients(T, B, H):
    """Incl. a batch above the backward's 64-row tile cap: the reverse
    scan's carry must re-initialize per batch tile."""
    from pmce_tpu.ops.fused_attention import (
        fused_gru_layer,
        gru_layer_scan_reference,
    )

    rng = np.random.default_rng(22)
    gi = jnp.asarray(rng.normal(size=(T, B, 3 * H)), jnp.float32)
    whh = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.2, jnp.float32)
    bhh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.2, jnp.float32)
    g0 = jax.grad(lambda *a: jnp.sum(fused_gru_layer(*a) ** 2),
                  argnums=(0, 1, 2))(gi, whh, bhh)
    g1 = jax.grad(lambda *a: jnp.sum(gru_layer_scan_reference(*a) ** 2),
                  argnums=(0, 1, 2))(gi, whh, bhh)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_bigru_kernel_path_matches_scan():
    """BiGRU under the bf16 policy (kernel path) must match the f32 scan
    path within bf16 tolerance — same params, same inputs."""
    from pmce_tpu.models.layers import BiGRU

    rng = np.random.default_rng(23)
    T, B, C, H = 16, 8, 48, 32
    x = jnp.asarray(rng.normal(size=(T, B, C)), jnp.float32)
    scan = BiGRU(hidden_dim=H, num_layers=2, dtype=None)
    kern = BiGRU(hidden_dim=H, num_layers=2, dtype=jnp.bfloat16)
    params = scan.init(jax.random.PRNGKey(0), x)
    p2 = kern.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(p2)
    y0 = np.asarray(scan.apply(params, x), np.float32)
    y1 = np.asarray(kern.apply(params, x), np.float32)
    assert y0.shape == y1.shape == (T, B, 2 * H)
    scale = np.abs(y0).max()
    assert np.abs(y0 - y1).max() / scale < 0.05


# ------------------------------------------------------ fused CoevoBlock
def test_fused_coevo_block_matches_modular():
    """CoevoBlock(fused=True, deterministic) — the whole-block kernel —
    must equal CoevoBlock(fused=False) with shared params at reference
    dims (19 joints, 431 vertices, dim 64, heads 8/2)."""
    from pmce_tpu.models.coevo import CoevoBlock

    rng = np.random.default_rng(31)
    B, J, V = 3, 19, 431
    joint = jnp.asarray(rng.normal(size=(B, J, 3)) * 0.5, jnp.float32)
    vertx = jnp.asarray(rng.normal(size=(B, V, 3)) * 0.5, jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, 96)), jnp.float32)
    plain = CoevoBlock(J, V, fused=False)
    fused = CoevoBlock(J, V, fused=True, whole_block_kernel=True)
    params = plain.init(jax.random.PRNGKey(0), joint, vertx, cond)
    p2 = fused.init(jax.random.PRNGKey(0), joint, vertx, cond)
    assert jax.tree.structure(params) == jax.tree.structure(p2)

    j0, v0 = plain.apply(params, joint, vertx, cond)
    j1, v1 = fused.apply(params, joint, vertx, cond)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j0),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=5e-5, atol=5e-5)


def test_fused_coevo_block_gradients_flow():
    """Differentiating through the fused block (custom VJP recompute) must
    match the modular path's gradients."""
    from pmce_tpu.models.coevo import CoevoBlock

    rng = np.random.default_rng(32)
    B, J, V = 2, 19, 81
    joint = jnp.asarray(rng.normal(size=(B, J, 3)) * 0.5, jnp.float32)
    vertx = jnp.asarray(rng.normal(size=(B, V, 3)) * 0.5, jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, 64)), jnp.float32)
    plain = CoevoBlock(J, V, fused=False)
    fused = CoevoBlock(J, V, fused=True, whole_block_kernel=True)
    params = plain.init(jax.random.PRNGKey(0), joint, vertx, cond)

    def loss(model):
        def f(p):
            jo, vo = model.apply(p, joint, vertx, cond)
            return jnp.sum(jo ** 2) + jnp.sum(vo ** 2)
        return f

    g0 = jax.grad(loss(plain))(params)
    g1 = jax.grad(loss(fused))(params)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g0),
                   key=lambda kv: jax.tree_util.keystr(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g1),
                   key=lambda kv: jax.tree_util.keystr(kv[0]))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(ka))


# ------------------------------------------------------ fused lifter trunk
def test_fused_lifter_trunk_matches_reference():
    """The whole-trunk kernel (all blocks + shared norms + temporal
    pos-embed, attention patterns as masks) vs the reshape/loop oracle."""
    from pmce_tpu.ops.fused_attention import (
        fused_lifter_trunk,
        lifter_trunk_reference,
    )

    rng = np.random.default_rng(41)
    B, T, J, C, H, depth = 2, 16, 19, 64, 4, 2
    x = jnp.asarray(rng.normal(size=(B, T * J, C)), jnp.float32)

    def w(*s):
        return jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)

    params = tuple(
        (w(C), w(C), w(C, 3 * C), w(3 * C), w(C, C), w(C), w(C), w(C),
         w(C, 2 * C), w(2 * C), w(2 * C, C), w(C))
        for _ in range(2 * depth))
    norm_s = (w(C), w(C))
    norm_t = (w(C), w(C))
    tpe = w(T, C)
    y = fused_lifter_trunk(x, params, norm_s, norm_t, tpe, T, J, depth, H)
    ref = lifter_trunk_reference(x, params, norm_s, norm_t, tpe, T, J,
                                 depth, H)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # Gradients flow through the custom VJP and match the oracle.
    g0 = jax.grad(lambda x, p: jnp.sum(fused_lifter_trunk(
        x, p, norm_s, norm_t, tpe, T, J, depth, H) ** 2),
        argnums=(0, 1))(x, params)
    g1 = jax.grad(lambda x, p: jnp.sum(lifter_trunk_reference(
        x, p, norm_s, norm_t, tpe, T, J, depth, H) ** 2),
        argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_lifter_bf16_trunk_matches_f32_modular():
    """PoseLifter(dtype=bf16, fused) — the trunk path — vs the f32 modular
    lifter with shared params, within bf16 tolerance (outputs are mm-scale
    through the f32-pinned head)."""
    from pmce_tpu.models.pose_lifter import PoseLifter

    rng = np.random.default_rng(42)
    B, T, J = 3, 16, 19
    pose2d = jnp.asarray(rng.normal(size=(B, T, J, 2)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(B, T, 512)), jnp.float32)
    kw = dict(num_joints=J, num_frames=T, embed_dim=64, depth=3,
              img_feat_dim=512)
    plain = PoseLifter(**kw, fused_attn=False)
    trunk = PoseLifter(**kw, fused_attn=True, dtype=jnp.bfloat16)
    params = plain.init(jax.random.PRNGKey(0), pose2d, feat)
    p2 = trunk.init(jax.random.PRNGKey(0), pose2d, feat)
    assert jax.tree.structure(params) == jax.tree.structure(p2)

    y0 = np.asarray(plain.apply(params, pose2d, feat), np.float32)
    y1 = np.asarray(trunk.apply(params, pose2d, feat), np.float32)
    scale = np.abs(y0).max()
    assert np.abs(y0 - y1).max() / scale < 0.05
