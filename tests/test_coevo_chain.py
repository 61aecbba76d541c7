"""Whole-decoder-tail chain kernel vs its XLA reference.

Covers ops/fused_coevo_chain.py: forward parity (f32 and bf16), gradient
parity through the custom VJP, and the grouped-vs-single-clip invariance
(G is picked from the batch size; every batch size must agree).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmce_tpu.ops.fused_coevo_chain import (
    coevo_chain_reference,
    fused_coevo_chain,
)

J, V, C, CD = 19, 61, 64, 96
HJ, HV = 8, 2
NB = 2


def _mk_blocks(rng, dt):
    def t(*shape, scale=0.05):
        return jnp.asarray(rng.normal(size=shape, scale=scale))

    blocks = []
    for _ in range(NB):
        ca_j = (t(C, C), t(C), t(C, C), t(C), t(C, C), t(C),
                t(C, C), t(C), t(C, 4 * C), t(4 * C), t(4 * C, C), t(C))
        ca_v = (t(C, C), t(C), t(C, C), t(C), t(C, C), t(C),
                t(C, C), t(C), t(C, 4 * C), t(4 * C), t(4 * C, C), t(C))
        sa_j = (t(C, 3 * C), t(3 * C), t(C, C), t(C),
                t(C, 4 * C), t(4 * C), t(4 * C, C), t(C))
        sa_v = (t(C, 3 * C), t(3 * C), t(C, C), t(C),
                t(C, 4 * C), t(4 * C), t(4 * C, C), t(C))
        kparams = (t(J, C), t(V, C), t(J, C), t(V, C), t(V, C), t(J, C),
                   t(C, C), t(C), t(C, C), t(C), ca_j, ca_v, sa_j, sa_v)
        blocks.append((t(3, C).astype(dt), t(C), t(3, C).astype(dt), t(C),
                       kparams, t(C, 3), t(3), t(C, 3), t(3)))
    return tuple(blocks)


def _mk_inputs(rng, B):
    joints = jnp.asarray(rng.normal(size=(B, J, 3), scale=0.3), jnp.float32)
    vertx = jnp.asarray(rng.normal(size=(B, V, 3), scale=0.3), jnp.float32)
    gammas = jnp.asarray(rng.normal(size=(B, NB, 12, C), scale=0.1),
                         jnp.float32)
    betas = jnp.asarray(rng.normal(size=(B, NB, 12, C), scale=0.1),
                        jnp.float32)
    return joints, vertx, gammas, betas


@pytest.mark.parametrize("batch", [4, 3])
def test_chain_matches_reference_f32(batch):
    rng = np.random.default_rng(0)
    blocks = _mk_blocks(rng, jnp.float32)
    joints, vertx, gammas, betas = _mk_inputs(rng, batch)
    evo, vx = jax.jit(
        lambda *a: fused_coevo_chain(*a, HJ, HV))(
            joints, vertx, gammas, betas, blocks)
    evo_r, vx_r = coevo_chain_reference(joints, vertx, gammas, betas,
                                        blocks, HJ, HV)
    np.testing.assert_allclose(np.asarray(evo), np.asarray(evo_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_r),
                               rtol=2e-4, atol=2e-4)


def test_chain_matches_reference_bf16():
    rng = np.random.default_rng(1)
    blocks = _mk_blocks(rng, jnp.bfloat16)
    joints, vertx, gammas, betas = _mk_inputs(rng, 4)
    evo, vx = jax.jit(
        lambda *a: fused_coevo_chain(*a, HJ, HV))(
            joints, vertx, gammas, betas, blocks)
    evo_r, vx_r = coevo_chain_reference(joints, vertx, gammas, betas,
                                        blocks, HJ, HV)
    # bf16: the kernel's clamped packed-bf16 softmax and tanh-GELU sit
    # inside the activations' own bf16 quantization band.
    np.testing.assert_allclose(np.asarray(evo), np.asarray(evo_r),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vx_r),
                               rtol=2e-2, atol=2e-2)


def test_chain_gradients_match_reference():
    rng = np.random.default_rng(2)
    blocks = _mk_blocks(rng, jnp.float32)
    joints, vertx, gammas, betas = _mk_inputs(rng, 2)

    def loss_k(j, vx, g, b, blk):
        e, m = fused_coevo_chain(j, vx, g, b, blk, HJ, HV)
        return jnp.sum(e * e) + jnp.sum(m * m)

    def loss_r(j, vx, g, b, blk):
        e, m = coevo_chain_reference(j, vx, g, b, blk, HJ, HV)
        return jnp.sum(e * e) + jnp.sum(m * m)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 4)))(
        joints, vertx, gammas, betas, blocks)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 4)))(
        joints, vertx, gammas, betas, blocks)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
