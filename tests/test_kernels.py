"""Pallas kernel parity vs the XLA reference path (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from pmce_tpu.smpl.kernels import fused_skinning
from pmce_tpu.smpl.layer import apply_skinning, smpl_forward


def test_fused_skinning_matches_xla(rng, smpl_model, smpl_artifacts):
    B, V, J = 2, smpl_artifacts.num_verts, 24
    v_posed = rng.normal(size=(B, V, 3)).astype(np.float32)
    A = rng.normal(size=(B, J, 4, 4)).astype(np.float32)
    out_fused = fused_skinning(
        jnp.asarray(v_posed), jnp.asarray(A),
        smpl_model.lbs_weights, tile_v=256,
    )
    out_ref = apply_skinning(
        jnp.asarray(v_posed), jnp.asarray(A), smpl_model.lbs_weights
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=1e-5
    )


def test_smpl_forward_fused_path(rng, smpl_model):
    pose = jnp.asarray(rng.normal(scale=0.3, size=(2, 72)), jnp.float32)
    betas = jnp.asarray(rng.normal(size=(2, 10)), jnp.float32)
    v0, j0 = smpl_forward(smpl_model, pose, betas, fused=False)
    v1, j1 = smpl_forward(smpl_model, pose, betas, fused=True)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j0), np.asarray(j1), atol=1e-6)


def test_fused_skinning_unaligned_vertex_count(rng, smpl_model):
    """V=600 is not a multiple of the tile; padding must be sliced away."""
    B, V, J = 1, 600, 24
    v_posed = rng.normal(size=(B, V, 3)).astype(np.float32)
    A = rng.normal(size=(B, J, 4, 4)).astype(np.float32)
    out = fused_skinning(jnp.asarray(v_posed), jnp.asarray(A),
                         smpl_model.lbs_weights, tile_v=512)
    assert out.shape == (B, V, 3)
    ref = apply_skinning(jnp.asarray(v_posed), jnp.asarray(A),
                         smpl_model.lbs_weights)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
