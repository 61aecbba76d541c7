"""Model-zoo tests: shapes, determinism, and numeric parity vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmce_tpu.models.layers import AdaLayerNorm, Attention, BiGRU, Mlp
from pmce_tpu.models.pose_lifter import PoseLifter
from pmce_tpu.models.pmce import create_pmce
from pmce_tpu.smpl.artifacts import synthetic_artifacts
from pmce_tpu.smpl.mesh import synthetic_coarsening

from oracles import ada_layer_norm_np, attention_np, gru_cell_np


def test_attention_matches_oracle(rng):
    B, N, C, H = 2, 7, 32, 4
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    mod = Attention(dim=C, num_heads=H, qkv_bias=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    p = params["params"]
    qkv_k = np.asarray(p["qkv"]["kernel"])      # [C, 3C]
    qkv_b = np.asarray(p["qkv"]["bias"])        # [3C]
    proj_k = np.asarray(p["proj"]["kernel"])
    proj_b = np.asarray(p["proj"]["bias"])
    ref = attention_np(
        x,
        qkv_k[:, :C], qkv_k[:, C:2 * C], qkv_k[:, 2 * C:], proj_k,
        qkv_b[:C], qkv_b[C:2 * C], qkv_b[2 * C:], proj_b,
        num_heads=H,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_ada_layer_norm_matches_oracle(rng):
    B, N, C = 3, 11, 16
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    cond = rng.normal(size=(B, 2048)).astype(np.float32)
    mod = AdaLayerNorm(num_features=C)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(cond))
    out = mod.apply(params, jnp.asarray(x), jnp.asarray(cond))

    p = params["params"]
    gamma = cond @ np.asarray(p["mlp_gamma"]["kernel"]) + np.asarray(
        p["mlp_gamma"]["bias"])
    beta = cond @ np.asarray(p["mlp_beta"]["kernel"]) + np.asarray(
        p["mlp_beta"]["bias"])
    ref = ada_layer_norm_np(x, gamma[:, None, :], beta[:, None, :])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_bigru_matches_oracle(rng):
    T, B, I, Hd = 5, 2, 12, 8
    x = rng.normal(size=(T, B, I)).astype(np.float32)
    mod = BiGRU(hidden_dim=Hd, num_layers=2)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert out.shape == (T, B, 2 * Hd)

    p = params["params"]

    def run_dir(xs, cell_params, reverse):
        kih = np.asarray(cell_params["ih"]["kernel"]).T
        bih = np.asarray(cell_params["ih"]["bias"])
        khh = np.asarray(cell_params["hh"]["kernel"]).T
        bhh = np.asarray(cell_params["hh"]["bias"])
        h = np.zeros((B, Hd))
        ys = []
        seq = xs[::-1] if reverse else xs
        for t in range(len(seq)):
            h = gru_cell_np(seq[t], h, kih, khh, bih, bhh)
            ys.append(h)
        ys = np.stack(ys)
        return ys[::-1] if reverse else ys

    h0 = x
    for layer in range(2):
        fwd = run_dir(h0, p[f"l{layer}_fwd"], reverse=False)
        bwd = run_dir(h0, p[f"l{layer}_bwd"], reverse=True)
        h0 = np.concatenate([fwd, bwd], axis=-1)
    np.testing.assert_allclose(out, h0, atol=1e-5)


def test_bigru_mid_index_matches_full(rng):
    """mid_index trims the final layer's scans to the steps the mid-frame
    output depends on; the result must equal slicing the full output —
    exactly, on both odd and even mid positions."""
    T, B, I, Hd = 7, 3, 10, 6
    x = jnp.asarray(rng.normal(size=(T, B, I)), jnp.float32)
    mod = BiGRU(hidden_dim=Hd, num_layers=2)
    params = mod.init(jax.random.PRNGKey(0), x)
    full = np.asarray(mod.apply(params, x))
    for mid in (0, T // 2, T - 1):
        mid_out = np.asarray(mod.apply(params, x, mid_index=mid))
        assert mid_out.shape == (B, 2 * Hd)
        np.testing.assert_allclose(mid_out, full[mid], atol=1e-6)


def test_bigru_mid_index_kernel_path(rng):
    """mid_index under the bf16 policy (fused_gru_layer path, interpreted
    off-TPU) must match the f32 scan's mid frame within bf16 tolerance."""
    T, B, I, Hd = 16, 8, 24, 16
    x = jnp.asarray(rng.normal(size=(T, B, I)), jnp.float32)
    scan = BiGRU(hidden_dim=Hd, num_layers=2, dtype=None)
    kern = BiGRU(hidden_dim=Hd, num_layers=2, dtype=jnp.bfloat16)
    params = scan.init(jax.random.PRNGKey(0), x)
    full = np.asarray(scan.apply(params, x), np.float32)
    mid_out = np.asarray(kern.apply(params, x, mid_index=T // 2),
                         np.float32)
    scale = np.abs(full[T // 2]).max()
    assert np.abs(mid_out - full[T // 2]).max() / scale < 0.05


def test_mlp_exact_gelu(rng):
    x = rng.normal(size=(2, 4, 8)).astype(np.float32)
    mod = Mlp(hidden_dim=16, out_dim=8)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    p = params["params"]
    h = x @ np.asarray(p["fc1"]["kernel"]) + np.asarray(p["fc1"]["bias"])
    from scipy.special import erf  # scipy available as a torch dep

    h = h * 0.5 * (1.0 + erf(h / np.sqrt(2.0)))
    ref = h @ np.asarray(p["fc2"]["kernel"]) + np.asarray(p["fc2"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.fixture(scope="module")
def small_pmce():
    art = synthetic_artifacts(seed=0, num_verts=600, num_faces=1200)
    coarse = synthetic_coarsening(sizes=(600, 150, 40))
    model, assets = create_pmce(
        num_joint=17, art=art, coarsening=coarse,
        embed_dim=64, depth=2, seqlen=16)
    rng = np.random.default_rng(0)
    pose2d = rng.normal(size=(2, 16, 17, 2)).astype(np.float32)
    feat = rng.normal(size=(2, 16, 2048)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pose2d),
                        jnp.asarray(feat))
    return model, params, assets, pose2d, feat


def test_pmce_shapes(small_pmce):
    model, params, assets, pose2d, feat = small_pmce
    mesh, evo_pose, pose3d = model.apply(
        params, jnp.asarray(pose2d), jnp.asarray(feat))
    assert mesh.shape == (2, 600, 3)
    assert evo_pose.shape == (2, 17, 3)
    assert pose3d.shape == (2, 17, 3)
    assert len(assets.vj_relation) == 40
    assert all(0 <= v < 17 for v in assets.vj_relation)


def test_pmce_deterministic_inference(small_pmce):
    model, params, _, pose2d, feat = small_pmce
    out1 = model.apply(params, jnp.asarray(pose2d), jnp.asarray(feat))
    out2 = model.apply(params, jnp.asarray(pose2d), jnp.asarray(feat))
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pmce_training_mode_stochastic(small_pmce):
    model, params, _, pose2d, feat = small_pmce
    o1 = model.apply(params, jnp.asarray(pose2d), jnp.asarray(feat),
                     deterministic=False,
                     rngs={"droppath": jax.random.PRNGKey(1),
                           "dropout": jax.random.PRNGKey(2)})
    o2 = model.apply(params, jnp.asarray(pose2d), jnp.asarray(feat),
                     deterministic=False,
                     rngs={"droppath": jax.random.PRNGKey(3),
                           "dropout": jax.random.PRNGKey(4)})
    # Stochastic depth must actually differ between rng draws.
    assert np.abs(np.asarray(o1[0]) - np.asarray(o2[0])).max() > 0


def test_pmce_grads_finite(small_pmce):
    model, params, _, pose2d, feat = small_pmce

    def loss_fn(p):
        mesh, evo, pose3d = model.apply(p, jnp.asarray(pose2d),
                                        jnp.asarray(feat))
        return jnp.mean(mesh ** 2) + jnp.mean(evo ** 2) + jnp.mean(
            (pose3d / 1000) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # Every parameter receives gradient somewhere (no dead branches).
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert np.isfinite(total) and total > 0


def test_pose_lifter_mid_frame_units(rng):
    """The lifter's fusion mixes all T frames; output responds to any frame."""
    model = PoseLifter(num_joints=17, num_frames=16, embed_dim=32, depth=1)
    pose2d = rng.normal(size=(1, 16, 17, 2)).astype(np.float32)
    feat = rng.normal(size=(1, 16, 2048)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pose2d),
                        jnp.asarray(feat))
    out = model.apply(params, jnp.asarray(pose2d), jnp.asarray(feat))
    pose2d_b = pose2d.copy()
    pose2d_b[0, 0] += 1.0  # perturb the FIRST frame only
    out_b = model.apply(params, jnp.asarray(pose2d_b), jnp.asarray(feat))
    assert np.abs(np.asarray(out) - np.asarray(out_b)).max() > 1e-6


def test_bf16_serving_mode(small_pmce):
    """dtype=bf16 keeps the SAME param tree (f32 params) and produces
    outputs close to the f32 path (serving fast path, not metric-grade)."""
    model, params, assets, pose2d, feat = small_pmce
    model_bf16 = model.__class__(**{**{f.name: getattr(model, f.name)
                                       for f in model.__dataclass_fields__.values()
                                       if f.name not in ("parent", "name")},
                                    "dtype": jnp.bfloat16})
    # Same parameter structure: the f32 checkpoint loads directly.
    p2 = model_bf16.init(jax.random.PRNGKey(0), jnp.asarray(pose2d),
                         jnp.asarray(feat))
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(params))
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(params)):
        assert a.dtype == b.dtype == jnp.float32

    out32 = model.apply(params, jnp.asarray(pose2d), jnp.asarray(feat))
    out16 = model_bf16.apply(params, jnp.asarray(pose2d), jnp.asarray(feat))
    for a, b in zip(out16, out32):
        assert a.dtype == jnp.float32
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(b).max()) + 1e-9)
        assert rel < 0.1, rel  # bf16 serving: coarse but sane
