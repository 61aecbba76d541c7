"""ResNet-50/HMR and ViTPose backbone tests (small inputs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pmce_tpu.models.spin import HMR, ResNet50, SMPLRegressor
from pmce_tpu.models.vitpose import (
    ViTPose,
    ViTPoseConfig,
    decode_heatmaps,
    heatmap_to_image_coords,
)


def test_resnet50_feature_shape(rng):
    model = ResNet50()
    x = jnp.asarray(rng.normal(size=(2, 3, 64, 64)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    feat = model.apply(variables, x)
    assert feat.shape == (2, 2048)
    assert bool(jnp.all(jnp.isfinite(feat)))


def test_smpl_regressor_iterates(rng):
    model = SMPLRegressor()
    feat = jnp.asarray(rng.normal(size=(2, 2048)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feat)
    out = model.apply(variables, feat)
    assert out["rotmat"].shape == (2, 24, 3, 3)
    assert out["shape"].shape == (2, 10)
    assert out["cam"].shape == (2, 3)
    # Rotations are valid.
    R = np.asarray(out["rotmat"]).reshape(-1, 3, 3)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_hmr_full(rng):
    model = HMR()
    x = jnp.asarray(rng.normal(size=(1, 3, 64, 64)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    feat, out = model.apply(variables, x, return_features=True)
    assert feat.shape == (1, 2048)
    assert out["rotmat"].shape == (1, 24, 3, 3)


def test_vitpose_tiny(rng):
    cfg = ViTPoseConfig.tiny()
    model = ViTPose(cfg)
    x = jnp.asarray(rng.normal(size=(2, 3, 256, 192)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    hm = model.apply(variables, x)
    assert hm.shape == (2, 17, 64, 48)


def test_decode_heatmaps_peak():
    hm = np.zeros((1, 2, 64, 48), np.float32)
    hm[0, 0, 20, 30] = 5.0
    hm[0, 0, 20, 31] = 2.0  # gradient → quarter offset toward +x
    hm[0, 1, 5, 7] = 3.0
    kps, scores = decode_heatmaps(jnp.asarray(hm))
    kps = np.asarray(kps)
    assert kps[0, 0, 0] == 30.25 and kps[0, 0, 1] == 20.0
    assert abs(kps[0, 1, 0] - 7) <= 0.25 and abs(kps[0, 1, 1] - 5) <= 0.25
    assert float(scores[0, 0]) == 5.0


def test_decode_heatmaps_border_peaks_unshifted():
    """mmpose 'default' decoding applies the quarter offset only at
    interior peaks — a border peak keeps its integer coordinate (an
    unconditional offset could even go NEGATIVE at x=0)."""
    hm = np.zeros((1, 3, 64, 48), np.float32)
    hm[0, 0, 10, 0] = 5.0     # peak at left edge, downhill to the right
    hm[0, 0, 10, 1] = 2.0
    hm[0, 1, 0, 20] = 4.0     # peak at top edge
    hm[0, 2, 10, 1] = 4.0     # px == 1: still NOT interior (1 < px)
    kps, _ = decode_heatmaps(jnp.asarray(hm))
    kps = np.asarray(kps)
    np.testing.assert_array_equal(kps[0, 0], [0.0, 10.0])
    np.testing.assert_array_equal(kps[0, 1], [20.0, 0.0])
    np.testing.assert_array_equal(kps[0, 2], [1.0, 10.0])


def test_heatmap_to_image_coords():
    kps = np.array([[[24.0, 32.0]]], np.float32)  # heatmap center (64x48)
    bbox = np.array([[100.0, 50.0, 192.0, 256.0]], np.float32)
    out = heatmap_to_image_coords(kps, bbox, (64, 48), (256, 192))
    # Heatmap center → crop center → bbox center.
    np.testing.assert_allclose(out[0, 0], [100 + 96, 50 + 128], atol=2.1)
