"""Person detector: training on synthetic renders → localization quality.

The detector replaces the reference's external YOLOv3 dependency
(/root/reference/main/run_demo.py:199-215); these tests train the tiny
variant on rasterizer-rendered SMPL bodies and require IoU ≥ 0.5 against
the GT silhouette boxes on held-out renders.
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pmce_tpu.demo.detector import (
    INPUT_SIZE,
    Detector,
    decode_detections,
    make_targets,
    render_training_set,
    train_detector,
)
from pmce_tpu.smpl.artifacts import synthetic_artifacts


def iou(a, b):
    ax2, ay2 = a[0] + a[2], a[1] + a[3]
    bx2, by2 = b[0] + b[2], b[1] + b[3]
    ix = max(0.0, min(ax2, bx2) - max(a[0], b[0]))
    iy = max(0.0, min(ay2, by2) - max(a[1], b[1]))
    inter = ix * iy
    return inter / (a[2] * a[3] + b[2] * b[3] - inter + 1e-9)


@pytest.fixture(scope="module")
def art():
    return synthetic_artifacts(seed=0, num_verts=400, num_faces=700)


def test_targets_roundtrip():
    boxes = np.array([[32.0, 40.0, 48.0, 64.0]], np.float32)
    tgt = make_targets(boxes)
    s = INPUT_SIZE // 8
    assert tgt["heat"].shape == (1, s, s)
    iy, ix = np.unravel_index(np.argmax(tgt["heat"][0]), (s, s))
    assert tgt["mask"][0, iy, ix] == 1.0
    np.testing.assert_allclose(
        tgt["size"][0, iy, ix] * INPUT_SIZE, (48.0, 64.0))


def test_trained_detector_localizes(art):
    params = train_detector(art, steps=300, batch=16, n_frames=96, seed=0,
                            width=16)
    frames, boxes = render_training_set(art, 16, seed=99)  # held out
    det = Detector(params=params, width=16, score_thresh=0.25)
    found = det.detect_video((frames * 255).astype(np.uint8))
    hits = 0
    for i in range(len(frames)):
        if len(found[i]) and iou(found[i][0], boxes[i]) >= 0.5:
            hits += 1
    assert hits >= 12, f"only {hits}/16 held-out renders localized"


def test_decode_shapes(art):
    import jax
    import jax.numpy as jnp

    from pmce_tpu.demo.detector import PersonDetector

    m = PersonDetector(width=8)
    x = jnp.zeros((2, INPUT_SIZE, INPUT_SIZE, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    boxes, scores = decode_detections(m.apply(params, x), top_k=3)
    assert boxes.shape == (2, 3, 4)
    assert scores.shape == (2, 3)
