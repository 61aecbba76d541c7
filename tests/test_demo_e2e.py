"""Self-contained end-to-end demo run: render synthetic frames of a moving
synthetic body, detect it by background subtraction, track it, and recover
meshes + cameras + an overlay video — no external data or detectors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pmce_tpu.demo.pipeline import DemoConfig, DemoModels, DemoPipeline
from pmce_tpu.demo.renderer import Renderer
from pmce_tpu.models.pmce import create_pmce
from pmce_tpu.smpl.artifacts import synthetic_artifacts
from pmce_tpu.smpl.layer import SMPLModel, smpl_forward
from pmce_tpu.smpl.mesh import synthetic_coarsening


@pytest.fixture(scope="module")
def demo_setup(rng):
    art = synthetic_artifacts(seed=0, num_verts=600, num_faces=1200)
    coarse = synthetic_coarsening(sizes=(600, 150, 40))

    # ---- synthesize a video: a body walking across the frame ----
    T, H, W = 40, 120, 160
    model = SMPLModel.from_artifacts(art)
    pose = np.zeros((T, 72), np.float32)
    pose[:, 50] = np.linspace(0, 0.6, T)      # move an arm
    verts, joints = smpl_forward(model, jnp.asarray(pose),
                                 jnp.zeros((T, 10)))
    verts = np.asarray(verts)
    renderer = Renderer(art.faces, resolution=(W, H), alpha=1.0)
    frames = np.full((T, H, W, 3), 30, np.uint8)
    for t in range(T):
        # Slide the person horizontally via the camera tx.
        cam = np.array([0.55, 0.55 * H / W * (W / H),
                        -0.5 + t / T, 0.0], np.float32)
        cam = np.array([0.45, 0.45 * (W / H), -0.6 + 1.2 * t / T, 0.0],
                       np.float32)
        frames[t] = renderer.render(frames[t], verts[t], cam)

    # ---- background-subtraction person detector ----
    detections = []
    for t in range(T):
        fg = np.any(frames[t] != 30, axis=-1)
        ys, xs = np.nonzero(fg)
        x0, x1 = xs.min(), xs.max()
        y0, y1 = ys.min(), ys.max()
        detections.append(np.array(
            [[x0, y0, x1 - x0 + 1, y1 - y0 + 1]], np.float32))

    # ---- detector keypoints: project GT joints (17 used as coco-17) ----
    jr17 = np.random.default_rng(1).random((17, 600)).astype(np.float32)
    jr17 /= jr17.sum(1, keepdims=True)
    kps_per_frame = []
    for t in range(T):
        # screen-space joints from the same camera used for rendering
        cam = np.array([0.45, 0.45 * (W / H), -0.6 + 1.2 * t / T, 0.0],
                       np.float32)
        from pmce_tpu.demo.renderer import project_weak_perspective

        j = project_weak_perspective(jr17 @ verts[t], cam, W, H)
        kp = np.concatenate([j[:, :2],
                             np.ones((17, 1), np.float32)], axis=1)
        kps_per_frame.append(kp[None])
    return art, coarse, jr17, frames, detections, kps_per_frame


def test_demo_end_to_end(demo_setup):
    art, coarse, jr17, frames, detections, kps = demo_setup

    pmce, _assets = create_pmce(num_joint=19, art=art, coarsening=coarse,
                                joint_regressor_h36m=jr17,
                                embed_dim=32, depth=1)
    rngk = jax.random.PRNGKey(0)
    params = pmce.init(rngk, jnp.zeros((1, 16, 19, 2)),
                       jnp.zeros((1, 16, 2048)))
    pmce_apply = jax.jit(lambda a, b: pmce.apply(params, a, b))

    # Cheap stand-in feature extractor (the ResNet-50 has its own tests):
    # a fixed random projection of the crop.
    key = jax.random.PRNGKey(1)
    wfeat = jax.random.normal(key, (3 * 16 * 16, 2048)) * 0.01

    @jax.jit
    def feature_apply(crops):
        small = crops[:, :, ::14, ::14]  # [N, 3, 16, 16]
        return small.reshape(small.shape[0], -1) @ wfeat

    models = DemoModels(
        pmce_apply=pmce_apply, feature_apply=feature_apply,
        pose2d_apply=None, joint_regressor=jr17, faces=art.faces)
    pipe = DemoPipeline(models, DemoConfig(min_track_frames=25,
                                           window_batch=8,
                                           feature_batch=16))

    results, rendered = pipe.run(frames, detections,
                                 keypoints_per_frame=kps, render=True)
    assert len(results) == 1
    res = next(iter(results.values()))
    T = len(frames)
    assert res["mesh"].shape == (T, 600, 3)
    assert res["cam"].shape == (T, 3)
    assert res["orig_cam"].shape == (T, 4)
    assert np.all(np.isfinite(res["mesh"]))
    assert np.all(np.isfinite(res["cam"]))
    assert rendered.shape == frames.shape
    # An UNTRAINED model's fitted camera may land the overlay off-screen,
    # so pixel changes aren't asserted here (renderer correctness is
    # covered by test_demo.py); rendering must at least run cleanly.
    assert rendered.dtype == np.uint8


def test_demo_vitpose_path(demo_setup):
    """Exercise the ViTPose stage with the tiny config (random weights —
    checks shapes/wiring, not accuracy)."""
    from pmce_tpu.models.vitpose import ViTPose, ViTPoseConfig

    art, coarse, jr17, frames, detections, _ = demo_setup
    cfg = ViTPoseConfig.tiny()
    vp = ViTPose(cfg)
    variables = vp.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 256, 192)))
    vp_apply = jax.jit(lambda crops: vp.apply(variables, crops))

    pmce, _ = create_pmce(num_joint=19, art=art, coarsening=coarse,
                          joint_regressor_h36m=jr17,
                          embed_dim=32, depth=1)
    params = pmce.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 19, 2)),
                       jnp.zeros((1, 16, 2048)))
    pmce_apply = jax.jit(lambda a, b: pmce.apply(params, a, b))

    wfeat = jax.random.normal(jax.random.PRNGKey(1),
                              (3 * 16 * 16, 2048)) * 0.01

    @jax.jit
    def feature_apply(crops):
        small = crops[:, :, ::14, ::14]
        return small.reshape(small.shape[0], -1) @ wfeat

    models = DemoModels(pmce_apply=pmce_apply, feature_apply=feature_apply,
                        pose2d_apply=vp_apply, joint_regressor=jr17,
                        faces=art.faces)
    pipe = DemoPipeline(models, DemoConfig(min_track_frames=25,
                                           window_batch=8,
                                           feature_batch=16))
    results, _ = pipe.run(frames[:30], detections[:30], render=False)
    assert len(results) == 1
    res = next(iter(results.values()))
    assert res["mesh"].shape[0] == 30
    assert np.all(np.isfinite(res["mesh"]))
