"""Demo-pipeline tests: camera fit, preprocess, tracker, renderer,
smooth-bbox, and a self-contained end-to-end video run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pmce_tpu.demo.camera import (
    convert_crop_cam_to_orig_img,
    fit_cam_closed_form,
    fit_cam_iterative,
)
from pmce_tpu.demo.pipeline import demo_window_list, gather_windows
from pmce_tpu.demo.preprocess import crop_resize_normalize, square_crop_bbox
from pmce_tpu.demo.renderer import Renderer, project_weak_perspective
from pmce_tpu.demo.smooth_bbox import (
    gaussian_filter_1d,
    get_all_bbox_params,
    get_smooth_bbox_params,
    median_filter_1d,
)
from pmce_tpu.demo.tracker import BBoxTracker, iou_matrix, track_video
from pmce_tpu.ops.coords import weak_perspective_project


def test_fit_cam_closed_form_recovers_truth(rng):
    B, J = 4, 17
    pose3d = rng.normal(size=(B, J, 3)).astype(np.float32)
    cam_true = np.stack([
        rng.uniform(0.5, 2.0, B),
        rng.uniform(-0.3, 0.3, B),
        rng.uniform(-0.3, 0.3, B)], axis=1).astype(np.float32)
    target = np.asarray(weak_perspective_project(
        jnp.asarray(pose3d), jnp.asarray(cam_true), 250.0))
    cam_fit = np.asarray(fit_cam_closed_form(
        jnp.asarray(pose3d), jnp.asarray(target), 250.0))
    np.testing.assert_allclose(cam_fit, cam_true, atol=1e-3)


def test_fit_cam_iterative_improves_l1(rng):
    B, J = 2, 17
    pose3d = rng.normal(size=(B, J, 3)).astype(np.float32)
    cam_true = np.array([[1.2, 0.1, -0.2], [0.8, -0.1, 0.3]], np.float32)
    target = np.array(weak_perspective_project(
        jnp.asarray(pose3d), jnp.asarray(cam_true), 250.0))
    # Heavy-tailed outliers: L1 polish should not diverge from closed form.
    target[0, 0] += 200.0
    cam = np.asarray(fit_cam_iterative(jnp.asarray(pose3d),
                                       jnp.asarray(target), 250.0))
    assert np.all(np.isfinite(cam))
    np.testing.assert_allclose(cam[1], cam_true[1], atol=0.05)


def test_convert_crop_cam():
    cam = np.array([[1.0, 0.0, 0.0]], np.float32)
    bbox = np.array([[400.0, 200.0, 200.0, 200.0]], np.float32)  # xywh
    out = convert_crop_cam_to_orig_img(cam, bbox, 1000, 500)
    sx, sy, tx, ty = out[0]
    assert sx == pytest.approx(1.0 * 200 / 1000)
    assert sy == pytest.approx(1.0 * 200 / 500)
    # Center of bbox = (500, 300): tx=0 would be frame center 500.
    assert tx == pytest.approx(((500 - 500) / 500) / sx + 0.0)
    assert ty == pytest.approx(((300 - 250) / 250) / sy + 0.0)


def test_crop_resize_normalize_constant_region(rng):
    frames = np.zeros((2, 64, 80, 3), np.uint8)
    frames[:, 10:30, 20:40] = 200
    bboxes = np.array([[20, 10, 20, 20], [20, 10, 20, 20]], np.float32)
    out = np.asarray(crop_resize_normalize(jnp.asarray(frames),
                                           jnp.asarray(bboxes),
                                           out_size=32))
    assert out.shape == (2, 3, 32, 32)
    # The crop covers a constant-200 region: normalized value everywhere.
    expected = (200 / 255.0 - 0.485) / 0.229
    np.testing.assert_allclose(out[0, 0, 8:24, 8:24], expected, atol=1e-2)


def test_crop_resize_identity(rng):
    """Cropping the full frame at native size reproduces the frame."""
    frame = rng.integers(0, 255, size=(1, 16, 16, 3)).astype(np.uint8)
    bbox = np.array([[0, 0, 16, 16]], np.float32)
    out = np.asarray(crop_resize_normalize(jnp.asarray(frame),
                                           jnp.asarray(bbox), out_size=16))
    mean = np.array([0.485, 0.456, 0.406]).reshape(3, 1, 1)
    std = np.array([0.229, 0.224, 0.225]).reshape(3, 1, 1)
    recovered = (out * std + mean) * 255.0
    np.testing.assert_allclose(
        recovered[0], frame[0].transpose(2, 0, 1), atol=0.51)


def test_square_crop_bbox():
    out = square_crop_bbox(np.array([10.0, 20.0, 40.0, 20.0]), scale=1.0)
    np.testing.assert_allclose(out, [10.0, 10.0, 40.0, 40.0])


def test_tracker_two_people():
    rng = np.random.default_rng(0)
    dets = []
    for t in range(30):
        a = [100 + 2 * t, 100, 50, 100]
        b = [400 - 2 * t, 150, 60, 110]
        pair = [a, b] if t % 2 == 0 else [b, a]  # shuffled det order
        dets.append(np.array(pair, np.float32)
                    + rng.normal(scale=1.0, size=(2, 4)))
    tracks = track_video(dets, min_frames=25)
    assert len(tracks) == 2
    for tr in tracks.values():
        assert len(tr["frames"]) == 30
        # Each track is one person: x-center moves monotonically.
        cx = tr["bbox"][:, 0]
        diffs = np.diff(cx)
        assert (diffs > -5).all() or (diffs < 5).all()


def test_tracker_handles_gaps():
    dets = []
    for t in range(20):
        if 8 <= t < 11:
            dets.append(np.empty((0, 4), np.float32))  # occlusion
        else:
            dets.append(np.array([[100.0 + t, 100, 50, 100]], np.float32))
    tracks = track_video(dets, min_frames=10)
    assert len(tracks) == 1  # track survives the 3-frame gap


def test_iou_matrix():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 0, 10, 10], [20, 20, 5, 5]],
                 np.float32)
    m = iou_matrix(a, b)
    np.testing.assert_allclose(m[0], [1.0, 50 / 150, 0.0], atol=1e-6)


def test_smooth_bbox():
    rng = np.random.default_rng(0)
    kps = []
    for t in range(40):
        kp = np.zeros((17, 3), np.float32)
        kp[:, 0] = 100 + t + rng.normal(scale=0.5, size=17)
        kp[:, 1] = 200 + rng.normal(scale=0.5, size=17)
        kp[:, 1][::2] += 80  # give the person some height
        kp[:, 2] = 9.0
        kps.append(kp if t not in (10, 11) else None)  # a gap
    params, start, end = get_all_bbox_params(kps, vis_thresh=2)
    assert start == 0 and end == 40
    assert len(params) == 40  # gap interpolated
    smoothed, s2, _ = get_smooth_bbox_params(kps, vis_thresh=2)
    assert smoothed.shape[0] >= 40
    # Smoothing reduces total variation.
    tv_raw = np.abs(np.diff(params[:, 0])).sum()
    tv_smooth = np.abs(np.diff(smoothed[:40, 0])).sum()
    assert tv_smooth <= tv_raw + 1e-3


def test_filters_match_definitions():
    x = np.array([1.0, 9.0, 1.0, 1.0, 8.0, 1.0, 1.0])
    med = median_filter_1d(x, 3)
    np.testing.assert_allclose(med[1:-1],
                               [1, 1, 1, 1, 1])
    g = gaussian_filter_1d(np.ones(20), sigma=2.0)
    np.testing.assert_allclose(g, 1.0, atol=1e-6)


def test_demo_window_list():
    windows = demo_window_list(40, 16)
    assert len(windows) == 40
    mids = [s if s == e else s + 8 for s, e in windows]
    assert mids == list(range(40))
    arr = np.arange(40, dtype=np.float32)[:, None]
    w = gather_windows(arr, windows)
    assert w.shape == (40, 16, 1)
    np.testing.assert_array_equal(w[0], np.zeros((16, 1)))  # singleton f0


def test_demo_window_list_short_tracklets():
    """n < seqlen must keep one window per frame with valid indices
    (the old edge-padding math emitted 15 windows for ANY short n, with
    out-of-range frame indices — crashing the camera fit)."""
    for n in (1, 2, 5, 10, 15, 16, 17):
        windows = demo_window_list(n, 16)
        assert len(windows) == n, n
        mids = [s if s == e else s + 8 for s, e in windows]
        assert mids == list(range(n)), n
        for s, e in windows:
            assert 0 <= s <= e < n, (n, s, e)


def test_pose_crop_decode_round_trip(rng):
    """A known image point must survive crop → (simulated) heatmap →
    heatmap_to_image_coords. Round 2 review: the 256×256-crop-sliced-
    to-192-columns path skewed every x by 4/3 of the box offset."""
    from pmce_tpu.demo.preprocess import crop_resize_normalize
    from pmce_tpu.models.vitpose import heatmap_to_image_coords

    H, W = 240, 320
    box = np.array([[40.0, 30.0, 96.0, 128.0]], np.float32)  # x y w h
    # A bright dot at a known box-relative position (u, v).
    u, v = 0.625, 0.3125
    px = int(box[0, 0] + u * box[0, 2])
    py = int(box[0, 1] + v * box[0, 3])
    frame = np.zeros((1, H, W, 3), np.uint8)
    frame[0, py - 1 : py + 2, px - 1 : px + 2] = 255

    crop = np.asarray(crop_resize_normalize(
        jnp.asarray(frame), jnp.asarray(box), out_size=(256, 192)))
    # Brightest crop pixel ≈ (v·256, u·192).
    flat = crop[0, 0]                     # one channel, [256, 192]
    iy, ix = np.unravel_index(np.argmax(flat), flat.shape)
    assert abs(ix - u * 192) <= 2.0, (ix, u * 192)
    assert abs(iy - v * 256) <= 2.0, (iy, v * 256)

    # Decode from heatmap coordinates back to full-frame pixels.
    kp_hm = np.array([[[u * 48, v * 64]]], np.float32)   # [1, 1, 2]
    img_xy = heatmap_to_image_coords(kp_hm, box,
                                     heatmap_size=(64, 48),
                                     crop_size=(256, 192))
    np.testing.assert_allclose(img_xy[0, 0], [px, py], atol=1.5)


def test_renderer_draws_mesh(smpl_artifacts):
    img = np.zeros((120, 160, 3), np.uint8)
    renderer = Renderer(smpl_artifacts.faces, resolution=(160, 120))
    verts = smpl_artifacts.v_template.copy()
    cam = np.array([0.7, 0.7, 0.0, 0.0], np.float32)
    out = renderer.render(img, verts, cam)
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn
    # Original is untouched (render returns a copy).
    assert img.sum() == 0


def test_renderer_native_matches_numpy(smpl_artifacts):
    from pmce_tpu import native
    from pmce_tpu.demo.renderer import _rasterize_numpy

    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain")
    img = np.zeros((80, 100, 3), np.uint8)
    renderer = Renderer(smpl_artifacts.faces[:200], resolution=(100, 80))
    verts = smpl_artifacts.v_template
    cam = np.array([0.8, 0.8, 0.0, 0.0], np.float32)
    out_native = renderer.render(img, verts, cam)
    screen = project_weak_perspective(verts, cam, 100, 80)
    out_np = img.copy()
    _rasterize_numpy(screen, renderer.faces, out_np,
                     np.asarray(renderer.render.__defaults__[0],
                                np.float32), renderer.alpha,
                     renderer.max_tri_px, renderer.budget_px)
    # Identical algorithm: allow ±1 from float rounding on a few pixels.
    diff = np.abs(out_native.astype(int) - out_np.astype(int))
    assert (diff <= 1).mean() > 0.999


def test_renderer_degenerate_mesh_bounded(smpl_artifacts):
    """A broken camera fit (screen-filling triangles) must be skipped by
    the per-triangle bbox cap, not rasterized at O(faces*H*W) — the
    failure mode measured at 862.8 ms/frame in the round-4 telemetry."""
    import time

    h, w = 240, 320
    img = np.zeros((h, w, 3), np.uint8)
    renderer = Renderer(smpl_artifacts.faces, resolution=(w, h))
    # Blow the mesh up ~200x so every triangle's bbox clips to ~the frame.
    verts = smpl_artifacts.v_template * 200.0
    cam = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    t0 = time.perf_counter()
    renderer.render(img, verts, cam)
    dt = time.perf_counter() - t0
    skipped_area, skipped_budget = renderer.last_stats
    # Every frame-crossing face is skipped by the cap (fully off-frame
    # faces clip to nothing and cost nothing); the render stays
    # interactive instead of O(faces*H*W).
    assert skipped_area > 0
    assert dt < 0.25, f"degenerate render took {dt * 1e3:.0f} ms"
    # A sane render at the same resolution triggers neither guard.
    renderer.render(img, smpl_artifacts.v_template,
                    np.array([0.7, 0.7, 0.0, 0.0], np.float32))
    assert renderer.last_stats == (0, 0)


def test_renderer_guard_parity_native_numpy(smpl_artifacts):
    """C++ and numpy paths make identical skip decisions on a mesh that
    trips both guards (clipped-bbox accounting is shared semantics)."""
    from pmce_tpu import native
    from pmce_tpu.demo.renderer import _rasterize_numpy

    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain")
    h, w = 60, 80
    img = np.zeros((h, w, 3), np.uint8)
    rng = np.random.default_rng(7)
    # Mixed-size triangle soup: frame-scale faces (trip the per-triangle
    # cap) followed by many small ones (exhaust the coverage budget).
    big = rng.uniform([-w, -h, 0.5], [2 * w, 2 * h, 2.0],
                      (50, 3, 3)).astype(np.float32)
    base = rng.uniform([5, 5, 0.5], [w - 20, h - 20, 2.0], (150, 1, 3))
    small = (base + rng.uniform(0, 15, (150, 3, 3))
             * [1, 1, 0]).astype(np.float32)
    verts = np.concatenate([big, small]).reshape(-1, 3)
    faces = np.arange(600, dtype=np.int32).reshape(200, 3)
    renderer = Renderer(faces, resolution=(w, h), max_tri_frac=0.1,
                        coverage_budget=2.0)
    renderer._lib = lib
    # Bypass projection: feed screen coords through a unit camera by
    # calling the raster layers directly.
    import ctypes

    out_native = img.copy()
    depth = np.full((h, w), np.inf, np.float32)
    stats = np.zeros(2, np.int32)
    color = np.asarray((255.0, 160.0, 128.0), np.float32)
    lib.rasterize_mesh(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
        out_native.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        color.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 0.9,
        renderer.max_tri_px, renderer.budget_px,
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    out_np = img.copy()
    np_stats = _rasterize_numpy(verts, faces, out_np, color, 0.9,
                                renderer.max_tri_px, renderer.budget_px)
    assert (int(stats[0]), int(stats[1])) == np_stats
    assert np_stats[0] > 0 and np_stats[1] > 0  # both guards exercised
    diff = np.abs(out_native.astype(int) - out_np.astype(int))
    assert (diff <= 1).mean() > 0.999
