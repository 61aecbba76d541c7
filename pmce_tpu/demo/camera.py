"""Weak-perspective camera fitting for the demo overlay.

The reference fits 3 camera parameters (scale, tx, ty) per clip window with
300 Adam steps on an L1 reprojection loss
(/root/reference/main/run_demo.py:134-173, lib/models/project_net.py:6-22).

The projection model is affine in disguise:
    u = (x + tx) · s · r + r,   v = (y + ty) · s · r + r,   r = crop/2
so with a = s·r, bx = s·r·tx, by = s·r·ty the LEAST-SQUARES fit is a 2-var
linear solve per axis-pair — computed in CLOSED FORM for a whole batch of
windows in one jitted call, replacing 300 sequential optimizer steps.

An optax Adam path (`fit_cam_iterative`) is kept for exactness against the
reference's L1 objective; the closed-form L2 solution initializes it, so a
handful of polish steps suffice when L1 robustness matters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from pmce_tpu.ops.coords import weak_perspective_project

_HI = jax.lax.Precision.HIGHEST


@jax.jit
def fit_cam_closed_form(pose3d: jax.Array, target2d: jax.Array,
                        img_res: float | jax.Array) -> jax.Array:
    """Closed-form weak-perspective fit, batched.

    Args:
      pose3d: [..., J, 3] predicted joints (camera frame).
      target2d: [..., J, 2] detected 2D joints in the virtual crop.
      img_res: half crop size (reference: crop_size / 2 = 250).

    Returns:
      [..., 3] camera (scale, tx, ty).
    """
    x = pose3d[..., :2]                      # [..., J, 2]
    t = (target2d - img_res) / img_res       # normalized target
    # Solve per batch: minimize Σ ||a·x + b − t||² with shared scalar a and
    # per-axis offset b = a·(tx, ty).
    xm = jnp.mean(x, axis=-2, keepdims=True)
    tm = jnp.mean(t, axis=-2, keepdims=True)
    xc = x - xm
    tc = t - tm
    a = (jnp.sum(xc * tc, axis=(-2, -1))
         / jnp.maximum(jnp.sum(xc * xc, axis=(-2, -1)), 1e-12))
    # Degenerate fits (collapsed keypoints, anti-correlated joints) can
    # yield a ≤ 0; clamp the scale to a small POSITIVE floor so tx/ty
    # stay bounded instead of exploding to ~1e12 and overflowing the
    # rasterizer's pixel ints downstream. Symmetrically, near-collapsed
    # 3D joints (e.g. an untrained lifter) make `a` explode, projecting
    # the body across tens of crop widths — every triangle then spans
    # the frame and a CPU rasterizer degrades to O(faces·H·W). A body
    # fitted to a detector crop never needs scale > ~4 (the subject
    # would span 4+ crop widths), so cap there; the rasterizer's bbox
    # guards remain the backstop.
    a = jnp.clip(a, 1e-3, 4.0)
    b = tm[..., 0, :] - a[..., None] * xm[..., 0, :]
    tx_ty = b / a[..., None]
    return jnp.concatenate([a[..., None], tx_ty], axis=-1)


@partial(jax.jit, static_argnames=("steps",))
def fit_cam_iterative(pose3d: jax.Array, target2d: jax.Array,
                      img_res: float, steps: int = 50,
                      lr: float = 0.05) -> jax.Array:
    """Adam polish of the closed-form fit under the reference's L1 loss."""
    cam0 = fit_cam_closed_form(pose3d, target2d, img_res)
    tx = optax.adam(lr)

    def loss_fn(cam):
        proj = weak_perspective_project(pose3d, cam, img_res)
        return jnp.mean(jnp.abs(proj - target2d))

    def body(carry, _):
        cam, opt_state = carry
        g = jax.grad(loss_fn)(cam)
        updates, opt_state = tx.update(g, opt_state, cam)
        return (optax.apply_updates(cam, updates), opt_state), None

    (cam, _), _ = jax.lax.scan(body, (cam0, tx.init(cam0)), None,
                               length=steps)
    return cam


def convert_crop_cam_to_orig_img(cam, bbox, img_width: float,
                                 img_height: float):
    """Crop-space weak-perspective camera → full-frame camera.

    Parity: /root/reference/main/run_demo.py:49-67.

    Args:
      cam: [N, 3] (s, tx, ty); bbox: [N, 4] (x, y, w, h).

    Returns:
      [N, 4] (sx, sy, tx, ty) in full-frame normalized coordinates.
    """
    import numpy as np

    cam = np.asarray(cam)
    bbox = np.asarray(bbox)
    x, y, w, h = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    cx, cy = x + w / 2.0, y + h / 2.0
    hw, hh = img_width / 2.0, img_height / 2.0
    sx = cam[:, 0] * (1.0 / (img_width / h))
    sy = cam[:, 0] * (1.0 / (img_height / h))
    tx = ((cx - hw) / hw / sx) + cam[:, 1]
    ty = ((cy - hh) / hh / sy) + cam[:, 2]
    return np.stack([sx, sy, tx, ty], axis=-1)
