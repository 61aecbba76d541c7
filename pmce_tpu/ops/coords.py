"""Camera / pixel / world coordinate transforms and bbox utilities.

Functional parity targets in the reference repo:
- cam2pixel / world2cam / pixel2cam: /root/reference/lib/coord_utils.py:128-148
- get_bbox / process_bbox: /root/reference/lib/coord_utils.py:45-90
- normalize_screen_coordinates:
  /root/reference/data/Human36M/dataset.py:532-534

Coordinate transforms are provided both as JAX functions (device, batched)
and are trivially usable from numpy via ``jax.numpy`` broadcasting rules.
Bbox helpers are host-side numpy (they run in the data pipeline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Device-side (JAX) transforms.
# --------------------------------------------------------------------------
def cam2pixel(cam_coord: jax.Array, f: jax.Array, c: jax.Array) -> jax.Array:
    """Perspective-project camera-space points to pixel coordinates.

    Args:
      cam_coord: [..., N, 3] camera-frame points.
      f: [..., 2] focal lengths (fx, fy).
      c: [..., 2] principal point (cx, cy).

    Returns:
      [..., N, 3] (u, v, z).
    """
    z = cam_coord[..., 2]
    x = cam_coord[..., 0] / z * f[..., 0:1] + c[..., 0:1]
    y = cam_coord[..., 1] / z * f[..., 1:2] + c[..., 1:2]
    return jnp.stack([x, y, z], axis=-1)


def world2cam(world_coord: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """World → camera frame: ``R @ x + t``.

    Args:
      world_coord: [..., N, 3].
      R: [..., 3, 3].
      t: [..., 3].

    Returns:
      [..., N, 3].
    """
    return jnp.einsum("...ij,...nj->...ni", R, world_coord) + t[..., None, :]


def pixel2cam(pix_coord: jax.Array, c: jax.Array, f: jax.Array) -> jax.Array:
    """Back-project pixel coordinates (u, v, z) to the camera frame."""
    z = pix_coord[..., 2:3]
    xy = (pix_coord[..., :2] - c[..., None, :]) * z / f[..., None, :]
    return jnp.concatenate([xy, z], axis=-1)


def normalize_screen_coordinates(x: jax.Array, w, h) -> jax.Array:
    """Map pixel (u, v) into the width-normalized [-1, 1] convention.

    Matches the reference: ``X / w * 2 - [1, h / w]``.

    Args:
      x: [..., 2] pixel coordinates.
      w, h: image width / height (python scalars or arrays broadcastable
        against the leading dims of ``x``).
    """
    w = jnp.asarray(w, dtype=jnp.result_type(x, jnp.float32))
    h = jnp.asarray(h, dtype=w.dtype)
    offset = jnp.stack([jnp.ones_like(w), h / w], axis=-1)
    return x / w[..., None, None] * 2.0 - offset[..., None, :]


def weak_perspective_project(pose3d: jax.Array, cam: jax.Array,
                             img_res: float) -> jax.Array:
    """Weak-perspective projection used by the demo camera layer.

    ``out = ((xy + cam[1:3]) * cam[0]) * img_res + img_res`` — exactly the
    reference's OptimzeCamLayer (/root/reference/lib/models/project_net.py:13-16)
    with ``img_res = crop_size / 2``.

    Args:
      pose3d: [..., J, 3].
      cam: [..., 3] (scale, tx, ty).
      img_res: half crop size.

    Returns:
      [..., J, 2] pixel coordinates in the virtual crop.
    """
    xy = pose3d[..., :2] + cam[..., None, 1:3]
    return xy * cam[..., None, 0:1] * img_res + img_res


# --------------------------------------------------------------------------
# Host-side (numpy) bbox helpers for the data pipeline.
# --------------------------------------------------------------------------
def get_bbox(joint_img: np.ndarray) -> np.ndarray:
    """Tight bbox (x, y, w, h) around 2D joints."""
    x, y = joint_img[:, 0], joint_img[:, 1]
    xmin, xmax = float(np.min(x)), float(np.max(x))
    ymin, ymax = float(np.min(y)), float(np.max(y))
    return np.array([xmin, ymin, xmax - xmin, ymax - ymin], dtype=np.float32)


def process_bbox(bbox: np.ndarray, aspect_ratio: float,
                 scale: float = 1.0) -> np.ndarray | None:
    """Sanitize a bbox and pad it to a fixed aspect ratio about its center.

    Args:
      bbox: (x, y, w, h).
      aspect_ratio: target width / height.
      scale: multiplicative padding.

    Returns:
      adjusted (x, y, w, h), or None if the bbox is degenerate.
    """
    x, y, w, h = [float(v) for v in bbox]
    x1, y1, x2, y2 = x, y, x + (w - 1), y + (h - 1)
    if not (w * h > 0 and x2 >= x1 and y2 >= y1):
        return None
    bbox = np.array([x1, y1, x2 - x1, y2 - y1], dtype=np.float32)

    w, h = bbox[2], bbox[3]
    c_x, c_y = bbox[0] + w / 2.0, bbox[1] + h / 2.0
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    bbox[2] = w * scale
    bbox[3] = h * scale
    bbox[0] = c_x - bbox[2] / 2.0
    bbox[1] = c_y - bbox[3] / 2.0
    return bbox


def get_center_scale(bbox: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Bbox → (center, scale) pair used by affine crop transforms."""
    x, y, w, h = bbox
    center = np.array([x + w * 0.5, y + h * 0.5], dtype=np.float32)
    scale = np.array([w, h], dtype=np.float32)
    return center, scale
