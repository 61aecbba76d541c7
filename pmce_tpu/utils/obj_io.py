"""Wavefront OBJ mesh writer (visual-check artifact).

Parity target: ``save_obj`` (/root/reference/lib/funcs_utils.py:52-58) —
the reference dumps predicted meshes every N eval samples for visual
inspection (its main correctness check, SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np


def save_obj(verts: np.ndarray, faces: np.ndarray, path: str) -> None:
    """Write vertices [V, 3] and triangle indices [F, 3] as an .obj."""
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    # Plain "f a b c" (the reference's format): v/vt syntax would
    # reference a texture-coordinate table this file never writes,
    # which strict OBJ consumers reject.
    lines = [f"v {v[0]} {v[1]} {v[2]}" for v in verts]
    lines += [f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}" for f in faces]
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def load_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read back vertices/faces written by ``save_obj``."""
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                faces.append([int(p.split("/")[0]) - 1 for p in parts[1:4]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)
