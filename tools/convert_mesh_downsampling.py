#!/usr/bin/env python
"""Offline converter: COMA ``mesh_downsampling.npz`` → dense operators.

The reference's file stores pickled scipy-sparse A/U/D matrix lists
(/root/reference/lib/models/backbones/mesh.py:49-57). This converts them
once into the dense row-major operators the TPU runtime multiplies with
(431×6890 f32 ≈ 11 MB — MXU-friendly).

Usage:
  python tools/convert_mesh_downsampling.py mesh_downsampling.npz \
      data/base_data/mesh_coarsening.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def convert(src: str, out: str) -> None:
    data = np.load(src, encoding="latin1", allow_pickle=True)
    D = [np.asarray(m.todense(), dtype=np.float32) for m in data["D"]]
    U = [np.asarray(m.todense(), dtype=np.float32) for m in data["U"]]

    from pmce_tpu.smpl.mesh import MeshCoarsening

    mesh = MeshCoarsening(D=tuple(D), U=tuple(U))
    mesh.validate()
    mesh.save(out)
    print(f"wrote {out}: sizes={mesh.sizes}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    a = ap.parse_args()
    sys.path.insert(0, ".")
    convert(a.src, a.out)
