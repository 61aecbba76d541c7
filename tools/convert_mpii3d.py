"""CLI: convert reference-format MPI-INF-3DHP sources to a packed npz.

Source layout parity: /root/reference/data/MPII3D/dataset.py:126-290
(see pmce_tpu/data/etl/mpii3d.py for the file list).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse

import numpy as np

from pmce_tpu.data.etl import convert_mpii3d
from pmce_tpu.data.packed import save_packed
from pmce_tpu.smpl.artifacts import SMPLArtifacts, load_or_synthetic


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--split", default="train", choices=["train", "val"])
    ap.add_argument("--smpl-npz", default=None)
    ap.add_argument("--jr-h36m", required=True)
    ap.add_argument("--jr-coco", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    art = (SMPLArtifacts.load(args.smpl_npz) if args.smpl_npz
           else load_or_synthetic("neutral"))
    data = convert_mpii3d(args.data_dir, args.split, art)
    save_packed(
        data, args.out,
        jr_smpl=art.J_regressor,
        jr_h36m=np.load(args.jr_h36m),
        jr_coco=np.load(args.jr_coco) if args.jr_coco else None)
    print(f"wrote {args.out}: {len(data)} frames")


if __name__ == "__main__":
    main()
