"""CLI: convert reference-format 3DPW sources to a packed npz.

Gendered SMPL GT: pass --smpl-male / --smpl-female artifact npz files
(converted from the gendered pkls); missing genders fall back to neutral.
Source layout parity: /root/reference/data/PW3D/dataset.py:90-183.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse

import numpy as np

from pmce_tpu.data.etl import convert_pw3d
from pmce_tpu.data.packed import save_packed
from pmce_tpu.smpl.artifacts import SMPLArtifacts, load_or_synthetic


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--split", default="test", choices=["train", "test"])
    ap.add_argument("--smpl-npz", default=None, help="neutral artifacts")
    ap.add_argument("--smpl-male", default=None)
    ap.add_argument("--smpl-female", default=None)
    ap.add_argument("--jr-h36m", required=True)
    ap.add_argument("--jr-coco", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    neutral = (SMPLArtifacts.load(args.smpl_npz) if args.smpl_npz
               else load_or_synthetic("neutral"))
    arts = {"neutral": neutral}
    for gender, path in (("male", args.smpl_male),
                         ("female", args.smpl_female)):
        if path:
            arts[gender] = SMPLArtifacts.load(path)
        else:
            print(f"warning: no --smpl-{gender} given; "
                  f"falling back to neutral for {gender} subjects")
    data = convert_pw3d(args.data_dir, args.split, arts)
    save_packed(
        data, args.out,
        jr_smpl=neutral.J_regressor,
        jr_h36m=np.load(args.jr_h36m),
        jr_coco=np.load(args.jr_coco) if args.jr_coco else None)
    print(f"wrote {args.out}: {len(data)} frames")


if __name__ == "__main__":
    main()
