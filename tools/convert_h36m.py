"""CLI: convert reference-format Human3.6M sources to a packed npz.

Usage:
  python tools/convert_h36m.py --data-dir .../Human36M/h36m_data \
      --split train --input-joint-set human36 \
      --smpl-npz data/smpl_neutral.npz \
      --jr-h36m data/J_regressor_h36m_correct.npy \
      --jr-coco data/joint_regressor_coco.npy \
      --out data/Human36M_train_packed.npz

Source layout parity: /root/reference/data/Human36M/dataset.py:194-350
(see pmce_tpu/data/etl/h36m.py).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse

import numpy as np

from pmce_tpu.data.etl import convert_h36m
from pmce_tpu.data.packed import save_packed
from pmce_tpu.smpl.artifacts import SMPLArtifacts, load_or_synthetic


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--split", default="train", choices=["train", "test"])
    ap.add_argument("--input-joint-set", default="human36",
                    choices=["human36", "coco"])
    ap.add_argument("--smpl-npz", default=None,
                    help="converted SMPL artifacts (tools/convert_smpl_pkl)")
    ap.add_argument("--jr-h36m", required=True,
                    help="J_regressor_h36m_correct.npy ([17, 6890])")
    ap.add_argument("--jr-coco", default=None,
                    help="COCO-17 joint regressor npy ([17, 6890])")
    ap.add_argument("--out", required=True)
    ap.add_argument("--debug", action="store_true",
                    help="first subject only (reference --debug)")
    args = ap.parse_args()

    art = (SMPLArtifacts.load(args.smpl_npz) if args.smpl_npz
           else load_or_synthetic("neutral"))
    data = convert_h36m(args.data_dir, args.split, art,
                        input_joint_set=args.input_joint_set,
                        debug=args.debug)
    save_packed(
        data, args.out,
        jr_smpl=art.J_regressor,
        jr_h36m=np.load(args.jr_h36m),
        jr_coco=np.load(args.jr_coco) if args.jr_coco else None)
    print(f"wrote {args.out}: {len(data)} frames")


if __name__ == "__main__":
    main()
