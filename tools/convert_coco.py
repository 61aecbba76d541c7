"""CLI: convert reference-format MSCOCO sources to a packed npz.

Source layout parity: /root/reference/data/COCO/dataset.py:102-176
(see pmce_tpu/data/etl/coco.py).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse

import numpy as np

from pmce_tpu.data.etl import convert_coco
from pmce_tpu.data.packed import save_packed
from pmce_tpu.smpl.artifacts import SMPLArtifacts, load_or_synthetic


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--annot-dir", required=True)
    ap.add_argument("--smpl-npz", default=None)
    ap.add_argument("--jr-h36m", required=True)
    ap.add_argument("--jr-coco", required=True)
    ap.add_argument("--seed", type=int, default=0,
                    help="seed for the precomputed 2D detector noise")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    art = (SMPLArtifacts.load(args.smpl_npz) if args.smpl_npz
           else load_or_synthetic("neutral"))
    jr_h36m = np.load(args.jr_h36m)
    jr_coco = np.load(args.jr_coco)
    data = convert_coco(args.annot_dir, art, jr_h36m, jr_coco,
                        seed=args.seed)
    save_packed(data, args.out, jr_smpl=art.J_regressor,
                jr_h36m=jr_h36m, jr_coco=jr_coco)
    print(f"wrote {args.out}: {len(data)} frames")


if __name__ == "__main__":
    main()
