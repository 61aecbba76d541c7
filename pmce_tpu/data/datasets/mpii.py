"""MPII dataset family (train-only, static images).

Protocol parity target: /root/reference/data/MPII/dataset.py — same
pattern as COCO (single image repeated T=16, NeuralAnnot SMPL pseudo-GT,
no test protocol).
"""

from __future__ import annotations

import dataclasses

from pmce_tpu.data.datasets.base import synthetic_regressors
from pmce_tpu.data.datasets.coco import StaticImageDataset
from pmce_tpu.data.synthetic import generate_sequences
from pmce_tpu.smpl.artifacts import SMPLArtifacts


@dataclasses.dataclass
class MPII(StaticImageDataset):
    name: str = "MPII"

    @classmethod
    def from_synthetic(cls, art: SMPLArtifacts, seed: int = 11,
                       num_images: int = 64, **kw) -> "MPII":
        jr_h36m, jr_coco = synthetic_regressors(art)
        data = generate_sequences(art, jr_coco, jr_h36m, num_videos=1,
                                  frames_per_video=num_images, seed=seed)
        return cls(data=data, name="MPII",
                   joint_regressor_smpl=art.J_regressor,
                   joint_regressor_h36m=jr_h36m,
                   joint_regressor_coco=jr_coco, **kw)

    @classmethod
    def from_packed(cls, path, split: str = "train", **kw) -> "MPII":
        """Load a packed npz produced by ``tools/convert_mpii.py``."""
        from pmce_tpu.data.packed import load_packed

        data, aux = load_packed(path)
        return cls(data=data, name="MPII",
                   joint_regressor_smpl=aux.get("jr_smpl"),
                   joint_regressor_h36m=aux.get("jr_h36m"),
                   joint_regressor_coco=aux.get("jr_coco"), **kw)
