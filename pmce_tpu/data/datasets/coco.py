"""MSCOCO dataset family (train-only, static images).

Protocol parity targets (/root/reference/data/COCO/dataset.py):
- train-only: COCO has no 3D video test protocol;
- each sample is ONE image repeated T=16 times (:283-284) so static-image
  data flows through the same clip-shaped model;
- SMPLify-fit pseudo-GT meshes; synthetic 2D keypoint noise applied to the
  GT projections (``synthesize_pose``, :311-322) — here precomputed into
  ``pose2d_det`` by the ETL / fixture generator using
  ``pmce_tpu.data.noise.synthesize_pose``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pmce_tpu.data.datasets.base import VideoMeshDataset, synthetic_regressors
from pmce_tpu.data.synthetic import generate_sequences
from pmce_tpu.smpl.artifacts import SMPLArtifacts


@dataclasses.dataclass
class StaticImageDataset(VideoMeshDataset):
    """Single-image dataset: every window repeats one frame T times.

    Uses the clip machinery's degenerate (start == end) windows; windows
    exist only for frames with SMPL pseudo-GT.
    """

    def __post_init__(self):
        # Degenerate one-frame windows regardless of the configured
        # chunk mode — and skip the video chunker entirely (it walked
        # every image name only to have its output discarded).
        self.chunk_mode = "static"
        super().__post_init__()

    def evaluate(self, results, verbose: bool = True):
        raise NotImplementedError(
            f"{self.name} is a train-only dataset (no test protocol)")


@dataclasses.dataclass
class MSCOCO(StaticImageDataset):
    name: str = "COCO"

    @classmethod
    def from_synthetic(cls, art: SMPLArtifacts, seed: int = 9,
                       num_images: int = 64, **kw) -> "MSCOCO":
        jr_h36m, jr_coco = synthetic_regressors(art)
        # Static images: one 1-frame "video" per image keeps names unique.
        data = generate_sequences(art, jr_coco, jr_h36m, num_videos=1,
                                  frames_per_video=num_images, seed=seed)
        return cls(data=data, name="COCO",
                   joint_regressor_smpl=art.J_regressor,
                   joint_regressor_h36m=jr_h36m,
                   joint_regressor_coco=jr_coco, **kw)

    @classmethod
    def from_packed(cls, path, split: str = "train", **kw) -> "MSCOCO":
        """Load a packed npz produced by ``tools/convert_coco.py`` (the
        SMPLify fitting gate is precomputed into the validity arrays)."""
        from pmce_tpu.data.packed import load_packed

        data, aux = load_packed(path)
        return cls(data=data, name="COCO",
                   joint_regressor_smpl=aux.get("jr_smpl"),
                   joint_regressor_h36m=aux.get("jr_h36m"),
                   joint_regressor_coco=aux.get("jr_coco"), **kw)
