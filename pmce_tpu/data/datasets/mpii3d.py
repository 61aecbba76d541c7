"""MPI-INF-3DHP dataset family.

Protocol parity targets (/root/reference/data/MPII3D/dataset.py):
- train: NeuralAnnot SMPL fits, COCO-19 noisy 2D inputs, a 2D-reprojection
  fitting gate (threshold in 64×64-crop pixels, :31,368-380) zeroing ALL
  validities on bad fits;
- val: SPIN-format 3D joints converted to the H36M-17 ordering via the
  keypoint vocabularies (:266-272), ViTPose 2D inputs, mesh targets zeroed
  (:495-502) — mesh metrics are reported as 0 and only joints count;
- evaluation: joint-only MPJPE/PA-MPJPE/ACCEL, root joint 0 (:560-625).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pmce_tpu.data.datasets.base import VideoMeshDataset, synthetic_regressors
from pmce_tpu.data.evaluation import evaluate_joints
from pmce_tpu.data.synthetic import generate_sequences
from pmce_tpu.smpl.artifacts import SMPLArtifacts

FITTING_THR_CROP_PX = 3.0


def reprojection_fit_mask(pred_pose2d: np.ndarray, gt_pose2d: np.ndarray,
                          bbox_size: np.ndarray,
                          thr_px: float = FITTING_THR_CROP_PX) -> np.ndarray:
    """Train-split quality gate in 64×64-crop pixel units.

    Parity: MPII3D ``get_fitting_error`` — detector 2D vs GT 2D distance
    scaled into a 64-pixel crop; mean distance > thr ⇒ invalid.

    Args:
      pred_pose2d, gt_pose2d: [N, J, 2] pixels.
      bbox_size: [N] tight-bbox edge length in pixels.
    """
    scale = 64.0 / np.maximum(bbox_size, 1e-6)
    err = np.linalg.norm(pred_pose2d - gt_pose2d, axis=-1)
    err = err.mean(-1) * scale
    return err <= thr_px


def apply_reprojection_gate(data) -> None:
    """Train gate: zero ALL loss validities on bad fits, keep the windows
    (reference /root/reference/data/MPII3D/dataset.py:440-443)."""
    bbox = (data.joint_img.max(1) - data.joint_img.min(1)).max(-1)
    good = reprojection_fit_mask(
        data.pose2d_det[:, :17], data.joint_img[:, :17], bbox)
    v = (data.has_smpl & good).astype(np.float32)
    data.mesh_valid = v
    data.lift_valid = v.copy()
    data.reg_valid = v.copy()


@dataclasses.dataclass
class MPII3D(VideoMeshDataset):
    name: str = "MPII3D"
    is_val: bool = False

    def get_batch(self, idxs):
        batch = super().get_batch(idxs)
        if self.is_val:
            # Mesh and lift targets are unavailable at val: zero targets
            # and validities (reference :495-502).
            batch["mesh"] = np.zeros_like(batch["mesh"])
            batch["mesh_valid"] = np.zeros_like(batch["mesh_valid"])
            batch["lift_pose3d"] = np.zeros_like(batch["lift_pose3d"])
            batch["lift_pose3d_valid"] = np.zeros_like(
                batch["lift_pose3d_valid"])
        return batch

    def evaluate(self, results: list, verbose: bool = True):
        """MPII3D reports joints only (mesh GT does not exist at val)."""
        out = evaluate_joints(
            pred=np.stack([np.asarray(r["joint_coord"]) for r in results]),
            gt=np.stack(
                [np.asarray(r["joint_coord_target"]) for r in results]),
            seq_names=self.seq_names(),
            root_idx=0,
        )
        if verbose:
            print(out.summary(tag="MPII3D "))
        return out

    @classmethod
    def from_synthetic(cls, art: SMPLArtifacts, split: str = "train",
                       seed: int = 5, num_videos: int = 2,
                       frames_per_video: int = 48, **kw) -> "MPII3D":
        jr_h36m, jr_coco = synthetic_regressors(art)
        is_val = split != "train"
        data = generate_sequences(
            art, jr_coco, jr_h36m, num_videos=num_videos,
            frames_per_video=frames_per_video,
            seed=seed + (0 if split == "train" else 60))
        if not is_val:
            apply_reprojection_gate(data)
        return cls(data=data, name="MPII3D", is_val=is_val,
                   joint_regressor_smpl=art.J_regressor,
                   joint_regressor_h36m=jr_h36m,
                   joint_regressor_coco=jr_coco, **kw)

    @classmethod
    def from_packed(cls, path, split: str = "train", **kw) -> "MPII3D":
        """Load a packed npz produced by ``tools/convert_mpii3d.py``."""
        from pmce_tpu.data.packed import load_packed

        data, aux = load_packed(path)
        is_val = split != "train"
        if not is_val:
            apply_reprojection_gate(data)
        return cls(data=data, name="MPII3D", is_val=is_val,
                   joint_regressor_smpl=aux.get("jr_smpl"),
                   joint_regressor_h36m=aux.get("jr_h36m"),
                   joint_regressor_coco=aux.get("jr_coco"), **kw)
