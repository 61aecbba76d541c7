"""SMPL body model: artifacts, batched LBS forward, coarsening, kernels."""

from pmce_tpu.smpl.artifacts import (  # noqa: F401
    SMPLArtifacts,
    kintree_levels,
    load_or_synthetic,
    synthetic_artifacts,
)
from pmce_tpu.smpl.layer import (  # noqa: F401
    SMPLModel,
    regress_joints,
    smpl_forward,
)
from pmce_tpu.smpl import mesh  # noqa: F401
