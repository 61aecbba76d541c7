"""Flax model zoo: pose lifter, co-evolution decoder, composed PMCE."""

from pmce_tpu.models.pose_lifter import PoseLifter  # noqa: F401
from pmce_tpu.models.coevo import CoevoBlock, CoevolutionDecoder  # noqa: F401
from pmce_tpu.models.pmce import PMCE, create_pmce  # noqa: F401
