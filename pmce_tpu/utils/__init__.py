"""Utilities: mesh IO, metric logging, profiling."""

from pmce_tpu.utils.obj_io import save_obj  # noqa: F401
from pmce_tpu.utils.logging import MetricLogger  # noqa: F401
from pmce_tpu.utils.profiler import StepTimer, trace  # noqa: F401
