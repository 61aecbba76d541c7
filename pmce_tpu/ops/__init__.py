"""Geometry, camera, alignment and metric ops (pure JAX, statically shaped)."""

from pmce_tpu.ops import geometry, coords, procrustes, metrics  # noqa: F401
