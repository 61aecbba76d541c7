"""Test harness configuration.

Forces JAX onto CPU with 8 virtual devices BEFORE jax initializes, so the
multi-chip sharding paths are exercised without TPU hardware (the TPU-native
substitute for multi-node tests; see SURVEY.md §4).
"""

import os

# Force-override: the session environment pins JAX_PLATFORMS to the TPU
# backend; tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: trainer-step compiles dominate test wall
# time on CPU; cache them across runs. The directory is keyed by the same
# backend+CPU-feature tag as the production cache (utils/compile_cache):
# round 3 shipped an unkeyed tests/.jax_cache, and full-suite runs on a
# different host loaded 136 entries compiled with AMX/AVX10 features this
# machine lacked, spewing cpu_aot_loader machine-feature/SIGILL errors.
from pmce_tpu.utils.compile_cache import machine_tag  # noqa: E402

_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache",
                          machine_tag())
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def smpl_artifacts():
    from pmce_tpu.smpl.artifacts import synthetic_artifacts

    # Smaller vertex count keeps CPU tests fast; shapes stay consistent.
    return synthetic_artifacts(seed=0, num_verts=600, num_faces=1200)


@pytest.fixture(scope="session")
def smpl_model(smpl_artifacts):
    from pmce_tpu.smpl.layer import SMPLModel

    return SMPLModel.from_artifacts(smpl_artifacts)
