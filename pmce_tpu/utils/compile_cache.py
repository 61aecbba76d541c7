"""Persistent XLA compilation cache setup.

Remote TPU compiles of the larger graphs (ResNet-50 forward ≈ 100 s, PMCE
init ≈ 60 s) dominate cold-start latency; caching compiled executables on
disk makes every process after the first start in seconds. Call
``enable()`` before the first jit in every CLI / bench entry point.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "PMCE_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
