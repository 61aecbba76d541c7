"""Persistent XLA compilation cache setup.

Remote TPU compiles of the larger graphs (ResNet-50 forward ≈ 100 s, PMCE
init ≈ 60 s) dominate cold-start latency; caching compiled executables on
disk makes every process after the first start in seconds. Call
``enable()`` before the first jit in every CLI / bench entry point.

The cache directory is keyed by backend + a CPU-feature fingerprint:
XLA's CPU AOT loader warns that loading an executable compiled on a host
with different CPU features "could lead to execution errors such as
SIGILL", and the cpu backend's virtual-mesh artifacts must never be
reloaded on a machine with a different ISA (the round-2 MULTICHIP log was
full of exactly those cpu_aot_loader machine-feature mismatches).
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_tag() -> str:
    """``<backend>-<cpu-feature-hash>`` for the current process.

    The backend is read from config/env without initializing jax (enable()
    must run before the first jit, so triggering backend discovery here
    would defeat the point on tunneled-TPU hosts).
    """
    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 exposes "flags", arm64 "Features".
                if line.startswith(("flags", "Features")):
                    flags = line.split(":", 1)[1].strip()
                    break
    except OSError:
        flags = ""
    digest = hashlib.sha256(
        f"{platform.machine()}|{flags}".encode()).hexdigest()[:12]

    backend = os.environ.get("JAX_PLATFORMS", "")
    try:
        import jax

        backend = getattr(jax.config, "jax_platforms", None) or backend
    except Exception:  # pragma: no cover - jax import is load-bearing
        pass
    backend = (backend or "auto").split(",")[0] or "auto"
    return f"{backend}-{digest}"


def enable(cache_dir: str | None = None) -> None:
    import jax

    tag = machine_tag()
    if tag.startswith("cpu-"):
        # No persistent cache on the cpu backend: XLA's CPU AOT loader
        # compares its own compile-time pseudo-features (+prefer-no-scatter
        # /+prefer-no-gather) against host CPUID, so EVERY reload — even
        # same-machine, same-process — spews "could lead to SIGILL"
        # errors. The cpu backend here only runs virtual-mesh dryruns,
        # where a clean log outweighs compile reuse.
        return
    base = cache_dir or os.environ.get(
        "PMCE_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
    )
    keyed = os.path.join(base, tag)
    os.makedirs(keyed, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", keyed)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
