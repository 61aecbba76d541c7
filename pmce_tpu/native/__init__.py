"""Native (C++) runtime components, built on demand and loaded via ctypes.

The reference's native surface lived entirely in external dependencies
(OSMesa rendering, SORT tracking CUDA detector, SURVEY.md §2.6); here the
equivalents are first-party C++ compiled once per machine with g++ -O3 into
a cached shared library. Pure-numpy fallbacks exist for every entry point
(used if no compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_THIS_DIR, "_build")
_SOURCES = ("rasterizer.cc", "tracker.cc")
_LIB_NAME = "libpmce_native.so"

_lib = None
_load_attempted = False


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    out = os.path.join(_BUILD_DIR, _LIB_NAME)
    srcs = [os.path.join(_THIS_DIR, s) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.isfile(out) and os.path.getmtime(out) > newest_src:
        return out
    # Compile to a per-process temp name and atomically rename: two
    # processes building concurrently (parallel pytest, demo + train)
    # must never CDLL a half-written library. Surface g++'s stderr on
    # failure — CalledProcessError's message omits captured output.
    tmp = f"{out}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", tmp, *srcs]
    try:
        proc = subprocess.run(cmd, capture_output=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"g++ failed ({proc.returncode}): "
                f"{proc.stderr.decode(errors='replace')[-2000:]}")
        os.replace(tmp, out)
    finally:
        if os.path.isfile(tmp):
            os.remove(tmp)
    return out


def load() -> ctypes.CDLL | None:
    """Build (if needed) and load the native library; None on failure."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    try:
        path = _build()
        lib = ctypes.CDLL(path)

        lib.rasterize_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.rasterize_mesh.restype = None

        lib.iou_assign.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.iou_assign.restype = ctypes.c_int32
        _lib = lib
    except (OSError, subprocess.CalledProcessError) as e:  # pragma: no cover
        import warnings

        warnings.warn(f"native build failed ({e}); using numpy fallbacks")
        _lib = None
    return _lib
