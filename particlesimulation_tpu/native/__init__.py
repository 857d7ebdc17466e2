"""ctypes loader/builder for the native runtime pieces.

Builds ``libpsim_init.so`` on first use (g++ -O2, matching the reference
Makefile's optimization level — reference serial/Makefile:1-10) and exposes
typed wrappers. Falls back to the NumPy implementations in :mod:`..rng` if no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "initgen.cpp")
_BUILD_DIR = os.path.join(_HERE, "build")
_SO = os.path.join(_BUILD_DIR, "libpsim_init.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> str | None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    # Per-pid temp name: concurrent processes may race to build; each
    # compiles privately and the atomic rename makes last-writer-wins safe.
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    os.replace(tmp, _SO)
    return _SO


def get_lib():
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.psim_uniform_stream.argtypes = [ctypes.c_int32, ctypes.c_longlong, dp]
        lib.psim_uniform_stream.restype = None
        lib.psim_draw_stream.argtypes = [ctypes.c_int32, ctypes.c_longlong, dp]
        lib.psim_draw_stream.restype = None
        lib.psim_init_particles.argtypes = [
            ctypes.c_int32, ctypes.c_double, ctypes.c_long, ctypes.c_longlong,
            dp, dp, dp, dp, dp,
        ]
        lib.psim_init_particles.restype = None
        _lib = lib
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def uniform_stream(seed: int, n: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.float64)
    lib.psim_uniform_stream(seed, n, _ptr(out))
    return out


def draw_stream(seed: int, n: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.float64)
    lib.psim_draw_stream(seed, n, _ptr(out))
    return out


def init_particles(seed: int, side: float, ncside: int, n: int):
    """Native initial conditions; returns (x, y, vx, vy, m) f64 or None."""
    lib = get_lib()
    if lib is None:
        return None
    arrs = [np.empty(n, dtype=np.float64) for _ in range(5)]
    lib.psim_init_particles(seed, float(side), ncside, n, *map(_ptr, arrs))
    return tuple(arrs)
