"""Native (C++) host-side components.

The reference's runtime is a single C++ program; the pieces of *our*
runtime that are genuinely host-bound combinatorics — not XLA tensor work
— get native implementations here, compiled on demand with the system
toolchain and bound via ctypes (no pybind11 dependency).

Currently: ``flipsolve`` — the per-component search core of the
phase-flip optimiser (the in-process replacement for the reference's
toulbar2 subprocess, cnF2freq.cpp:6074-6098).

Build artifacts are cached next to the sources keyed by source mtime; a
missing/failed toolchain degrades gracefully to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    try:
        r = subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", src, "-o", out],
            capture_output=True, timeout=120)
        if r.returncode != 0:
            # retry without -march=native (portability)
            r = subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 src, "-o", out],
                capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def load_flipsolve() -> Optional[ctypes.CDLL]:
    """The flip-solver library, building it on first use; None when no
    toolchain is available (callers fall back to Python)."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_HERE, "flipsolve.cc")
        out = os.path.join(_HERE, "_flipsolve.so")
        if (not os.path.exists(out) or
                os.path.getmtime(out) < os.path.getmtime(src)):
            ok = _build(src, out)
            if not ok:
                return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            return None
        lib.flip_solve_component.restype = ctypes.c_double
        lib.flip_solve_component.argtypes = [
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),   # fam_nv
            ctypes.POINTER(ctypes.c_int32),   # vpos
            ctypes.POINTER(ctypes.c_int64),   # s_off
            ctypes.POINTER(ctypes.c_double),  # scores
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        _LIB = lib
        return _LIB
