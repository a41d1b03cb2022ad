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
_GENLIB: Optional[ctypes.CDLL] = None
_GENTRIED = False


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
        _set_flip_sig(lib)
        _LIB = lib
        return _LIB


def _set_flip_sig(lib):
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
    lib.flip_solve_component_v2.restype = ctypes.c_double
    lib.flip_solve_component_v2.argtypes = \
        lib.flip_solve_component.argtypes[:-1] + \
        [ctypes.POINTER(ctypes.c_uint8)]  # out_vec, no 64-var limit


def load_genread() -> Optional[ctypes.CDLL]:
    """The .gen fast-parser library (genread.cc), building on first use;
    None when no toolchain is available (callers fall back to the pure
    Python reader)."""
    global _GENLIB, _GENTRIED
    with _LOCK:
        if _GENTRIED:
            return _GENLIB
        _GENTRIED = True
        src = os.path.join(_HERE, "genread.cc")
        out = os.path.join(_HERE, "_genread.so")
        if (not os.path.exists(out) or
                os.path.getmtime(out) < os.path.getmtime(src)):
            if not _build(src, out):
                return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            return None
        lib.gen_load.restype = ctypes.c_void_p
        lib.gen_load.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p, ctypes.c_int,
        ]
        lib.gen_names_len.restype = ctypes.c_int64
        lib.gen_names_len.argtypes = [ctypes.c_void_p]
        lib.gen_names.restype = None
        lib.gen_names.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.gen_copy.restype = None
        lib.gen_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
        lib.gen_free.restype = None
        lib.gen_free.argtypes = [ctypes.c_void_p]
        _GENLIB = lib
        return _GENLIB


def parse_gen_native(path: str, m: int, genotype_error: float):
    """(names, md [n,m,2] int32, ms [n,m,2] f64, rc [n,m] bool) via the
    native parser, or None if unavailable.  Raises ValueError with the
    parser's message on malformed input."""
    import numpy as np
    lib = load_genread()
    if lib is None:
        return None
    n = ctypes.c_int64(0)
    err = ctypes.create_string_buffer(512)
    h = lib.gen_load(path.encode(), m, genotype_error,
                     ctypes.byref(n), err, len(err))
    if not h:
        msg = err.value.decode(errors="replace")
        raise ValueError(msg or f"failed to parse {path}")
    try:
        nl = lib.gen_names_len(h)
        nbuf = ctypes.create_string_buffer(int(nl) + 1)
        lib.gen_names(h, nbuf)
        names = nbuf.raw[:nl].decode().split("\n") if nl else []
        nv = int(n.value)
        md = np.empty((nv, m, 2), dtype=np.int32)
        ms = np.empty((nv, m, 2), dtype=np.float64)
        rc = np.empty((nv, m), dtype=np.uint8)
        lib.gen_copy(h, md.ctypes.data_as(ctypes.c_void_p),
                     ms.ctypes.data_as(ctypes.c_void_p),
                     rc.ctypes.data_as(ctypes.c_void_p))
    finally:
        lib.gen_free(h)
    return names, md, ms, rc.astype(bool)
