"""Native (C++) host kernels, built on demand with the system toolchain
and loaded through ctypes. The TPU compute path is XLA/Pallas; this layer
covers the sequential pointer-chasing *setup* algorithms (ILU(0)
factorization, PMIS coarsening) that the reference writes in Rust. Every
entry point has a pure-Python fallback, so the package works without a
compiler.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "kernels.cpp")


def _build_dir() -> str:
    d = os.environ.get(
        "MATHAUDIO_NATIVE_CACHE", os.path.expanduser("~/.cache/mathaudio_native")
    )
    os.makedirs(d, exist_ok=True)
    return d


def load_native() -> Optional[ctypes.CDLL]:
    """Compile (once, cached by source hash) and load the native library.
    Returns None when no toolchain is available."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        src = _source_path()
        with open(src, "rb") as fh:
            tag = hashlib.sha256(fh.read()).hexdigest()[:16]
        so = os.path.join(_build_dir(), f"libmathaudio_{tag}.so")
        if not os.path.exists(so):
            cmd = [
                os.environ.get("CXX", "g++"),
                "-O3", "-march=native", "-shared", "-fPIC",
                src, "-o", so,
            ]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.ilu0_factor_complex.restype = ctypes.c_int
        lib.ilu0_factor_complex.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.pmis_coarsen.restype = None
        lib.pmis_coarsen.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.greedy_coloring.restype = None
        lib.greedy_coloring.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        _LIB = lib
    except Exception as e:  # no compiler / sandbox: fall back to Python
        print(f"mathaudio_tpu.native: falling back to Python ({e})", file=sys.stderr)
        _LIB = None
    return _LIB


def ilu0_factor_inplace(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray) -> bool:
    """Native ILU(0) on complex128 CSR data (in place). Returns True when
    the native path ran, False when the caller should use the fallback."""
    lib = load_native()
    if lib is None:
        return False
    indptr64 = np.ascontiguousarray(indptr, np.int64)
    indices32 = np.ascontiguousarray(indices, np.int32)
    assert data.dtype == np.complex128 and data.flags.c_contiguous
    rc = lib.ilu0_factor_complex(
        indptr64.ctypes.data, indices32.ctypes.data, data.ctypes.data,
        len(indptr64) - 1,
    )
    return rc == 0


def pmis_coarsen(indptr: np.ndarray, indices: np.ndarray, weights: np.ndarray):
    """Native PMIS; returns bool is_coarse or None for fallback."""
    lib = load_native()
    if lib is None:
        return None
    n = len(indptr) - 1
    indptr64 = np.ascontiguousarray(indptr, np.int64)
    indices32 = np.ascontiguousarray(indices, np.int32)
    w = np.ascontiguousarray(weights, np.float64)
    state = np.zeros(n, np.int8)
    lib.pmis_coarsen(
        indptr64.ctypes.data, indices32.ctypes.data, w.ctypes.data,
        state.ctypes.data, n,
    )
    return state == 1


def greedy_coloring(indptr: np.ndarray, indices: np.ndarray):
    """Native greedy graph coloring; returns int32 colors or None for
    the Python fallback."""
    lib = load_native()
    if lib is None:
        return None
    n = len(indptr) - 1
    indptr64 = np.ascontiguousarray(indptr, np.int64)
    indices32 = np.ascontiguousarray(indices, np.int32)
    colors = np.zeros(n, np.int32)
    lib.greedy_coloring(
        indptr64.ctypes.data, indices32.ctypes.data, colors.ctypes.data, n
    )
    return colors
