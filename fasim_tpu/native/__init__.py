"""ctypes loader for the native ordering runtime (built on demand)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_lt_sort.so")
_SRC = os.path.join(_DIR, "lt_sort.cpp")

_lib = None


def _load():
    global _lib
    if _lib is None:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", _SRC, "-o", _SO],
                check=True, capture_output=True)
        _lib = ctypes.CDLL(_SO)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        _lib.lt_fastsim_dedup.restype = ctypes.c_int32
        _lib.lt_fastsim_dedup.argtypes = [i32p, i32p, i32p, i32p, f32p,
                                          ctypes.c_int32, i32p]
        _lib.lt_sort_by_motif.restype = None
        _lib.lt_sort_by_motif.argtypes = [i32p, ctypes.c_int32, i32p]
    return _lib


def fastsim_dedup(stari, endi, starj, endj, score) -> np.ndarray:
    """Surviving original indices, in final order, of the fastSIM dedup
    chain (fastsim.h:273-283) with libstdc++-identical tie-breaking."""
    lib = _load()
    n = len(stari)
    out = np.empty(max(n, 1), dtype=np.int32)
    m = lib.lt_fastsim_dedup(
        np.ascontiguousarray(stari, np.int32),
        np.ascontiguousarray(endi, np.int32),
        np.ascontiguousarray(starj, np.int32),
        np.ascontiguousarray(endj, np.int32),
        np.ascontiguousarray(score, np.float32), n, out)
    return out[:m].copy()


def sort_by_motif(motif) -> np.ndarray:
    """Permutation applied by printResult's std::sort-by-class
    (Fasim-LongTarget.cpp:813) with libstdc++-identical tie-breaking."""
    lib = _load()
    n = len(motif)
    out = np.empty(max(n, 1), dtype=np.int32)
    lib.lt_sort_by_motif(np.ascontiguousarray(motif, np.int32), n, out)
    return out[:n].copy()
