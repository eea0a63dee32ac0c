"""ctypes loaders for the native runtime (built on demand)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_lt_sort.so")
_SRC = os.path.join(_DIR, "lt_sort.cpp")
_SIM_SO = os.path.join(_DIR, "_sim_exact.so")
_SIM_SRC = os.path.join(_DIR, "sim_exact.cpp")
_SSW_SO = os.path.join(_DIR, "_ssw_align.so")
_SSW_SRC = os.path.join(_DIR, "ssw_align.cpp")

_lib = None
_sim_lib = None
_ssw_lib = None


def _build(src: str, so: str) -> None:
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(["g++", "-O2", "-fPIC", "-shared", src, "-o", so],
                       check=True, capture_output=True)


def _load():
    global _lib
    if _lib is None:
        _build(_SRC, _SO)
        _lib = ctypes.CDLL(_SO)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        _lib.lt_fastsim_dedup.restype = ctypes.c_int32
        _lib.lt_fastsim_dedup.argtypes = [i32p, i32p, i32p, i32p, f32p,
                                          ctypes.c_int32, i32p]
        _lib.lt_sort_by_motif.restype = None
        _lib.lt_sort_by_motif.argtypes = [i32p, ctypes.c_int32, i32p]
    return _lib


def _load_sim():
    global _sim_lib
    if _sim_lib is None:
        _build(_SIM_SRC, _SIM_SO)
        _sim_lib = ctypes.CDLL(_SIM_SO)
        c = ctypes
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        _sim_lib.lt_sim_scan.restype = c.c_long
        _sim_lib.lt_sim_scan.argtypes = [
            c.c_char_p, c.c_long, c.c_char_p, c.c_long, c.c_char_p,
            c.c_long, c.c_long, c.c_long, c.c_long, c.c_long, c.c_long,
            c.c_long, c.c_long, c.c_long, i32p, f32p, i64p, c.c_char_p,
            c.c_long]
    return _sim_lib


def _load_ssw():
    global _ssw_lib
    if _ssw_lib is None:
        _build(_SSW_SRC, _SSW_SO)
        _ssw_lib = ctypes.CDLL(_SSW_SO)
        c = ctypes
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        _ssw_lib.lt_ssw_align.restype = c.c_long
        _ssw_lib.lt_ssw_align.argtypes = [
            i32p, c.c_long, i32p, c.c_long, i32p, c.c_long, c.c_long,
            c.c_long, i32p, i32p, c.c_char_p, c.c_long]
    return _ssw_lib


def ssw_align(query_idx: np.ndarray, ref_idx: np.ndarray, mat: np.ndarray,
              go: int, ge: int):
    """Exact ssw_align emulation (sswNew.cpp:1446-1547).  Returns
    (sw_score, ref_begin, ref_end, query_begin, query_end, cigar) where
    cigar is a list of (length, op) tuples; sw_score 0 means no/failed
    alignment (caller discards)."""
    lib = _load_ssw()
    cap = len(query_idx) + len(ref_idx) + 8
    meta = np.empty(5, np.int32)
    cig_len = np.empty(cap, np.int32)
    cig_op = ctypes.create_string_buffer(cap)
    n = lib.lt_ssw_align(
        np.ascontiguousarray(query_idx, np.int32), len(query_idx),
        np.ascontiguousarray(ref_idx, np.int32), len(ref_idx),
        np.ascontiguousarray(mat, np.int32), mat.shape[1], go, ge,
        meta, cig_len, cig_op, cap)
    if n < 0:
        raise RuntimeError("ssw_align cigar buffer overflow")
    if meta[0] == 0:
        return 0, -1, -1, -1, -1, []
    ops = cig_op.raw[:n].decode()
    return (int(meta[0]), int(meta[1]), int(meta[2]), int(meta[3]),
            int(meta[4]), [(int(cig_len[k]), ops[k]) for k in range(n)])


def sim_scan(rna: bytes, dna_t: bytes, src: bytes, dna_start_pos: int,
             min_score: int, strand: int, para: int, nt_min: int,
             nt_max: int, penalty_t: int, penalty_c: int) -> list[tuple]:
    """Exact SIM engine (sim.h:410-1143) on one (query, transformed,
    source) triple.  Returns tuples (stari, endi, starj, endj, nt, score,
    identity, tri_score, stri_align, strj_align)."""
    lib = _load_sim()
    cap = 64
    strbuf_cap = 1 << 22
    ints = np.empty(cap * 5, np.int32)
    floats = np.empty(cap * 3, np.float32)
    stroffs = np.empty(cap * 4, np.int64)
    strbuf = ctypes.create_string_buffer(strbuf_cap)
    n = lib.lt_sim_scan(rna, len(rna), dna_t, len(dna_t), src,
                        dna_start_pos, min_score, strand, para, nt_min,
                        nt_max, penalty_t, penalty_c, cap, ints, floats,
                        stroffs, strbuf, strbuf_cap)
    if n < 0:
        raise RuntimeError("sim_scan output buffer overflow")
    out = []
    raw = strbuf.raw
    for k in range(n):
        io, il, jo, jl = stroffs[4 * k: 4 * k + 4]
        out.append((int(ints[5 * k]), int(ints[5 * k + 1]),
                    int(ints[5 * k + 2]), int(ints[5 * k + 3]),
                    int(ints[5 * k + 4]), floats[3 * k],
                    floats[3 * k + 1], floats[3 * k + 2],
                    raw[io:io + il].decode(), raw[jo:jo + jl].decode()))
    return out


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
