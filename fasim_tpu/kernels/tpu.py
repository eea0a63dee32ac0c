"""Pallas TPU kernel for the hot Smith-Waterman passes.

One kernel serves both engines (SURVEY.md §2.a): it computes exact int32
per-column maxima of the affine-gap SW matrix for a batch of T transformed
references against one query, gridded over segments.  The threshold pass
(stats.h calc_score_once) is the column-max maximum; the scan pass
(sswNew.cpp sw_sse2_byte_once) is the column-max vector with the
byte-saturation break applied as a post-op.

Design notes (TPU-first, not a translation of the SSE2 kernels):

  * Layout: H/E state is (T, Mp) — transforms on sublanes, query on lanes.
    Each step advances every transform's DP by one reference column; all
    work is VPU elementwise plus one tiny MXU matmul for the profile
    gather (one-hot(code) @ matq).
  * Reference columns stream through the pallas grid in 128-lane chunks
    (grid = (S, N/128)); the DP state lives in VMEM scratch across grid
    steps.  Within a chunk the current column is always lane 0 of a
    roll-carried register, and column maxima are rolled into an output
    register — no dynamic lane indexing anywhere (Mosaic requires
    128-aligned lane slices).
  * The vertical-gap F is resolved with a log-depth prefix max over
    (tmp + i*ge) — exact, data-independent, no lazy-F loop.  For the scan
    pass the prefix window is 64 lanes: every cell at or before the
    byte-break column is <= 255 (the break fires at the first column max
    >= 251, and a column max can grow at most +match per column), so an
    F contribution can beat tmp >= 0 only within (255-16)/4 < 60
    positions; post-break columns are masked to zero on host anyway.
  * Striped-pad parity: the reference byte kernel pads the query to
    ceil(M/16)*16 phantom positions with zero profile whose cells feed the
    recorded column maxima; we allocate exactly those phantom rows and mask
    the column-max reduction at Mp16, so extra lane-alignment padding
    (to a multiple of 128) cannot leak in.  Influence flows only upward in
    query index, so alignment pads never perturb real cells.
  * The byte-break rule (stop before recording the first column whose max
    reaches 251, sswNew.cpp:384-386) is applied after the fact: the break
    column is the first with colmax >= 251 — before it the two runs agree,
    from it the reference records zeros.  No data-dependent control flow
    on device.
  * Ragged segments: reference columns are padded (to a multiple of 128)
    with an out-of-alphabet code whose one-hot row is all-zero => profile
    0; score-0 columns can only carry existing maxima diagonally, never
    raise them, and the padded tail of colmax is sliced off on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BYTE_SAT, GAP_EXTEND, GAP_OPEN
from ..rules import SSW_ENC, SSW_MAT, THRESH_ENC, THRESH_MAT

_NEG = -(2 ** 30)
_CHUNK = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _colmax_kernel(codes_ref, matq_ref, out_ref, h_ref, e_ref, *,
                   n_codes: int, m16: int, fwin: int):
    """One grid step: colmax for T transforms over one 128-column chunk."""
    T = codes_ref.shape[1]
    Mp = h_ref.shape[1]
    go = jnp.int32(GAP_OPEN)
    ge = jnp.int32(GAP_EXTEND)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        e_ref[:] = jnp.zeros_like(e_ref)

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    fbias = idx * ge
    foff = go + (idx - 1) * ge
    real_row = idx < m16  # phantom rows < m16 count; alignment pads don't
    cls = jax.lax.broadcasted_iota(jnp.int32, (T, n_codes), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, _CHUNK), 1)

    def shift1(x, fill):
        r = pltpu.roll(x, shift=1, axis=1)
        return jnp.where(idx >= 1, r, fill)

    def prefix_max(x):
        k = 1
        while k < min(fwin, Mp):
            r = pltpu.roll(x, shift=k, axis=1)
            x = jnp.maximum(x, jnp.where(idx >= k, r, 0))
            k *= 2
        return x

    def col(_, carry):
        chunk, cmacc = carry
        code = chunk[:, 0:1]  # (T, 1) — current column's codes
        onehot = (code == cls).astype(jnp.float32)
        s_col = jnp.dot(onehot, matq_ref[:],
                        preferred_element_type=jnp.float32).astype(jnp.int32)
        hp = h_ref[:]
        ep = e_ref[:]
        ev = jnp.maximum(ep - ge, hp - go)
        diag = shift1(hp, 0)
        tmp = jnp.maximum(jnp.maximum(diag + s_col, ev), 0)
        run = prefix_max(tmp + fbias)
        fv = shift1(run, _NEG) - foff
        hn = jnp.maximum(tmp, fv)
        h_ref[:] = hn
        e_ref[:] = ev
        cm = jnp.max(jnp.where(real_row, hn, 0), axis=1, keepdims=True)
        cmacc = jnp.where(lane == _CHUNK - 1, cm,
                          pltpu.roll(cmacc, shift=_CHUNK - 1, axis=1))
        chunk = pltpu.roll(chunk, shift=_CHUNK - 1, axis=1)
        return chunk, cmacc

    chunk0 = codes_ref[0]
    cmacc0 = jnp.zeros((T, _CHUNK), jnp.int32)
    _, cmacc = jax.lax.fori_loop(0, _CHUNK, col, (chunk0, cmacc0),
                                 unroll=False)
    out_ref[0] = cmacc


@functools.partial(jax.jit,
                   static_argnames=("m16", "n_codes", "fwin", "interpret"))
def _colmax_call(codes, matq, *, m16: int, n_codes: int, fwin: int,
                 interpret: bool = False):
    """codes: int32[S, T, Np]; matq: f32[n_codes, Mp].  -> int32[S, T, Np]."""
    S, T, Np = codes.shape
    Mp = matq.shape[1]
    kernel = functools.partial(_colmax_kernel, n_codes=n_codes, m16=m16,
                               fwin=fwin)
    return pl.pallas_call(
        kernel,
        grid=(S, Np // _CHUNK),
        in_specs=[
            pl.BlockSpec((1, T, _CHUNK), lambda s, c: (s, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_codes, Mp), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, _CHUNK), lambda s, c: (s, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, T, Np), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((T, Mp), jnp.int32),
            pltpu.VMEM((T, Mp), jnp.int32),
        ],
        interpret=interpret,
    )(codes, matq)


class TpuScanEngine:
    """Engine with the numpy_engine contract plus a batched-segments API.

    Per query it caches the two encoded profiles; per segment batch it
    launches one kernel per engine (threshold / scan alphabets differ and
    must not be unified, SURVEY.md §3.3).
    """

    def __init__(self, rna: np.ndarray, interpret: bool = False):
        self.interpret = interpret
        m = len(rna)
        self.m16 = _round_up(m, 16)
        mp = _round_up(self.m16, 128)
        self.mp = mp

        def make_matq(enc, mat):
            q = enc[rna]
            mq = np.zeros((mat.shape[1], mp), np.float32)
            mq[:, :m] = mat[q].T  # query profile; phantom/pad rows 0
            return jnp.asarray(mq)

        self.matq_ssw = make_matq(SSW_ENC, SSW_MAT)
        self.matq_thresh = make_matq(THRESH_ENC, THRESH_MAT)

    def colmax_batch(self, codes: np.ndarray, which: str) -> np.ndarray:
        """codes int[S, T, N] (pad = n_codes) -> colmax int32[S, T, N]."""
        matq = self.matq_ssw if which == "ssw" else self.matq_thresh
        n_codes = matq.shape[0]
        S, T, N = codes.shape
        Np = _round_up(N, _CHUNK)
        if Np != N:
            padded = np.full((S, T, Np), n_codes, codes.dtype)
            padded[:, :, :N] = codes
            codes = padded
        # scan pass: F-window 64 is exact through the byte-break column
        # (module docstring); threshold pass needs the full prefix.
        fwin = 64 if which == "ssw" else 1 << 30
        out = _colmax_call(jnp.asarray(codes, jnp.int32), matq,
                           m16=self.m16, n_codes=n_codes, fwin=fwin,
                           interpret=self.interpret)
        return np.asarray(jax.device_get(out))[:, :, :N]

    def __call__(self, rna: np.ndarray, seq2_list: list[np.ndarray]
                 ) -> tuple[np.ndarray, np.ndarray]:
        """numpy_engine-compatible single-segment entry."""
        seq2 = np.stack(seq2_list)
        thresh_codes = THRESH_ENC[seq2].astype(np.int32)[None]
        ssw_codes = SSW_ENC[seq2].astype(np.int32)[None]
        thresh_cm = self.colmax_batch(thresh_codes, "thresh")[0]
        scan_cm = self.colmax_batch(ssw_codes, "ssw")[0]
        thresh = thresh_cm.max(axis=1).astype(np.int32)
        return thresh, apply_byte_break(scan_cm)


def apply_byte_break(colmax: np.ndarray) -> np.ndarray:
    """Post-op equivalent of the byte kernel's break-at-saturation
    (sswNew.cpp:384-386): zero the first column whose max reaches 251 and
    everything after it.  Works on [..., N]."""
    sat = colmax >= BYTE_SAT
    # first saturated column per row (N if none)
    first = np.where(sat.any(axis=-1), sat.argmax(axis=-1), colmax.shape[-1])
    pos = np.arange(colmax.shape[-1])
    return np.where(pos < first[..., None], colmax, 0).astype(np.int32)
