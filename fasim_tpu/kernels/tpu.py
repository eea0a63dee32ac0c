"""Pallas TPU kernel for the hot Smith-Waterman passes.

One kernel serves both engines (SURVEY.md §2.a): exact int32 per-column
maxima of the affine-gap SW matrix.  The scan pass (sswNew.cpp
sw_sse2_byte_once) consumes the column maxima directly (byte-saturation
break applied as a host post-op); the threshold pass (stats.h
calc_score_once) reduces them to a global max on host.

Design notes (TPU-first, not a translation of the SSE2 kernels):

  * Layout: H/E state is (T, Mp) — (segment, transform) pairs on sublanes,
    query on lanes.  Segments are *packed* into the sublane axis together
    with the 48 rule transforms (each sublane row is an independent DP),
    so one kernel instance advances hundreds of alignments per column and
    every VPU op is amortized over a large register set.
  * Reference columns stream through the pallas grid in 128-lane chunks
    (grid = (S, N/128)); the DP state lives in VMEM scratch across grid
    steps.  Within a chunk the current column is always lane 0 of a
    roll-carried register — no dynamic lane indexing anywhere (Mosaic
    requires 128-aligned lane slices).
  * The substitution score is computed arithmetically from the reference
    codes and precomputed query-property rows (compare/select ops), not
    via a profile-matrix matmul: both score matrices are "match/mismatch
    + special rows" shaped, so 4-7 VPU ops beat an MXU gather serialized
    into the recurrence.
  * The vertical-gap F is resolved with a log-depth prefix max over
    (tmp + i*ge).  A 64-lane window is exact whenever every live cell is
    < 251: an F contribution can beat tmp >= 0 only within
    (250-16)/4 < 59 positions of its source.  For the scan pass this
    holds through the byte-break column (cells there are <= 255 and the
    window covers 63), matching the reference byte kernel's recorded
    columns.  For the threshold pass the host re-runs pairs whose
    windowed max reaches 251 with a full-length prefix — the exact
    analogue of the reference's byte -> word escalation
    (stats.h:948-951): windowed == exact until the first >=251 cell, so
    "windowed max < 251" proves exactness.
  * Striped-pad parity: the reference byte kernel pads the query to
    ceil(M/16)*16 phantom positions with zero profile whose cells feed
    the recorded column maxima; phantom lanes score 0 and the column-max
    reduction is masked at m16, so lane-alignment padding (to a multiple
    of 128) cannot leak in.  Influence flows only upward in query index,
    so alignment pads never perturb real cells.
  * Ragged segments: reference columns are right-padded (to a multiple of
    128) with an out-of-alphabet code that scores like a mismatch; local
    maxima are non-increasing under all-mismatch columns and the padded
    tail is sliced off on host, so padding cannot change any reported
    value.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BYTE_SAT, GAP_EXTEND, GAP_OPEN
from ..rules import SSW_ENC, THRESH_ENC

_NEG = -(2 ** 30)
_CHUNK = 128
_FULL_WIN = 1 << 30

# Bytes for which the threshold and scan engines provably agree, making
# the fused single-pass threshold valid.  All 48 rule codes substitute
# uppercase A/T/G/C into {A,T,G,C} (rules.h:6-53 — no rule maps a real
# base to N), so for such segments every (query char, transformed char)
# score is identical in the two matrices (match 5 / mismatch -4), the two
# DPs are the same DP, and the threshold pass can be read off the scan
# pass's int32 column maxima ("fused" mode) instead of running a second
# full pass.  Any other segment byte disables fusion for the batch:
# lowercase/unknown bytes become 'N' under transferString (rules.h:
# 308-311) and N scores -4 (scan) vs -1 (threshold); the batch pad byte 0
# also becomes 'N' but pads provably never raise a maximum in either
# engine, so it is allowed.  On the *query* side no rule LUT applies —
# both encoders map lowercase like uppercase — so acgt is pure there,
# while U (U~T in the threshold engine vs U~A in SSW) and N are not
# (SURVEY.md "Threshold/scan engine mismatch").
_PURE = np.zeros(256, np.bool_)  # query bytes
for _b in b"ACGTacgt":
    _PURE[_b] = True
_PURE_OR_PAD = np.zeros(256, np.bool_)  # segment bytes
for _b in b"ACGT":
    _PURE_OR_PAD[_b] = True
_PURE_OR_PAD[0] = True  # batch pad byte

# number of (segment x transform) DP rows packed into the sublane axis of
# one kernel instance; 384 rows x ~3k lanes of int32 state fits VMEM with
# room for the streamed code chunks
PACK_ROWS = 384

# widest window lane class: cutlength <= (250+24)/1.4+1 = 196 < 256
_WWIN = 256


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _score_col(code, qprops_ref, engine: str):
    """Substitution-score column (T, Mp) for the current ref codes (T, 1).

    qprops rows (int32, precomputed per query):
      0: query code per lane (-1 beyond the real query)
      1: ssw: (q < 4) & valid;  thresh: (q in {T,U}) & valid
      2: thresh: (q == N) & valid
      3: valid (lane < m)
    """
    q = qprops_ref[0:1, :]
    maska = qprops_ref[1:2, :] != 0
    valid = qprops_ref[3:4, :] != 0
    eq = code == q
    five = jnp.int32(5)
    neg4 = jnp.int32(-4)
    if engine == "ssw":
        s = jnp.where(eq & maska, five, neg4)
    else:
        rtu = (code == 3) | (code == 4)
        rn = code == 5
        qn = qprops_ref[2:3, :] != 0
        eq2 = eq | (maska & rtu)
        s = jnp.where(qn | rn, jnp.int32(-1),
                      jnp.where(eq2, five, neg4))
    return jnp.where(valid, s, 0)


def _dp_col(code, qprops_ref, h_ref, e_ref, idx, fbias, foff, go, ge,
            engine: str, fwin: int, Mp: int):
    """One reference-column DP update; returns the new H row."""
    s_col = _score_col(code, qprops_ref, engine)
    hp = h_ref[:]
    ep = e_ref[:]
    ev = jnp.maximum(ep - ge, hp - go)
    diag_r = pltpu.roll(hp, shift=1, axis=1)
    diag = jnp.where(idx >= 1, diag_r, 0)
    tmp = jnp.maximum(jnp.maximum(diag + s_col, ev), 0)
    run = tmp + fbias
    k = 1
    while k < min(fwin, Mp):
        r = pltpu.roll(run, shift=k, axis=1)
        run = jnp.maximum(run, jnp.where(idx >= k, r, 0))
        k *= 2
    fv = jnp.where(idx >= 1, pltpu.roll(run, shift=1, axis=1), _NEG) - foff
    hn = jnp.maximum(tmp, fv)
    h_ref[:] = hn
    e_ref[:] = ev
    return hn


def _scan_kernel(codes_ref, qprops_ref, out_ref, h_ref, e_ref, *,
                 m16: int, fwin: int, engine: str):
    """Per-column maxima for T rows over one 128-column chunk."""
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
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, _CHUNK), 1)

    def col(k, carry):
        chunk, cmacc = carry
        code = chunk[:, 0:1]
        hn = _dp_col(code, qprops_ref, h_ref, e_ref, idx, fbias, foff,
                     go, ge, engine, fwin, Mp)
        cm = jnp.max(jnp.where(real_row, hn, 0), axis=1, keepdims=True)
        # select-by-index emission: a rolled accumulator would serialize a
        # cross-lane permute into every column (measured 7x slower)
        cmacc = jnp.where(lane == k, cm, cmacc)
        chunk = pltpu.roll(chunk, shift=_CHUNK - 1, axis=1)
        return chunk, cmacc

    chunk0 = codes_ref[0]
    cmacc0 = jnp.zeros((T, _CHUNK), jnp.int32)
    _, cmacc = jax.lax.fori_loop(0, _CHUNK, col, (chunk0, cmacc0),
                                 unroll=False)
    out_ref[0] = cmacc


@functools.partial(jax.jit,
                   static_argnames=("m16", "fwin", "engine", "interpret"))
def _kernel_call(codes, qprops, *, m16: int, fwin: int, engine: str,
                 interpret: bool = False):
    """codes: int32[S, T, Np]; qprops: int32[4, Mp] -> int32[S, T, Np]."""
    S, T, Np = codes.shape
    Mp = qprops.shape[1]
    kernel = functools.partial(_scan_kernel, m16=m16, fwin=fwin,
                               engine=engine)
    return pl.pallas_call(
        kernel,
        grid=(S, Np // _CHUNK),
        in_specs=[
            pl.BlockSpec((1, T, _CHUNK), lambda s, c: (s, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Mp), lambda s, c: (0, 0),
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
    )(codes, qprops)


class TpuScanEngine:
    """Engine with the numpy_engine contract plus a batched-segments API.

    Per query it caches the two query-property arrays; per segment batch
    it launches one kernel per engine (threshold / scan alphabets differ
    and must not be unified, SURVEY.md §3.3).
    """

    def __init__(self, rna: np.ndarray, interpret: bool = False,
                 pack_rows: int = 0, use_v2: bool = True, device=None,
                 unroll: int = 0):
        # device pins this engine's constants and launches to one local
        # chip (committed arrays); independent engines on different chips
        # run embarrassingly parallel with no collectives (scan/batched.py)
        self.device = device
        _raw_put = (jnp.asarray if device is None
                    else functools.partial(jax.device_put, device=device))
        self.upload_bytes = 0  # host->device bytes (axon retains them)

        def _put(a, _raw=_raw_put):
            if isinstance(a, np.ndarray):
                self.upload_bytes += a.nbytes
            return _raw(a)

        self._put = _put
        self.unroll = unroll if unroll > 0 else int(
            os.environ.get("FASIM_UNROLL", "1"))
        self.interpret = interpret
        self.use_v2 = use_v2
        m = len(rna)
        self.m = m
        self.m16 = _round_up(m, 16)
        mp = _round_up(self.m16, 128)
        self.mp = mp
        if pack_rows <= 0:
            # two (R, Mp) int32 scratch buffers plus ~5 live compiler
            # temporaries of the same shape must fit scoped VMEM (16 MB)
            pack_rows = min(PACK_ROWS, 14_000_000 // (7 * mp * 4) // 8 * 8)
        self.pack_rows = max(8, pack_rows)

        def make_qprops(enc, maska_fn, qn_fn):
            q = enc[rna].astype(np.int32)
            props = np.zeros((4, mp), np.int32)
            props[0, :m] = q
            props[0, m:] = -1
            props[1, :m] = maska_fn(q)
            props[2, :m] = qn_fn(q)
            props[3, :m] = 1
            return self._put(props)

        self.qprops_ssw = make_qprops(
            SSW_ENC, lambda q: q < 4, lambda q: 0)
        self.qprops_thresh = make_qprops(
            THRESH_ENC, lambda q: (q == 3) | (q == 4), lambda q: q == 5)
        self.query_pure = bool(_PURE[rna].all())
        self._scan_luts = None
        self._scan_luts6 = None

        # v2 kernel query rows: [q, hi, lo, nval, fbias-with-sentinel]
        # (int32; the int16 variant reads only rows 0-3 + aux16).
        # Lanes pad to the next 128 multiple with >= 64 sentinel lanes:
        # the 6 prefix steps contaminate pad lanes [m16, m16+63) with
        # rolled-up real values, so the final fv roll (lane 0 <- lane
        # mp2-1) needs mp2-1 >= m16+63, i.e. pad >= 64 — with exactly 63
        # a real F value leaks into lane 0.  (m16 is a static jit arg,
        # so kernels specialize per query length regardless — padding
        # further would only waste lanes; pad lanes are zero-profile and
        # masked at m16.)
        mp2 = _round_up(self.m16 + 64, 128)
        self.mp2 = mp2

        def make_qp2(enc, engine):
            q = enc[rna].astype(np.int32)
            if engine == "thresh":
                q = np.where(q == 4, 3, q)  # U scores exactly like T
            qp = np.zeros((5, mp2), np.int32)
            qp[0, :m] = q
            qp[0, m:] = -1
            if engine == "ssw":
                qp[1, :m] = np.where(q < 4, 5, -4)
                qp[2, :m] = -4
            else:
                qn = q == 5
                qp[1, :m] = np.where(qn, -1, 5)
                qp[2, :m] = np.where(qn, -1, -4)
                qp[3, :m] = -1
            idx = np.arange(mp2)
            qp[4] = np.where(idx < self.m16, idx * GAP_EXTEND, _NEG)
            return self._put(qp)

        self.qp2_ssw = make_qp2(SSW_ENC, "ssw")
        self.qp2_thresh = make_qp2(THRESH_ENC, "thresh")
        # int16-kernel aux rows: [0] pad-lane F poison (added into run),
        # [1] pad-lane H cap (min'd into hn: exactly 0 on pads)
        aux = np.zeros((2, mp2), np.int16)
        aux[0, self.m16:] = _POISON16
        aux[1, :self.m16] = np.iinfo(np.int16).max
        self.aux16 = self._put(aux)
        # The 16-bit kernel is compare-free (poison-add + cap-min pad
        # handling, int32 score select) specifically so it can lower on
        # narrow-ALU targets, but v5e Mosaic cannot legalize *any* packed
        # int16 vector op (arith.maxsi on vector<8x128x2xi16> fails), so
        # it stays opt-in: exact in interpret mode and ready for targets
        # with packed-ALU support (TPU v6+), default-off on hardware.
        self.scan16 = os.environ.get("FASIM_SCAN16", "0") == "1"

    def setup_scans(self, scans: list[dict]) -> None:
        """Precompute composed (rule transform ∘ encoder) LUTs for the
        device-side transform building of scan_segments."""
        from .. import rules

        t = len(scans)
        lut_s = np.empty((t, 256), np.uint8)
        lut_t = np.empty((t, 256), np.uint8)
        is_tr = np.zeros(t, bool)
        for k, sc in enumerate(scans):
            rl = rules.transfer_lut(sc["strand"], sc["para"], sc["rule"])
            lut_s[k] = SSW_ENC[rl].astype(np.uint8)
            lut_t[k] = THRESH_ENC[rl].astype(np.uint8)
            is_tr[k] = sc["xform"] == "tr"
        self._scan_luts = (self._put(lut_s), self._put(lut_t),
                           self._put(is_tr))
        lut6_s = np.zeros((t, 128), np.int32)
        lut6_t = np.zeros((t, 128), np.int32)
        istr = np.zeros((t, 128), np.int32)
        for k, sc in enumerate(scans):
            rl = rules.transfer_lut(sc["strand"], sc["para"], sc["rule"])
            lut6_s[k, :_N_BASE] = _make_lut6(rl, SSW_ENC)
            lut6_t[k, :_N_BASE] = _make_lut6(rl, THRESH_ENC)
            istr[k, :] = int(sc["xform"] == "tr")
        self._scan_luts6 = (self._put(lut6_s), self._put(lut6_t),
                            self._put(istr))

    def scan_segments(self, segs, lengths: np.ndarray,
                      full_prefix: bool = False, host_segs=None):
        """Device-side scan of raw segments (uint8[S, N], N % 128 == 0,
        pad byte 0; may be an already-uploaded device array — pass the
        host bytes as host_segs then, for the purity check).  Returns
        JAX arrays (thresh int32[S, T], scan colmax uint8[S, T, N]) —
        the caller device_gets them, enabling async batch pipelining.
        Caller must check thresh >= BYTE_SAT and rerun with
        full_prefix=True for exact escalated thresholds."""
        chk = host_segs if host_segs is not None else segs
        fused = self.query_pure and bool(_PURE_OR_PAD[np.asarray(chk)].all())
        fwin_t = _FULL_WIN if full_prefix else 64
        if self.use_v2:
            lut6_s, lut6_t, istr = self._scan_luts6
            # int16 DP is exact iff the score bound 5*min(m, n) fits with
            # the decay margin; bitcast row-packing needs an even
            # transform count
            ok16 = (self.scan16 and istr.shape[0] % 2 == 0
                    and 5 * min(self.m16, segs.shape[1]) <= 30000)
            return _device_scan2(
                self._put(segs), self._put(np.asarray(lengths, np.int32)),
                lut6_s, lut6_t, istr, self.qp2_ssw, self.qp2_thresh,
                self.aux16, m16=self.m16, fwin_t=fwin_t, fused=fused,
                interpret=self.interpret, unroll=self.unroll, use16=ok16)
        lut_s, lut_t, is_tr = self._scan_luts
        return _device_scan(
            self._put(segs), self._put(np.asarray(lengths, np.int32)),
            lut_s, lut_t, is_tr, self.qprops_ssw, self.qprops_thresh,
            m16=self.m16, pack=self.pack_rows,
            fwin_t=fwin_t, fused=fused,
            interpret=self.interpret)

    def _call(self, codes, which, fwin):
        qprops = self.qprops_ssw if which == "ssw" else self.qprops_thresh
        out = _kernel_call(jnp.asarray(codes, jnp.int32), qprops,
                           m16=self.m16, fwin=fwin, engine=which,
                           interpret=self.interpret)
        return np.asarray(jax.device_get(out))

    @staticmethod
    def _pad_cols(codes: np.ndarray, pad_code: int) -> np.ndarray:
        S, T, N = codes.shape
        Np = _round_up(N, _CHUNK)
        if Np == N:
            return codes
        padded = np.full((S, T, Np), pad_code, codes.dtype)
        padded[:, :, :N] = codes
        return padded

    def _pack(self, codes: np.ndarray) -> tuple[np.ndarray, int, int]:
        """Pack (S, T, Np) into (ceil(S*T/R), R, Np) sublane rows."""
        S, T, Np = codes.shape
        rows = S * T
        R = min(self.pack_rows, _round_up(rows, 8))
        rp = _round_up(rows, R)
        flat = codes.reshape(rows, Np)
        if rp != rows:
            flat = np.concatenate(
                [flat, np.repeat(flat[-1:], rp - rows, axis=0)])
        return flat.reshape(rp // R, R, Np), S, T

    def colmax_batch(self, codes: np.ndarray, which: str) -> np.ndarray:
        """codes int[S, T, N] (pad = out-of-alphabet code) -> int32[S, T, N]
        column maxima (exact through the byte-break column for 'ssw')."""
        S, T, N = codes.shape
        padded = self._pad_cols(codes, 5 if which == "ssw" else 6)
        packed, S0, T0 = self._pack(padded)
        out = self._call(packed, which, 64)
        out = out.reshape(-1, padded.shape[2])[:S * T].reshape(
            S, T, padded.shape[2])
        return out[:, :, :N]

    def max_batch(self, codes: np.ndarray, which: str) -> np.ndarray:
        """codes int[S, T, N] -> exact global SW max int32[S, T], with the
        byte->word style escalation for windowed-prefix overflow."""
        S, T, N = codes.shape
        padded = self._pad_cols(codes, 5 if which == "ssw" else 6)
        packed, _, _ = self._pack(padded)
        cm = self._call(packed, which, 64)
        gm = cm.reshape(-1, cm.shape[2])[:S * T, :N].max(axis=1)
        gm = gm.reshape(S, T)
        if (gm >= BYTE_SAT).any():
            # escalate: windowed == exact only while all cells < 251
            cm = self._call(packed, which, _FULL_WIN)
            gm = cm.reshape(-1, cm.shape[2])[:S * T, :N].max(axis=1)
            gm = gm.reshape(S, T)
        return gm.astype(np.int32)

    def __call__(self, rna: np.ndarray, seq2_list: list[np.ndarray]
                 ) -> tuple[np.ndarray, np.ndarray]:
        """numpy_engine-compatible single-segment entry."""
        seq2 = np.stack(seq2_list)
        thresh = self.max_batch(
            THRESH_ENC[seq2].astype(np.int32)[None], "thresh")[0]
        scan_cm = self.colmax_batch(
            SSW_ENC[seq2].astype(np.int32)[None], "ssw")[0]
        return thresh.astype(np.int32), apply_byte_break(scan_cm)

    # -- candidate-window passes (see scan/candidates.py) ------------------

    def setup_windows(self, rna: np.ndarray) -> None:
        """Precompute the streamed query codes (forward + reversed); the
        query pads past m+15 (so every per-row phantom bound mreal <=
        m+15 is reachable) to the next 128-row grid chunk (m is a static
        jit arg, so padding further buys no compile reuse — it only adds
        dead grid steps; pad rows have code -1 = zero profile)."""
        m = len(rna)
        nqr = _round_up(m + 15, 128)

        def qcodes(arr):
            q = np.full(nqr, -1, np.int32)
            q[:m] = SSW_ENC[arr]
            q = q.reshape(-1, 1, _CHUNK)
            return self._put(np.broadcast_to(q, (q.shape[0], 8, _CHUNK)))

        self.m = m
        self.win_v2 = os.environ.get("FASIM_WIN_V1", "0") != "1"
        if not self.win_v2:
            self.qwin_fwd = qcodes(rna)
            self.qwin_rev = qcodes(rna[::-1])
            self.win_rows = 512
            return
        # v2 scan-orientation kernel: query on lanes.  sstart = m + 16
        # covers every phantom bound (mreal <= m + 15); the sentinel pad
        # past sstart must cover the gap-prefix window (module comment
        # above _wscan_kernel).  One query row per (direction, fwin);
        # the row count per kernel instance scales down for long queries
        # so ~10 live (R, Mp) int32 arrays stay inside VMEM.
        self.win_sstart = m + 16
        self._qwin2 = {}
        self._qwin3 = {}
        self._win_R = {}
        for fwin in (64, 128, 256):
            Mp = _round_up(self.win_sstart + fwin, 128)
            r = 256
            while r > 8 and 48 * r * Mp > 112 * 2 ** 20:
                r //= 2
            self._win_R[fwin] = r
            for rev in (False, True):
                arr = rna[::-1] if rev else rna
                q = np.full((1, Mp), 127, np.int32)
                q[0, :m] = SSW_ENC[arr]
                self._qwin2[(bool(rev), fwin)] = self._put(q)
            # v3 fwd-specialized query rows: [q, hi, lo, fbias-sentinel]
            qp = np.zeros((4, Mp), np.int32)
            qp[0, :m] = SSW_ENC[rna]
            qp[0, m:] = 127
            qp[1, :m] = np.where(qp[0, :m] < 4, 5, -4)
            qp[2, :m] = -4
            idx = np.arange(Mp)
            qp[3] = np.where(idx < self.win_sstart, idx * GAP_EXTEND,
                             _NEG)
            self._qwin3[fwin] = self._put(qp)
        # v3 serves the uniform production forward dispatches; v2 keeps
        # the reverse pass (terminate semantics need per-column stats)
        # and the generic offs/terms/mreals test interface
        self.win_v3 = os.environ.get("FASIM_WIN_V3", "1") == "1"
        self.n_v3_calls = 0
        # (the window DP stays int32: v5e Mosaic has no packed int16
        # vector ALU, and the stats key packing needs 32-bit range)

    def window_pass(self, codes: np.ndarray, offs: np.ndarray,
                    terms: np.ndarray, rlens: np.ndarray,
                    mreals: np.ndarray, rev: bool) -> np.ndarray:
        """Batched candidate-window pass (contract of
        XlaScanEngine.window_pass).  Rows pack into fixed (G0, R) call
        shapes (one compile per width); the kernel emits per-lane
        (column max, first row) stats and the scan-order semantics —
        last strict improvement, lowest attaining row, terminate break —
        are recovered here as vectorized prefix/argmax post-ops."""
        rows, W = codes.shape
        if rows == 0:
            return np.zeros((0, 3), np.int32)
        m = self.m
        if self.win_v2:
            rlmax = int(np.max(rlens, initial=0))
            wcols = next((w for w in sorted(_WCLASSES) if rlmax <= w),
                         _WWIN)
            fwin = _WCLASSES[wcols][1]
            Wp = max(_CHUNK, wcols)
            R = self._win_R[fwin]
            rp = _round_up(rows, R)
            cp = np.full((rp, Wp), 4, np.uint8)
            cp[:rows, :min(W, Wp)] = codes[:, :Wp]
            mt = np.zeros((rp, 128), np.int32)
            mt[:rows, 0] = offs
            mt[:rows, 1] = mreals
            uniform = False
            mk = np.asarray(_wscan_call(
                self._put(cp.reshape(rp // R, R, Wp)),
                self._put(mt.reshape(rp // R, R, 128)),
                self._qwin2[(bool(rev), fwin)], m=m,
                sstart=self.win_sstart, fwin=fwin, wcols=wcols,
                uniform=uniform, step2=_WSTEP2,
                interpret=self.interpret)).reshape(rp, Wp)[:rows]
            mx, mrow = _decode_key(mk)
            return window_stats_to_ends(mx, mrow, terms, rlens, m)
        qc = self.qwin_rev if rev else self.qwin_fwd
        Wp = _round_up(W, 128)
        R = self.win_rows
        g8 = R * 8
        rp = _round_up(rows, R)
        mt = np.zeros((rp, 128), np.int32)
        mt[:rows, 0] = offs
        mt[:rows, 1] = mreals
        cp = np.full((rp, Wp), 4, np.uint8)
        cp[:rows, :W] = codes
        pending = []
        lo = 0
        while lo < rows:
            g = 8 if rows - lo >= g8 else 1
            n = R * g
            pending.append(_window_call(
                self._put(cp[lo:lo + n].reshape(g, R, Wp)),
                self._put(mt[lo:lo + n].reshape(g, R, 128)),
                qc, m=m, interpret=self.interpret))
            lo += n
        mk = np.concatenate(
            [np.asarray(o).reshape(-1, Wp) for o in pending])[:rows]
        mx, mrow = _decode_key(mk)
        return window_stats_to_ends(mx, mrow, terms, rlens, m)

    PACK_K = 384  # > p99 of measured candidate-column counts (270)

    def scan_segments_packed(self, segs: np.ndarray, lengths: np.ndarray):
        """scan_segments + device-side candidate packing: returns
        (thresh_dev, cm_dev, pos_dev, val_dev, cnt_dev, segs_dev) —
        cm_dev is the resident full colmax handle for escalation/
        overflow fallbacks (only sliced rows are ever transferred);
        segs_dev is the batch's uploaded segment bytes, which the
        window passes reuse so the batch uploads them ONCE (the axon
        client retains every uploaded buffer — scan/batched.py r5
        leak finding — so upload bytes are a resource, not just
        latency)."""
        segs_d = self._put(segs)
        thresh, cm = self.scan_segments(segs_d, lengths, host_segs=segs)
        if segs.shape[1] > 32767:
            # packed positions are int16: a cut_length beyond int16 range
            # would wrap silently — serve the full colmax path instead
            return thresh, cm
        lens = self._put(np.asarray(lengths, np.int32))
        pos, val, cnt = _pack_candidates(thresh, cm, lens, k=self.PACK_K)
        return thresh, cm, pos, val, cnt, segs_d

    def _upload_specs(self, spec: dict, keys, idx, bucket: int, dt,
                      fills: np.ndarray):
        """Gather spec columns for `idx`, upload at the smallest ladder
        size >= len(idx), and pad to `bucket` on device with per-row
        fill values — the Mosaic kernels still see fixed (bucket,)
        specs, but the upload (whose bytes the axon client retains, and
        which crosses a slow link) shrinks to the occupied prefix."""
        take = len(idx)
        lad = next((b for b in (512, 1024, 2048) if b >= take), bucket)
        lad = min(lad, bucket)
        cols = np.empty((len(keys), lad), dt)
        for r, k in enumerate(keys):
            cols[r, :take] = spec[k][idx]
            cols[r, take:] = fills[r]
        cols_d = _pad_spec_cols(self._put(cols),
                                self._put(fills.astype(np.int32)),
                                bucket=bucket)
        return {k: cols_d[r] for r, k in enumerate(keys)}

    # production path: specs in (~26 B/row), ends out (12 B/row) — the
    # window codes are gathered on device from the batch's resident
    # segment bytes and the composed scan LUTs, and the scan-order ends
    # (incl. terminate) are reduced on device, so only tiny arrays cross
    # the (slow) host<->device link.  Rows partition into lane-width
    # classes — windows <= 64 pack TWO per 128-lane kernel row (half the
    # rows AND a shallower gap prefix; the typical sweep window is 40-60
    # wide), <= 128 get single 128-lane rows, the rest the full 256 —
    # and pad to a bucket ladder per class; all parts dispatch async
    # before any result is forced, so the link latency is paid once per
    # call, not per part.  Bucket sizes are SPEC entries (the packed
    # class fits 2 per kernel row).
    WIN_BUCKETS = {48: (4096, 32768), 64: (4096, 32768),
                   96: (4096, 32768), 128: (4096, 32768),
                   _WWIN: (2048, 16384)}
    _SPEC_KEYS = ("seg_idx", "scan_idx", "base", "dirn", "rlens", "offs",
                  "terms", "mreals")

    def window_pass_specs(self, segs: np.ndarray, lengths: np.ndarray,
                          spec: dict, rev: bool) -> np.ndarray:
        """spec arrays (all int32[rows]): seg_idx, scan_idx, base, dirn
        (+1 forward / -1 reversed window read), rlens, offs, terms,
        mreals.  Returns int32[rows, 3] (best, end_col, end_row)."""
        rows = len(spec["seg_idx"])
        if rows == 0:
            return np.zeros((0, 3), np.int32)
        v2 = self.win_v2
        if (v2 and not rev and getattr(self, "win_v3", False)
                and (spec["offs"] == 0).all()
                and (spec["terms"] == -1).all()
                and (spec["mreals"] == self.m16).all()
                and (spec["dirn"] == 1).all()):
            return self._window_pass_specs_fwd(segs, lengths, spec)
        if not v2:
            qc = self.qwin_rev if rev else self.qwin_fwd
        lut_s, _, is_tr = self._scan_luts
        segs_d = self._put(segs)
        lens_d = self._put(np.asarray(lengths, np.int32))
        rl = spec["rlens"]
        if v2:
            widths = sorted(_WCLASSES)
            klass = np.full(len(rl), _WWIN)
            for w in reversed(widths):
                klass = np.where(rl <= w, w, klass)
        else:
            widths = (64, 128, _WWIN)
            klass = np.where(rl <= 64, 64, np.where(rl <= 128, 128, _WWIN))
        pending = []  # (dest row indices, device array, take)
        for w in widths:
            sel = np.flatnonzero(klass == w)
            if not len(sel):
                continue
            if v2:
                # fixed-size chunked dispatch: the Mosaic kernel and the
                # XLA wrapper both compile once per class, and padding
                # waste is bounded by one chunk per class (the bucket
                # ladder padded a 20k-row class to 32768 rows)
                bsz = self.WIN_BUCKETS[w][0]
                ladder = (bsz,)
            else:
                ladder = self.WIN_BUCKETS[w]
            # one ladder-sized upload per part, int16 when every field
            # fits (upload bytes are retained by the axon client)
            narrow = (v2 and segs.shape[1] <= 32767
                      and self.m + 16 <= 32767)
            dtp = np.int16 if narrow else np.int32
            fills = np.array([0, 0, 0, 1, 0, 0, -1, 0], dtp)
            lo = 0
            while lo < len(sel):
                n = len(sel) - lo
                bucket = next((b for b in ladder if b >= n), ladder[-1])
                take = min(n, bucket)
                idx = sel[lo:lo + take]
                part = self._upload_specs(spec, self._SPEC_KEYS, idx,
                                          bucket, dtp, fills)
                if v2:
                    wcols, fwin = _WCLASSES[w]
                    # uniform (1, Mp) masks measured ~10% SLOWER than
                    # per-row (R, Mp) materializations on v5e (broadcast
                    # reads cost more than full-row reads); keep False
                    uniform = False
                    dev = _wspecs_call(
                        segs_d, lens_d, lut_s, is_tr,
                        self._qwin2[(bool(rev), fwin)],
                        part["seg_idx"], part["scan_idx"], part["base"],
                        part["dirn"], part["rlens"], part["offs"],
                        part["terms"], part["mreals"], m=self.m,
                        sstart=self.win_sstart, fwin=fwin, wcols=wcols,
                        R=self._win_R[fwin], uniform=uniform,
                        step2=_WSTEP2, interpret=self.interpret)
                elif w == 64:
                    dev = _window_specs_call2(
                        segs_d, lens_d, lut_s, is_tr, qc,
                        part["seg_idx"], part["scan_idx"], part["base"],
                        part["dirn"], part["rlens"], part["offs"],
                        part["terms"], part["mreals"], m=self.m,
                        interpret=self.interpret)
                else:
                    dev = _window_specs_call(
                        segs_d, lens_d, lut_s, is_tr, qc,
                        part["seg_idx"], part["scan_idx"], part["base"],
                        part["dirn"], part["rlens"], part["offs"],
                        part["terms"], part["mreals"], m=self.m, w=w,
                        interpret=self.interpret)
                pending.append((idx, dev, take))
                lo += take
        out = np.zeros((rows, 3), np.int32)
        # one device_get for every part: per-part np.asarray would pay
        # one link round trip each (~tens of ms under the tunnel)
        fetched = jax.device_get([dev for _, dev, _ in pending])
        for (idx, _, take), arr in zip(pending, fetched):
            out[idx] = arr[:take]
        return out

    def _window_pass_specs_fwd(self, segs: np.ndarray,
                               lengths: np.ndarray, spec: dict
                               ) -> np.ndarray:
        """Uniform forward dispatches via the v3 per-lane kernel (same
        class partition / fixed-chunk dispatch as the v2 path; all
        parts dispatch async before any result is forced)."""
        self.n_v3_calls += 1
        rows = len(spec["seg_idx"])
        lut_s, _, is_tr = self._scan_luts
        segs_d = self._put(segs)
        lens_d = self._put(np.asarray(lengths, np.int32))
        rl = spec["rlens"]
        widths = sorted(_WCLASSES)
        klass = np.full(len(rl), _WWIN)
        for w in reversed(widths):
            klass = np.where(rl <= w, w, klass)
        # upload bytes are a resource (the axon client retains every
        # uploaded buffer): ship the four spec columns as one
        # ladder-sized int16 array when values fit (seg/scan idx and
        # rlens always do; base <= N-1, guarded), int32 otherwise
        narrow = segs.shape[1] <= 32767
        dt = np.int16 if narrow else np.int32
        fwd_keys = ("seg_idx", "scan_idx", "base", "rlens")
        fills = np.zeros(4, dt)
        pending = []
        for w in widths:
            sel = np.flatnonzero(klass == w)
            if not len(sel):
                continue
            bsz = self.WIN_BUCKETS[w][0]
            lo = 0
            while lo < len(sel):
                take = min(len(sel) - lo, bsz)
                idx = sel[lo:lo + take]
                part = self._upload_specs(spec, fwd_keys, idx, bsz, dt,
                                          fills)
                wcols, fwin = _WCLASSES[w]
                dev = _wspecs_fwd_call(
                    segs_d, lens_d, lut_s, is_tr, self._qwin3[fwin],
                    part["seg_idx"], part["scan_idx"], part["base"],
                    part["rlens"], m=self.m, m16=self.m16, wcols=wcols,
                    fwin=fwin, R=self._win_R[fwin],
                    interpret=self.interpret)
                pending.append((idx, dev, take))
                lo += take
        out = np.zeros((rows, 3), np.int32)
        fetched = jax.device_get([dev for _, dev, _ in pending])
        for (idx, _, take), arr in zip(pending, fetched):
            out[idx] = arr[:take]
        return out


@functools.partial(jax.jit,
                   static_argnames=("m16", "pack", "fwin_t", "fused",
                                    "interpret"))
def _device_scan(segs, lengths, lut_s, lut_t, is_tr, qprops_s, qprops_t,
                 *, m16: int, pack: int, fwin_t: int, fused: bool = False,
                 interpret: bool = False):
    """Full device-side scan step for a batch of raw DNA segments.

    segs: uint8[S, N] raw segment bytes (N multiple of 128, pad byte 0 —
    it maps to 'N' codes, whose strictly negative scores cannot raise any
    column max); lengths: int32[S] real segment lengths; lut_*: uint8[T,
    256] composed (rule transform ∘ encoder) tables; is_tr: bool[T] rows
    whose transform is reversed (rules REV orientation — elementwise LUTs
    commute with reversal).

    Returns (thresh int32[S, T], scan colmax uint8[S, T, N] clamped at
    255).  Everything the host consumes from the scan pass is < 251
    (byte-break) so the clamp is lossless; the threshold max is exact
    int32.  Building the 48 transforms on device means only ~N bytes per
    segment cross the host link instead of 2 x 48 x N x 4.

    `fused` (static; caller proves query + segments are pure A/C/G/T):
    the threshold DP is identical to the scan DP, so skip it and read the
    threshold off the scan pass's int32 column maxima — one full pass
    instead of two.  The escalation protocol is unchanged: windowed
    maxima are exact until the first >= BYTE_SAT cell, so thresh >=
    BYTE_SAT still triggers the caller's full-prefix rerun, which in
    fused mode runs the single pass with a full-length prefix.
    """
    S, N = segs.shape
    T = lut_s.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    ridx = jnp.where(pos[None, :] < lengths[:, None],
                     lengths[:, None] - 1 - pos[None, :], pos[None, :])
    seg_rev = jnp.take_along_axis(segs, ridx, axis=1)
    sel = jnp.where(is_tr[None, :, None], seg_rev[:, None, :],
                    segs[:, None, :])  # (S, T, N) uint8

    def apply_lut(lut):
        gathered = jax.vmap(lambda l, x: l[x.astype(jnp.int32)],
                            in_axes=(0, 1), out_axes=1)(lut, sel)
        return gathered.astype(jnp.int32)

    def run(codes, qprops, engine, fwin):
        flat = codes.reshape(S * T, N)
        rows = S * T
        rp = _round_up(rows, pack)
        if rp != rows:
            flat = jnp.concatenate(
                [flat, jnp.broadcast_to(flat[-1:], (rp - rows, N))])
        packed = flat.reshape(rp // pack, pack, N)
        cm = _kernel_call(packed, qprops, m16=m16, fwin=fwin,
                          engine=engine, interpret=interpret)
        return cm.reshape(rp, N)[:rows].reshape(S, T, N)

    if fused:
        scan_cm = run(apply_lut(lut_s), qprops_s, "ssw", fwin_t)
        thresh = scan_cm.max(axis=-1)
    else:
        thresh_cm = run(apply_lut(lut_t), qprops_t, "thresh", fwin_t)
        scan_cm = run(apply_lut(lut_s), qprops_s, "ssw", 64)
        thresh = thresh_cm.max(axis=-1)
    return thresh, jnp.minimum(scan_cm, 255).astype(jnp.uint8)


# --- v2 scan kernel: in-kernel transform decode + fused outputs -------------
#
# The v1 kernel (above) consumes prebuilt (rows, N) code arrays; building
# those on device (48 gathers over 256-entry LUTs per segment), packing
# them, reducing the int32 column maxima to thresholds, and clamping to
# uint8 cost as much wall-clock as the DP itself.  The v2 kernel instead
# takes the *raw segment* as 6-letter base codes (A,C,G,T,U,rest->N; the
# composition transferString o encoder factors through these classes,
# since transferString only translates uppercase ATGCN, rules.h:308-311)
# plus a per-transform (T, 6) decode LUT, and per 128-column chunk decodes
# the (T, 128) engine codes with 6 vector selects — amortized to ~1/20 op
# per column.  It also accumulates the per-row global max in VMEM (the
# threshold needs no second XLA pass over the int32 colmax) and emits the
# colmax pre-clamped as uint8 (4x less HBM + host-link traffic; the byte-
# break consumer never reads values >= 255).
#
# Per-column op count also drops vs v1:
#   * substitution score via precomputed hi/lo query rows: s = (code==q) ?
#     hi : lo (+ one N-row fixup for the threshold alphabet) — 2 ops vs 4.
#   * the vertical-gap prefix max runs unmasked: the fbias row holds a
#     -2^30 sentinel in the >= m16 alignment-pad lanes, and mp reserves
#     >= 64 such lanes — the prefix steps progressively contaminate pad
#     lanes [m16, m16+63) with rolled-up real values, so every wrapped
#     read (steps target the top 32 lanes; the final fv roll targets the
#     very top lane) stays inside still-sentineled territory only when
#     the pad is >= 64 — 2 ops/round vs 3.  The full-length prefix of
#     the escalated pass rolls farther than the pad region, so it keeps
#     the masked form (rare path).
_BASE6 = np.full(256, 5, np.uint8)  # A0 C1 G2 T3 U4, everything else N=5
for _i, _c in enumerate(b"ACGTU"):
    _BASE6[_c] = _i
_N_BASE = 6


def _make_lut6(rule_lut: np.ndarray, enc: np.ndarray) -> np.ndarray:
    """(6,) engine codes for one transform: base class -> transferString
    target -> engine code.  Base 4 (U) is untranslatable -> 'N'."""
    chars = np.frombuffer(b"ACGTUN", np.uint8)
    return enc[rule_lut[chars]].astype(np.int32)


def _roll_l(x, shift: int):
    """Lane roll for any dtype.  Mosaic's rotate lowers 32-bit data only;
    sub-32-bit arrays are bitcast to int32 first — TPU packs narrow types
    along the *sublane* axis (2nd-minor), so an int16[T, Mp] views as
    int32[T/2, Mp] with each 32-bit lane holding two same-lane int16
    values, and a lane roll of the view is exactly a lane roll of the
    original (verified in interpret mode + hardware parity tests)."""
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, shift=shift, axis=1)
    return pltpu.bitcast(
        pltpu.roll(pltpu.bitcast(x, jnp.int32), shift=shift, axis=1),
        x.dtype)


# int16 pad-lane poison, applied by ADDITION (v5e Mosaic supports packed
# 16-bit add/sub/max/min but not 16-bit compares or selects): poisoned
# entries stay <= bound - 32000 < -63*ge - go (they lose against every
# real F contribution, whose decay is at most the 63-lane window) and
# the worst decayed poison -32000 - 63*ge - go > int16 min (no wrap).
_POISON16 = -32000


def _dp_col2(code, qprops_ref, aux16_ref, h_ref, e_ref, idx, foff, go, ge,
             engine: str, sentinel: bool, fwin: int, Mp: int):
    """One column update for the v2 kernel; returns the new H row.

    int32 path: vertical-gap prefix max over (tmp + i*ge), the sentinel
    fbias row poisoning pad lanes (module comment).

    int16 path (h_ref int16): the score select runs in int32 (no 16-bit
    compares on v5e) and truncates; the F resolution is a *decaying*
    prefix max — run_k(i) = max(run_{k-1}(i), run_{k-1}(i-2^k) - 2^k*ge)
    — which keeps every intermediate within tmp's range (no i*ge bias
    growing with lane index), so 16-bit is exact whenever final scores
    fit.  Pad-lane protection is compare-free: aux16 row 0 adds the
    poison into `run` (zero on real lanes), and aux16 row 1 caps pad-lane
    H at exactly 0 via `min` — which also makes the lane-0 diagonal wrap
    (from the last pad lane) the exact H=0 boundary condition, removing
    the diag mask."""
    dt = h_ref.dtype
    q = qprops_ref[0:1, :]
    hi = qprops_ref[1:2, :]
    lo = qprops_ref[2:3, :]
    s_col = jnp.where(code == q, hi, lo)
    if engine == "thresh":
        s_col = jnp.where(code == 5, qprops_ref[3:4, :], s_col)
    hp = h_ref[:]
    ep = e_ref[:]
    ev = jnp.maximum(ep - ge, hp - go)
    if dt == jnp.int16:
        assert sentinel
        s16 = s_col.astype(dt)
        diag = _roll_l(hp, 1)  # pad H == 0 -> exact lane-0 boundary
        tmp = jnp.maximum(jnp.maximum(diag + s16, ev), dt.type(0))
        run = tmp + aux16_ref[0:1, :]
        k = 1
        while k < min(fwin, Mp):
            run = jnp.maximum(run, _roll_l(run, k) - dt.type(k * GAP_EXTEND))
            k *= 2
        fv = _roll_l(run, 1) - go
        hn = jnp.minimum(jnp.maximum(tmp, fv), aux16_ref[1:2, :])
    else:
        diag = jnp.where(idx >= 1, pltpu.roll(hp, shift=1, axis=1), 0)
        tmp = jnp.maximum(jnp.maximum(diag + s_col, ev), 0)
        fbias = qprops_ref[4:5, :]
        run = tmp + fbias
        k = 1
        while k < min(fwin, Mp):
            r = pltpu.roll(run, shift=k, axis=1)
            if sentinel:
                run = jnp.maximum(run, r)
            else:
                run = jnp.maximum(run, jnp.where(idx >= k, r, 0))
            k *= 2
        if sentinel:
            fv = pltpu.roll(run, shift=1, axis=1) - foff
        else:
            fv = jnp.where(idx >= 1, pltpu.roll(run, shift=1, axis=1),
                           _NEG) - foff
        hn = jnp.maximum(tmp, fv)
    h_ref[:] = hn
    e_ref[:] = ev
    return hn


def _scan2_kernel(bf_ref, br_ref, lut_ref, istr_ref, qprops_ref, aux16_ref,
                  cm_ref, gm_ref, h_ref, e_ref, *,
                  m16: int, fwin: int, engine: str, unroll: int = 1):
    """One (segment, 128-column chunk) grid step over all T transforms.
    DP dtype follows the scratch dtype (int32, or int16 when the caller
    proves scores fit — the int16 variant halves the vreg footprint of
    every elementwise op, the dominant cost of this op-bound kernel)."""
    T = lut_ref.shape[0]
    Mp = h_ref.shape[1]
    dt = h_ref.dtype
    go = dt.type(GAP_OPEN)
    ge = dt.type(GAP_EXTEND)
    sentinel = fwin <= 64  # see module comment: pad lanes >= rolls

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        e_ref[:] = jnp.zeros_like(e_ref)
        gm_ref[0] = jnp.zeros_like(gm_ref[0])

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    foff = (jnp.int32(GAP_OPEN) + (idx - 1) * jnp.int32(GAP_EXTEND)
            if dt == jnp.int32 else None)
    real_row = idx < m16
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, _CHUNK), 1)

    # decode this chunk's (T, 128) engine codes from the base classes;
    # the whole segment's bases are resident (block constant over c), so
    # select this chunk with a dynamic sublane slice
    cid = pl.program_id(1)
    bf = bf_ref[0, pl.ds(cid, 1), :]  # (1, 128)
    br = br_ref[0, pl.ds(cid, 1), :]
    sel = jnp.where(istr_ref[:] != 0, br, bf)  # (T, 128)
    ck = jnp.broadcast_to(lut_ref[:, 0:1], (T, _CHUNK))
    for b in range(1, _N_BASE):
        ck = jnp.where(sel == b, lut_ref[:, b:b + 1], ck)

    def col(k, carry):
        chunk, cmacc = carry
        code = chunk[:, 0:1]
        hn = _dp_col2(code, qprops_ref, aux16_ref, h_ref, e_ref, idx,
                      foff, go, ge, engine, sentinel, fwin, Mp)
        if dt == jnp.int32:
            masked = jnp.where(real_row, hn, 0)
        else:
            # pad lanes are capped at exactly 0 (aux16 row 1) and phantom
            # rows < m16 count, so no mask is needed; Mosaic has no int16
            # lane reduce — widen first
            masked = hn.astype(jnp.int32)
        cm = jnp.max(masked, axis=1, keepdims=True)
        cmacc = jnp.where(lane == k, cm, cmacc)
        chunk = pltpu.roll(chunk, shift=_CHUNK - 1, axis=1)
        return chunk, cmacc

    cmacc0 = jnp.zeros((T, _CHUNK), jnp.int32)
    _, cmacc = jax.lax.fori_loop(0, _CHUNK, col, (ck, cmacc0),
                                 unroll=unroll)
    cm_ref[0] = jnp.minimum(cmacc, 255).astype(jnp.uint8)
    gm_ref[0] = jnp.maximum(gm_ref[0], cmacc)


@functools.partial(jax.jit,
                   static_argnames=("m16", "fwin", "engine", "interpret",
                                    "unroll", "use16"))
def _kernel2_call(bases, bases_rev, lut6, istr, qprops, aux16, *, m16: int,
                  fwin: int, engine: str, interpret: bool = False,
                  unroll: int = 1, use16: bool = False):
    """bases/bases_rev: int32[S, Np]; lut6/istr: int32[T, 128];
    qprops: int32[5, Mp]; aux16: int16[2, Mp] (row 0 pad poison, row 1
    pad H cap; ignored unless use16) -> (colmax uint8[S, T, Np],
    gm int32[S, T, 128])."""
    S, Np = bases.shape
    T = lut6.shape[0]
    Mp = qprops.shape[1]
    dt = jnp.int16 if use16 else jnp.int32
    nc = Np // _CHUNK
    bases = bases.reshape(S, nc, _CHUNK)
    bases_rev = bases_rev.reshape(S, nc, _CHUNK)
    kernel = functools.partial(_scan2_kernel, m16=m16, fwin=fwin,
                               engine=engine, unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=(S, nc),
        in_specs=[
            pl.BlockSpec((1, nc, _CHUNK), lambda s, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, _CHUNK), lambda s, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 128), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 128), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, Mp), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Mp), lambda s, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, T, _CHUNK), lambda s, c: (s, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 128), lambda s, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, T, Np), jnp.uint8),
            jax.ShapeDtypeStruct((S, T, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, Mp), dt),
            pltpu.VMEM((T, Mp), dt),
        ],
        # long queries (NEAT1: Mp ~22.9k lanes -> ~22 MB of H/E state +
        # temporaries) exceed Mosaic's default 16 MB scoped-vmem budget;
        # v5e has 128 MB of VMEM, so raise the cap with the state size
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(112 * 2 ** 20,
                                 max(32 * 2 ** 20, 24 * T * Mp))),
        interpret=interpret,
    )(bases, bases_rev, lut6, istr, qprops, aux16)


@functools.partial(jax.jit,
                   static_argnames=("m16", "fwin_t", "fused", "interpret",
                                    "unroll", "use16"))
def _device_scan2(segs, lengths, lut6_s, lut6_t, istr, qp2_s, qp2_t,
                  aux16, *, m16: int, fwin_t: int, fused: bool,
                  interpret: bool = False, unroll: int = 1,
                  use16: bool = False):
    """v2 device scan: same contract as _device_scan (thresh int32[S, T],
    colmax uint8[S, T, N]) with the decode/reduce/clamp all in-kernel.
    use16 runs the windowed passes in 16-bit; the escalated full-prefix
    pass always stays int32 (its prefix rolls past the poison window)."""
    base_lut = jnp.asarray(_BASE6.astype(np.int32))
    base = base_lut[segs.astype(jnp.int32)]  # (S, N)
    S, N = base.shape
    pos = jnp.arange(N, dtype=jnp.int32)
    ridx = jnp.where(pos[None, :] < lengths[:, None],
                     lengths[:, None] - 1 - pos[None, :], pos[None, :])
    base_rev = jnp.take_along_axis(base, ridx, axis=1)
    fwin_s = fwin_t if fused else 64
    cm_u8, gm_s = _kernel2_call(base, base_rev, lut6_s, istr, qp2_s, aux16,
                                m16=m16, fwin=fwin_s,
                                engine="ssw", interpret=interpret,
                                unroll=unroll,
                                use16=use16 and fwin_s <= 64)
    if fused:
        thresh = gm_s.max(axis=-1)
    else:
        _, gm_t = _kernel2_call(base, base_rev, lut6_t, istr, qp2_t, aux16,
                                m16=m16, fwin=fwin_t, engine="thresh",
                                interpret=interpret, unroll=unroll,
                                use16=use16 and fwin_t <= 64)
        thresh = gm_t.max(axis=-1)
    return thresh, cm_u8


# --- candidate-window pass kernel -------------------------------------------
#
# Batched device equivalent of the per-candidate forward/reverse striped
# passes (sswNew.cpp:1446-1547): each sublane row is one candidate window
# (<= 256 ref columns) on the LANE axis, the shared query streamed as
# grid-chunked columns — the transposed orientation keeps all DP state at
# (R, 256) (2 vregs per 8-row block) instead of (R, |query|), and the
# ref-gap prefix max spans the whole 256-lane axis so it is exact at any
# cell magnitude.  The kernel emits per-lane (column max, first attaining
# row) stats; window_stats_to_ends recovers the reference pass outputs
# (best, end_col, end_row, terminate break) as vectorized host post-ops.
# See scan/candidates.py for the exactness contract (offsets emulate
# reversed-prefix queries; mreal is the per-row phantom-row bound of the
# byte/word pass).


@functools.partial(jax.jit, static_argnames=("bucket",))
def _pad_spec_cols(cols, fills, *, bucket: int):
    """(nk, lad) spec columns -> (nk, bucket), per-row fill values."""
    nk, lad = cols.shape
    if lad >= bucket:
        return cols
    pad = jnp.broadcast_to(fills[:, None],
                           (nk, bucket - lad)).astype(cols.dtype)
    return jnp.concatenate([cols, pad], axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def _pack_candidates(thresh, cm_u8, lengths, *, k: int):
    """Device-side compaction of the scan colmax: byte-break, threshold
    mask (min_score = trunc(0.8 * thresh), computed exactly as 4t//5 —
    equal to the C double truncation for all t < 2^50), then the first k
    above-threshold column (position, value) pairs per (segment,
    transform).  Only ~k*3 bytes per pair cross the host link instead of
    the full N-byte colmax row (the link may be slow); counts > k flag
    overflow rows for a host-side full-row fallback."""
    S, T, N = cm_u8.shape
    cm = cm_u8.astype(jnp.int32)
    lane = jnp.arange(N, dtype=jnp.int32)
    sat = cm >= BYTE_SAT
    first = jnp.where(sat.any(axis=-1), jnp.argmax(sat, axis=-1), N)
    cmb = jnp.where(lane < first[..., None], cm, 0)
    ms = 4 * thresh // 5
    mask = (cmb > ms[..., None]) & (lane[None, None, :]
                                    < lengths[:, None, None])
    cnt = mask.sum(axis=-1).astype(jnp.int32)
    # compaction via top_k (scatter is serialized on TPU): key = lane for
    # candidates, N+lane otherwise; the k smallest keys are the first k
    # candidate positions in order
    key = jnp.where(mask, lane, N + lane)
    neg_top, _ = jax.lax.top_k(-key, k)
    pos = -neg_top  # ascending keys
    good = pos < N
    posc = jnp.where(good, pos, 0)
    val = jnp.take_along_axis(cmb, posc, axis=-1)
    return (jnp.where(good, posc, 0).astype(jnp.int16),
            jnp.where(good, val, 0).astype(jnp.uint8), cnt)


def pack_candidates_np(thresh: np.ndarray, cm_u8: np.ndarray,
                       lengths: np.ndarray, k: int):
    """Host mirror of _pack_candidates (XLA engine / tests)."""
    S, T, N = cm_u8.shape
    pos = np.zeros((S, T, k), np.int16)
    val = np.zeros((S, T, k), np.uint8)
    cnt = np.zeros((S, T), np.int32)
    for s in range(S):
        for t in range(T):
            row = cm_u8[s, t].astype(np.int32)
            satj = np.flatnonzero(row >= BYTE_SAT)
            stop = int(satj[0]) if len(satj) else N
            stop = min(stop, int(lengths[s]))
            ms = 4 * int(thresh[s, t]) // 5
            cand = np.flatnonzero(row[:stop] > ms)
            cnt[s, t] = len(cand)
            take = cand[:k]
            pos[s, t, :len(take)] = take
            val[s, t, :len(take)] = row[take]
    return pos, val, cnt


# (window lane width class _WWIN is defined above the engine class)


def _ends_from_stats(mx, mrow, terms, rlens, m: int):
    """Shared scan-order ends reduction (jnp): per-lane stats ->
    (best, end_col, end_row) with terminate semantics; mirrors
    window_stats_to_ends."""
    W = mx.shape[1]
    li = jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = li < rlens[:, None]
    eqt = valid & (mx == terms[:, None]) & (terms[:, None] >= 0)
    has = eqt.any(axis=1)
    bcol = jnp.argmax(eqt, axis=1)
    limit = jnp.where(has, bcol, W - 1)
    pref = valid & (li <= limit[:, None])
    mxv = jnp.where(pref, mx, 0)
    best = mxv.max(axis=1)
    ecol = jnp.argmax(mxv == best[:, None], axis=1).astype(jnp.int32)
    erow = jnp.take_along_axis(mrow, ecol[:, None], axis=1)[:, 0]
    none = best <= 0
    return jnp.stack([best, jnp.where(none, -1, ecol),
                      jnp.where(none, m - 1, erow)], axis=-1)


@functools.partial(jax.jit, static_argnames=("m", "w", "interpret"))
def _window_specs_call(segs, lengths, lut_s, is_tr, qcodes, seg_idx,
                       scan_idx, base, dirn, rlens, offs, terms, mreals,
                       *, m: int, w: int = _WWIN, interpret: bool = False):
    """Device-side window build + pass + ends reduction in one program.

    segs uint8[S, N] (the scan batch's raw segment bytes, pad byte 0);
    spec arrays int32[rows].  Window lane l reads the transformed segment
    at position base + dirn*l (dirn -1 expresses the reverse pass's
    reversed window read); rlens gates pad lanes to code 4; `w` is the
    lane width class (rlen <= w; the kernel uses masked gap prefixes,
    not pad-lane poison, so rlen == w is safe — the caller partitions
    rows by width so narrow windows pay for 128 lanes, not 256).  Output
    int32[rows, 3] = (best, end_col, end_row) with terminate semantics —
    see window_stats_to_ends for the host-side mirror of the reduction.
    """
    S, N = segs.shape
    rows = seg_idx.shape[0]
    W = w
    pos = jnp.arange(N, dtype=jnp.int32)
    ridx = jnp.where(pos[None, :] < lengths[:, None],
                     lengths[:, None] - 1 - pos[None, :], pos[None, :])
    segs_rev = jnp.take_along_axis(segs, ridx, axis=1)
    both = jnp.stack([segs, segs_rev]).reshape(-1)  # (2*S*N,)
    li = jnp.arange(W, dtype=jnp.int32)[None, :]
    p = jnp.clip(base[:, None] + dirn[:, None] * li, 0, N - 1)
    segsel = jnp.where(is_tr[scan_idx], 1, 0).astype(jnp.int32)
    byte = both[(segsel[:, None] * S + seg_idx[:, None]) * N + p]
    code = lut_s[scan_idx[:, None], byte.astype(jnp.int32)]
    code = jnp.where(li < rlens[:, None], code.astype(jnp.int32),
                     4).astype(jnp.uint8)
    R = 256
    G = rows // R
    rmeta = jnp.zeros((rows, 128), jnp.int32)
    rmeta = rmeta.at[:, 0].set(offs).at[:, 1].set(mreals)
    mk = _window_call(code.reshape(G, R, W),
                      rmeta.reshape(G, R, 128), qcodes, m=m,
                      interpret=interpret)
    mx, mrow = _decode_key(mk.reshape(rows, W))
    return _ends_from_stats(mx, mrow, terms, rlens, m)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _window_specs_call2(segs, lengths, lut_s, is_tr, qcodes, seg_idx,
                        scan_idx, base, dirn, rlens, offs, terms, mreals,
                        *, m: int, interpret: bool = False):
    """Packed variant of _window_specs_call: spec arrays hold 2*rows_p
    windows (entries 2i / 2i+1 are kernel row i's A / B halves), every
    rlen <= 64; each kernel row computes two independent 64-lane DPs
    (subw=64 — see _window_kernel), halving both the row count and the
    gap-prefix depth for the narrow-window majority.  Output int32
    [2*rows_p, 3] in spec order."""
    S, N = segs.shape
    n2 = seg_idx.shape[0]
    rows_p = n2 // 2
    W = 128
    sub = 64
    pos = jnp.arange(N, dtype=jnp.int32)
    ridx = jnp.where(pos[None, :] < lengths[:, None],
                     lengths[:, None] - 1 - pos[None, :], pos[None, :])
    segs_rev = jnp.take_along_axis(segs, ridx, axis=1)
    both = jnp.stack([segs, segs_rev]).reshape(-1)  # (2*S*N,)
    li = jnp.arange(W, dtype=jnp.int32)[None, :]
    lsub = li % sub
    in_a = li < sub

    def vec(arr):  # (2*rows_p,) -> (rows_p, W) A/B-selected
        ab = arr.reshape(rows_p, 2)
        return jnp.where(in_a, ab[:, 0:1], ab[:, 1:2])

    base_v = vec(base)
    dirn_v = vec(dirn)
    scan_v = vec(scan_idx)
    seg_v = vec(seg_idx)
    rlen_v = vec(rlens)
    p = jnp.clip(base_v + dirn_v * lsub, 0, N - 1)
    segsel = jnp.where(is_tr[scan_v], 1, 0).astype(jnp.int32)
    byte = both[(segsel * S + seg_v) * N + p]
    code = lut_s[scan_v, byte.astype(jnp.int32)]
    code = jnp.where(lsub < rlen_v, code.astype(jnp.int32),
                     4).astype(jnp.uint8)
    R = 256
    G = rows_p // R
    ab_om = offs.reshape(rows_p, 2)
    ab_mr = mreals.reshape(rows_p, 2)
    rmeta = jnp.zeros((rows_p, 128), jnp.int32)
    rmeta = (rmeta.at[:, 0].set(ab_om[:, 0]).at[:, 1].set(ab_mr[:, 0])
             .at[:, 3].set(ab_om[:, 1]).at[:, 4].set(ab_mr[:, 1]))
    mk = _window_call(code.reshape(G, R, W),
                      rmeta.reshape(G, R, 128), qcodes, m=m, subw=sub,
                      interpret=interpret)
    mx, mrow = _decode_key(mk.reshape(n2, sub))
    return _ends_from_stats(mx, mrow, terms, rlens, m)


def window_stats_to_ends(mx: np.ndarray, mrow: np.ndarray,
                         terms: np.ndarray, rlens: np.ndarray,
                         m: int) -> np.ndarray:
    """Per-lane (column max, first attaining row) stats -> the scan-order
    pass outputs (best, end_col, end_row) int32[rows, 3], with the
    reverse pass's terminate semantics: the first lane whose column max
    equals terms[r] is the break column — it still updates, later lanes
    do not (sswNew.cpp:617; golden model kernels/align.py:_sw_end_pass).
    """
    rows, Wp = mx.shape
    lane = np.arange(Wp)
    valid = lane[None, :] < rlens[:, None]
    eqt = valid & (mx == terms[:, None]) & (terms[:, None] >= 0)
    has = eqt.any(axis=1)
    bcol = np.argmax(eqt, axis=1)
    limit = np.where(has, bcol, Wp - 1)
    pref = valid & (lane[None, :] <= limit[:, None])
    mxv = np.where(pref, mx, 0)
    best = mxv.max(axis=1, initial=0)
    ecol = np.argmax(mxv == best[:, None], axis=1)  # first attainment
    erow = mrow[np.arange(rows), ecol]
    none = best <= 0
    out = np.stack([best, np.where(none, -1, ecol),
                    np.where(none, m - 1, erow)], axis=-1)
    return np.ascontiguousarray(out, np.int32)


# per-lane stats key packing: key = colmax << _KT_BITS | (t-field), with
# t-field = _KT_MASK - first_row.  max(key) == (max colmax, EARLIEST row
# attaining it) in one op.  colmax <= 5*W = 1280 < 2^11 and the row field
# holds queries up to 2^20 (MAX_LNCRNA = 1e6, stats.h:26), so the key
# fits int32 with room to spare.
_KT_BITS = 20
_KT_MASK = (1 << _KT_BITS) - 1
def _window_kernel(qc_ref, codes_ref, rmeta_ref, omk_ref, h_ref, e_ref,
                   *, m: int, nq: int, subw: int = 0, unroll: int = 1):
    """Transposed window DP: the window sits on the 256-lane axis, the
    shared query streams through the grid in 128-row chunks.

    Per query row t the update is one (R, W) vector step; the per-lane
    running stats key (column max, first row attaining it — see _KT_BITS)
    replaces the original orientation's per-column cross-lane reductions
    (7x less state, no VMEM-spilling (R, Mp) temporaries).  end_col /
    end_read / terminate are recovered on host from the per-lane stats:

      * end_col = first lane attaining the global max — identical to the
        scan-order "last strict improvement" because a running max first
        attains its final value exactly there;
      * first-attainment row per lane == the lowest query row with
        H == column max (the striped kernel's min-scan);
      * the terminate break = first lane whose column max equals it,
        with columns after it excluded — a host prefix mask.

    rmeta lanes: 0 = offset (first real query row; rows below have zero
    profile — reversed-prefix queries), 1 = mreal (exclusive row bound of
    the stats update = m + phantom rows of the emulated byte/word pass).
    With subw = W/2 each kernel row holds TWO independent windows (lanes
    [0, subw) and [subw, W)): every lane-index mask switches to
    lidx % subw so the DP, gap prefix and diagonal never cross the half
    boundary, and the B window's offset/mreal live in rmeta lanes 3..4.
    """
    R = codes_ref.shape[1]
    W = codes_ref.shape[2]
    if subw <= 0:
        subw = W
    go = jnp.int32(GAP_OPEN)
    ge = jnp.int32(GAP_EXTEND)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        e_ref[:] = jnp.zeros_like(e_ref)
        omk_ref[0] = jnp.full_like(omk_ref[0], _KT_MASK - (m - 1))

    lidx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    lmod = lidx % subw if subw != W else lidx
    foff = go + (lmod - 1) * ge
    neg = jnp.int32(-(2 ** 30))
    codes = codes_ref[0].astype(jnp.int32)  # (R, W)
    mt = rmeta_ref[0]
    if subw != W:
        in_a = lidx < subw
        off = jnp.where(in_a, mt[:, 0:1],
                        pltpu.roll(mt, shift=_CHUNK - 3, axis=1)[:, 0:1])
        mreal = jnp.where(
            in_a, pltpu.roll(mt, shift=_CHUNK - 1, axis=1)[:, 0:1],
            pltpu.roll(mt, shift=_CHUNK - 4, axis=1)[:, 0:1])
    else:
        off = mt[:, 0:1]
        mreal = pltpu.roll(mt, shift=_CHUNK - 1, axis=1)[:, 0:1]
    fbias = lmod * ge
    base = pl.program_id(1) * _CHUNK
    five = jnp.int32(5)
    neg4 = jnp.int32(-4)
    zero = jnp.int32(0)

    def col(j, carry):
        qchunk, mk = carry
        t = base + j
        qt = qchunk[:, 0:1]  # (R, 1) current query code
        # SSW matrix: +5 iff both real bases and equal, else -4 (N never
        # matches, ssw_cpp.cpp kBaseTranslation + Aligner defaults)
        s = jnp.where((codes == qt) & (qt < 4), five, neg4)
        live = (t >= off) & (t < m)  # real query row for this row/half
        s = jnp.where(live, s, zero)  # zero profile: offset + phantom rows
        hp = h_ref[:]
        ep = e_ref[:]
        ev = jnp.maximum(ep - ge, hp - go)
        diag = jnp.where(lmod >= 1, pltpu.roll(hp, shift=1, axis=1), zero)
        tmp = jnp.maximum(jnp.maximum(diag + s, ev), zero)
        # full-width prefix max: each step must mask the cyclic wrap
        # (lanes < k past a window boundary) to zero — a per-row pad-lane
        # poison does NOT work here, because the chain itself propagates
        # real values through the pad region (every lane above rlen is
        # contaminated after log2(W) steps), unlike the scan kernel
        # whose 64-lane window stays clear of its >= 64 poisoned pads
        run = tmp + fbias
        k = 1
        while k < subw:
            run = jnp.maximum(
                run, jnp.where(lmod >= k,
                               pltpu.roll(run, shift=k, axis=1), zero))
            k *= 2
        fv = jnp.where(lmod >= 1, pltpu.roll(run, shift=1, axis=1),
                       neg) - foff
        hn = jnp.maximum(tmp, fv)
        h_ref[:] = hn
        e_ref[:] = ev
        key = (hn << _KT_BITS) + (_KT_MASK - t)
        mk = jnp.maximum(mk, jnp.where(t < mreal, key, zero))
        qchunk = pltpu.roll(qchunk, shift=_CHUNK - 1, axis=1)
        return qchunk, mk

    # sublane-broadcast the query chunk to all R rows once per grid step
    # (Mosaic cannot broadcast sublanes and lanes in a single op)
    qchunk0 = jnp.broadcast_to(qc_ref[0, 0:1, :], (R, _CHUNK))
    qchunk0 = qchunk0.astype(jnp.int32)
    _, mk = jax.lax.fori_loop(0, _CHUNK, col, (qchunk0, omk_ref[0]),
                              unroll=unroll)
    omk_ref[0] = mk


def _decode_key(mk):
    """Stats key -> (column max, first attaining row); works on jnp/np."""
    return mk >> _KT_BITS, _KT_MASK - (mk & _KT_MASK)


# --- candidate-window pass, v2: scan-orientation kernel ---------------------
#
# The v1 window kernel (below) transposes the DP: windows on lanes, query
# streamed on the grid.  Measured on hardware it runs ~1 vector
# instruction/cycle like the scan kernel but needs ~41 ops per cell —
# per-row (R, 1) mask ops, a masked full-width gap prefix (3 ops/step),
# and select-by-index emission all on the critical per-query-row path.
#
# The v2 kernel puts windows on SUBLANES and the query on LANES — the
# scan kernel's own layout — and streams the (<= 256) window columns
# through the inner loop instead of the (~1.6-23k) query rows:
#
#   * all per-row masks (off/mreal phantom semantics) become (R, Mp)
#     registers built ONCE per grid step, not per inner iteration;
#   * the gap prefix along lanes is the query-direction gap, which gets
#     the scan kernel's unmasked sentinel form (2 ops/step): window cells
#     are bounded by 5*wcols <= 980, so an F contribution can beat
#     tmp >= 0 only within (980-16)/4 + 1 = 242 lanes — a 256-lane
#     windowed prefix is exact, and per-class tighter (5*64 = 320 ->
#     77 -> a 128-lane window for the dominant narrow class);
#   * the per-window-column (column max, first attaining query row)
#     stats drop out of one lane reduce of the same packed key, so the
#     host-side ends reduction (window_stats_to_ends) is unchanged.
#
# Exactness: the DP matrix is orientation-independent (affine-gap SW with
# symmetric go/ge); the stats key reduce picks (max H, lowest query
# index) exactly like v1's per-lane running key.  Dead lanes (>= mreal)
# get key = (H << 20) - 2^30 < 0 because H <= 980 < 1024, so they can
# never beat a live lane's key >= 0.
#
# Emulates the per-candidate forward/reverse striped passes
# (sswNew.cpp:1446-1547); see scan/candidates.py for the offs/mreal
# contract.

# class width -> (inner-loop column count, gap-prefix window): the prefix
# window must cover (5*wcols - GAP_OPEN)/GAP_EXTEND + 1 lanes (a cell is
# bounded by 5*wcols, so narrow classes also get a shallower prefix and a
# smaller sentinel pad).  Finer classes cut padded inner-loop columns:
# the Iden-sweep's later rounds are <= 41 wide and round 0 is 46-70, so
# 48/64/96 splits the hot range instead of padding everything to 64/128.
_WCLASSES = {48: (48, 64), 64: (64, 128), 96: (96, 128),
             128: (128, 256), _WWIN: (_WWIN, 256)}

# row-batches (of R rows) per kernel call: one fixed Mosaic program per
# class; bigger dispatches loop over it (see _wspecs_call)
_WCG = 16

# two window columns per loop iteration — measured neutral on v5e
# (35.4 -> 34.8 ms, within noise); opt-in for future targets
_WSTEP2 = os.environ.get("FASIM_WIN_STEP2", "0") == "1"


def _wscan_kernel(qrow_ref, codes_ref, rmeta_ref, out_ref, h_ref, e_ref,
                  *, m: int, sstart: int, fwin: int, wcols: int,
                  uniform: bool = False, step2: bool = False):
    """One (row-batch g, 128-column chunk) grid step of the v2 window
    pass.  qrow: int32[1, Mp] query codes (pad lanes 127); codes block
    (1, R, 128) uint8 window columns; rmeta block (1, R, 128) with lane
    0 = off (first real query lane; lanes below have zero profile) and
    lane 1 = mreal (exclusive stats lane bound = m + phantom rows of the
    emulated byte/word pass).  Emits int32 stats keys per (row, window
    column); _decode_key yields (column max, first attaining query row).

    `uniform` (static): every row has off == 0 and mreal == m16 — true
    for ALL forward-pass dispatches — so the profile/stats masks are
    (1, Mp) rows instead of (R, Mp) materializations.  `step2` (static):
    process two window columns per loop iteration (halves the loop
    bookkeeping; same op stream otherwise).
    """
    R, Mp = h_ref.shape
    go = jnp.int32(GAP_OPEN)
    ge = jnp.int32(GAP_EXTEND)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        e_ref[:] = jnp.zeros_like(e_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    q = qrow_ref[0:1, :]
    if uniform:
        live = iota < m
        m16 = _round_up(m, 16)
        kmask = jnp.where(iota < m16, _KT_MASK - iota, _NEG)
    else:
        mt = rmeta_ref[0]
        off = mt[:, 0:1]
        mreal = pltpu.roll(mt, shift=_CHUNK - 1, axis=1)[:, 0:1]
        live = (iota >= off) & (iota < m)
        kmask = jnp.where(iota < mreal, _KT_MASK - iota, _NEG)
    # profile/stats masks, hoisted out of the column loop
    hi = jnp.where(live & (q < 4), jnp.int32(5),
                   jnp.where(live, jnp.int32(-4), 0))
    lo = jnp.where(live, jnp.int32(-4), 0)
    fbias = jnp.where(iota < sstart, iota * ge, _NEG)
    foff = go + (iota - 1) * ge
    idx1 = iota >= 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _CHUNK), 1)

    full_steps = max(1, fwin.bit_length() - 1)  # fwin is a power of two

    def one(j, chunk, cmacc, nsteps=full_steps):
        code = chunk[:, 0:1]
        s = jnp.where(code == q, hi, lo)
        hp = h_ref[:]
        ep = e_ref[:]
        ev = jnp.maximum(ep - ge, hp - go)
        diag = jnp.where(idx1, pltpu.roll(hp, shift=1, axis=1), 0)
        tmp = jnp.maximum(jnp.maximum(diag + s, ev), 0)
        if nsteps > 0:
            run = tmp + fbias
            k = 1
            for _ in range(nsteps):
                run = jnp.maximum(run, pltpu.roll(run, shift=k, axis=1))
                k *= 2
            fv = pltpu.roll(run, shift=1, axis=1) - foff
            hn = jnp.maximum(tmp, fv)
        else:
            hn = tmp
        h_ref[:] = hn
        e_ref[:] = ev
        key = jnp.max((hn << _KT_BITS) + kmask, axis=1, keepdims=True)
        cmacc = jnp.where(lane == j, key, cmacc)
        chunk = pltpu.roll(chunk, shift=_CHUNK - 1, axis=1)
        return chunk, cmacc

    nloop = min(wcols, _CHUNK)
    ck = codes_ref[0].astype(jnp.int32)
    cmacc0 = jnp.zeros((R, _CHUNK), jnp.int32)
    if step2:
        def col(j2, carry):
            chunk, cmacc = carry
            chunk, cmacc = one(2 * j2, chunk, cmacc)
            chunk, cmacc = one(2 * j2 + 1, chunk, cmacc)
            return chunk, cmacc

        _, cmacc = jax.lax.fori_loop(0, nloop // 2, col, (ck, cmacc0),
                                     unroll=1)
    elif wcols <= _CHUNK:
        # single-chunk classes get the column-phased prefix depth (see
        # _fwd_phases: H <= 5*(j+1) bounds the needed coverage; valid
        # for ANY window DP of this scoring scheme, fwd or rev)
        carry = (ck, cmacc0)
        for lo_, hi_, ns in _fwd_phases(wcols):
            def col(j, carry, base=lo_, ns=ns):
                chunk, cmacc = carry
                return one(jnp.int32(base) + j, chunk, cmacc, ns)

            carry = jax.lax.fori_loop(0, hi_ - lo_, col, carry, unroll=1)
        _, cmacc = carry
    else:
        def col(j, carry):
            return one(j, *carry)

        _, cmacc = jax.lax.fori_loop(0, nloop, col, (ck, cmacc0),
                                     unroll=1)
    out_ref[0] = cmacc


@functools.partial(jax.jit,
                   static_argnames=("m", "sstart", "fwin", "wcols",
                                    "uniform", "step2", "interpret"))
def _wscan_call(codes, rmeta, qrow, *, m: int, sstart: int, fwin: int,
                wcols: int, uniform: bool = False, step2: bool = False,
                interpret: bool = False):
    """codes uint8[G, R, Wp]; rmeta int32[G, R, 128]; qrow int32[1, Mp]
    -> stats keys int32[G, R, Wp] (columns >= wcols stay 0: decoded as
    colmax 0, masked off by the host ends reduction's rlens gate)."""
    G, R, Wp = codes.shape
    Mp = qrow.shape[1]
    nchunk = max(1, wcols // _CHUNK)
    kernel = functools.partial(
        _wscan_kernel, m=m, sstart=sstart, fwin=fwin, wcols=wcols,
        uniform=uniform, step2=step2)
    return pl.pallas_call(
        kernel,
        grid=(G, nchunk),
        in_specs=[
            pl.BlockSpec((1, Mp), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _CHUNK), lambda g, c: (g, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, _CHUNK), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, _CHUNK), lambda g, c: (g, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, R, Wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((R, Mp), jnp.int32),
            pltpu.VMEM((R, Mp), jnp.int32),
        ],
        # ~9 live (R, Mp) int32 arrays (H/E scratch + hoisted masks +
        # loop temporaries); raise scoped VMEM with the state size
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(112 * 2 ** 20,
                                 max(32 * 2 ** 20, 40 * R * Mp))),
        interpret=interpret,
    )(qrow, codes, rmeta)


@functools.partial(jax.jit,
                   static_argnames=("m", "sstart", "fwin", "wcols", "R",
                                    "uniform", "step2", "interpret"))
def _wspecs_call(segs, lengths, lut_s, is_tr, qrow, seg_idx, scan_idx,
                 base, dirn, rlens, offs, terms, mreals, *, m: int,
                 sstart: int, fwin: int, wcols: int, R: int,
                 uniform: bool = False, step2: bool = False,
                 interpret: bool = False):
    """Device-side window build + v2 pass + ends reduction in one
    program (the v2 analogue of _window_specs_call; the spec contract
    and output are identical — int32[rows, 3] (best, end_col,
    end_row)).  Spec arrays may arrive int16 (narrow upload path)."""
    seg_idx, scan_idx, base, dirn, rlens, offs, terms, mreals = (
        a.astype(jnp.int32) for a in (seg_idx, scan_idx, base, dirn,
                                      rlens, offs, terms, mreals))
    S, N = segs.shape
    rows = seg_idx.shape[0]
    Wp = max(_CHUNK, wcols)
    pos = jnp.arange(N, dtype=jnp.int32)
    ridx = jnp.where(pos[None, :] < lengths[:, None],
                     lengths[:, None] - 1 - pos[None, :], pos[None, :])
    segs_rev = jnp.take_along_axis(segs, ridx, axis=1)
    both = jnp.stack([segs, segs_rev]).reshape(-1)  # (2*S*N,)
    li = jnp.arange(Wp, dtype=jnp.int32)[None, :]
    p = jnp.clip(base[:, None] + dirn[:, None] * li, 0, N - 1)
    segsel = jnp.where(is_tr[scan_idx], 1, 0).astype(jnp.int32)
    byte = both[(segsel[:, None] * S + seg_idx[:, None]) * N + p]
    code = lut_s[scan_idx[:, None], byte.astype(jnp.int32)]
    code = jnp.where(li < rlens[:, None], code.astype(jnp.int32),
                     4).astype(jnp.uint8)
    rmeta = jnp.zeros((rows, 128), jnp.int32)
    rmeta = rmeta.at[:, 0].set(offs).at[:, 1].set(mreals)
    # fixed kernel-call shape (<= _WCG row-batches per call): larger
    # buckets loop over the same pallas_call signature, so the Mosaic
    # program (and its ~2 min remote compile) is shared across the whole
    # bucket ladder — only the cheap XLA wrapper compiles per bucket
    G_all = rows // R
    CG = min(_WCG, G_all)
    step = CG * R
    parts = []
    for lo in range(0, rows, step):
        parts.append(_wscan_call(
            code[lo:lo + step].reshape(CG, R, Wp),
            rmeta[lo:lo + step].reshape(CG, R, 128),
            qrow, m=m, sstart=sstart, fwin=fwin, wcols=wcols,
            uniform=uniform, step2=step2, interpret=interpret))
    mk = jnp.concatenate(parts, axis=0)
    mx, mrow = _decode_key(mk.reshape(rows, Wp))
    return _ends_from_stats(mx, mrow, terms, rlens, m)


# --- candidate-window pass, v3: forward-specialized per-lane kernel ---------
#
# Every PRODUCTION forward window dispatch is uniform: off == 0, mreal ==
# m16, terminate == -1, dirn == +1 (scan/candidates.py fwd_specs).  That
# admits two structural cuts over the v2 kernel, worth ~1.4x on the
# dominant pass of the MEG3 budget (fwd windows were 8.2 s of ~20.3 s
# serialized device time in round 4):
#
#   * **Per-lane stats instead of per-column stats.**  The fwd ends
#     reduction needs (best, first column attaining it, lowest query row
#     at that column).  v2 pays a full cross-lane reduce + select-emit
#     per window column to record per-column (colmax, first row); v3
#     instead accumulates per query LANE the key
#         key_i = max over columns j of (H(i, j) << 8 | (255 - j))
#     — 3 vector ops (shift, add, max) per column, no reduce — and
#     recovers the ends in an XLA epilogue: best = max_i H_i; end_col =
#     min col over lanes attaining best (a lane's recorded column is the
#     EARLIEST attaining its own max, so lanes attaining the global best
#     record exactly the earliest global column); end_row = lowest lane
#     with (H == best, col == end_col).  Equivalent to v2's reduction:
#     a lane attains best at end_col iff its max == best and its earliest
#     column == end_col (an earlier attainment would contradict end_col's
#     global minimality).  Pad window columns (>= rlen, code 4) can never
#     attain the max: every path through an all-mismatch column scores
#     strictly below its source cells, so no rlens gate is needed.
#
#   * **Column-phased gap-prefix depth.**  A path ending at window
#     column j (0-based) has <= j+1 diagonal steps, so H <= 5*min(j+1,
#     196) (cutlength <= 196, see WPAD) and the vertical-gap prefix max
#     at column j only needs to cover d lanes with 5*min(j+1, 196) -
#     GAP_OPEN - (d-1)*GAP_EXTEND > 0.  The column loop splits into
#     static phases of doubling prefix depth (1..8 steps) instead of
#     paying the class maximum on every column (~25% fewer prefix ops).
#
# Key fits easily: H <= 5*196 = 980 < 2^11, columns < 2^8 -> 19 bits.
# Emulates the forward end-finding pass (sswNew.cpp:1472-1505); the
# reverse pass (terminate semantics need per-column stats) stays on v2.


def _fwd_phases(wcols: int) -> tuple:
    """Static (start, stop, prefix_steps) column phases (see above);
    short phases merge into the following deeper one."""
    raw = []
    for j in range(wcols):
        b = 5 * min(j + 1, 196)
        cov = (b - GAP_OPEN) // GAP_EXTEND + 1
        s = 0
        while (1 << s) < cov:
            s += 1
        if raw and raw[-1][2] == s:
            raw[-1][1] = j + 1
        else:
            raw.append([j, j + 1, s])
    # forward-merge any span < 4 into its successor (more coverage than
    # needed is always exact)
    out: list[tuple] = []
    pending_start = None
    for i, (lo_, hi_, s) in enumerate(raw):
        start = lo_ if pending_start is None else pending_start
        if hi_ - start < 4 and i + 1 < len(raw):
            pending_start = start
            continue
        out.append((start, hi_, s))
        pending_start = None
    return tuple(out)


def _wfwd_kernel(qp_ref, codes_ref, out_ref, h_ref, e_ref, k_ref, *,
                 wcols: int, phases: tuple):
    """One row-batch of the fwd window pass.  qp rows: [q codes (pad
    127), hi, lo, fbias-with-sentinel]; codes (1, R, Wp) uint8 window
    columns (roll-carried, no 128-column grid chunking — wcols <= 256);
    out (1, R, Mp) per-lane stats keys."""
    R, Mp = h_ref.shape
    Wp = codes_ref.shape[2]
    go = jnp.int32(GAP_OPEN)
    ge = jnp.int32(GAP_EXTEND)
    h_ref[:] = jnp.zeros_like(h_ref)
    e_ref[:] = jnp.zeros_like(e_ref)
    k_ref[:] = jnp.zeros_like(k_ref)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    q = qp_ref[0:1, :]
    hi = qp_ref[1:2, :]
    lo = qp_ref[2:3, :]
    fbias = qp_ref[3:4, :]
    foff = go + (iota - 1) * ge
    idx1 = iota >= 1

    def mkcol(base: int, nsteps: int):
        def col(jj, chunk):
            code = chunk[:, 0:1]
            s = jnp.where(code == q, hi, lo)
            hp = h_ref[:]
            ep = e_ref[:]
            ev = jnp.maximum(ep - ge, hp - go)
            diag = jnp.where(idx1, pltpu.roll(hp, shift=1, axis=1), 0)
            tmp = jnp.maximum(jnp.maximum(diag + s, ev), 0)
            if nsteps > 0:
                run = tmp + fbias
                k = 1
                for _ in range(nsteps):
                    run = jnp.maximum(run,
                                      pltpu.roll(run, shift=k, axis=1))
                    k *= 2
                fv = pltpu.roll(run, shift=1, axis=1) - foff
                hn = jnp.maximum(tmp, fv)
            else:
                hn = tmp  # H <= 5*(j+1) < go + ge: F can't beat 0 yet
            h_ref[:] = hn
            e_ref[:] = ev
            cj = jnp.int32(255) - (jnp.int32(base) + jj)
            k_ref[:] = jnp.maximum(k_ref[:], (hn << 8) + cj)
            return pltpu.roll(chunk, shift=Wp - 1, axis=1)

        return col

    chunk = codes_ref[0].astype(jnp.int32)
    for lo_, hi_, ns in phases:
        chunk = jax.lax.fori_loop(0, hi_ - lo_, mkcol(lo_, ns), chunk)
    out_ref[0] = k_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("wcols", "fwin", "interpret"))
def _wfwd_call(codes, qp, *, wcols: int, fwin: int,
               interpret: bool = False):
    """codes uint8[G, R, Wp]; qp int32[4, Mp] -> keys int32[G, R, Mp]."""
    G, R, Wp = codes.shape
    Mp = qp.shape[1]
    kernel = functools.partial(_wfwd_kernel, wcols=wcols,
                               phases=_fwd_phases(wcols))
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((4, Mp), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, Wp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, Mp), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, R, Mp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((R, Mp), jnp.int32),
            pltpu.VMEM((R, Mp), jnp.int32),
            pltpu.VMEM((R, Mp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(112 * 2 ** 20,
                                 max(32 * 2 ** 20, 48 * R * Mp))),
        interpret=interpret,
    )(qp, codes)


def _ends_from_lane_keys(keys, m: int, m16: int):
    """Per-lane fwd stats keys (rows, Mp) -> (best, end_col, end_row)
    int32[rows, 3]; see the v3 module comment for the equivalence
    argument."""
    Mp = keys.shape[1]
    lanes = jnp.arange(Mp, dtype=jnp.int32)[None, :]
    h = keys >> 8
    col = jnp.int32(255) - (keys & jnp.int32(255))
    hv = jnp.where(lanes < m16, h, -1)
    best = hv.max(axis=1)
    big = jnp.int32(1 << 30)
    atb = hv == best[:, None]
    ecol = jnp.where(atb, col, big).min(axis=1)
    erow = jnp.where(atb & (col == ecol[:, None]), lanes, big).min(axis=1)
    none = best <= 0
    return jnp.stack([best, jnp.where(none, -1, ecol),
                      jnp.where(none, m - 1, erow)], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("m", "m16", "wcols", "fwin", "R",
                                    "interpret"))
def _wspecs_fwd_call(segs, lengths, lut_s, is_tr, qp, seg_idx, scan_idx,
                     base, rlens, *, m: int, m16: int, wcols: int,
                     fwin: int, R: int, interpret: bool = False):
    """Device-side window build + v3 fwd pass + ends epilogue (the
    forward-specialized analogue of _wspecs_call; output contract
    identical: int32[rows, 3] (best, end_col, end_row)).  Spec arrays
    may arrive int16 (narrow upload path)."""
    seg_idx = seg_idx.astype(jnp.int32)
    scan_idx = scan_idx.astype(jnp.int32)
    base = base.astype(jnp.int32)
    rlens = rlens.astype(jnp.int32)
    S, N = segs.shape
    rows = seg_idx.shape[0]
    Wp = max(_CHUNK, wcols)
    pos = jnp.arange(N, dtype=jnp.int32)
    ridx = jnp.where(pos[None, :] < lengths[:, None],
                     lengths[:, None] - 1 - pos[None, :], pos[None, :])
    segs_rev = jnp.take_along_axis(segs, ridx, axis=1)
    both = jnp.stack([segs, segs_rev]).reshape(-1)
    li = jnp.arange(Wp, dtype=jnp.int32)[None, :]
    p = jnp.clip(base[:, None] + li, 0, N - 1)  # dirn == +1 always
    segsel = jnp.where(is_tr[scan_idx], 1, 0).astype(jnp.int32)
    byte = both[(segsel[:, None] * S + seg_idx[:, None]) * N + p]
    code = lut_s[scan_idx[:, None], byte.astype(jnp.int32)]
    code = jnp.where(li < rlens[:, None], code.astype(jnp.int32),
                     4).astype(jnp.uint8)
    G_all = rows // R
    CG = min(_WCG, G_all)
    step = CG * R
    parts = []
    for lo in range(0, rows, step):
        keys = _wfwd_call(code[lo:lo + step].reshape(CG, R, Wp), qp,
                          wcols=wcols, fwin=fwin, interpret=interpret)
        parts.append(_ends_from_lane_keys(keys.reshape(step, -1), m, m16))
    return jnp.concatenate(parts, axis=0)


@functools.partial(jax.jit, static_argnames=("m", "subw", "interpret"))
def _window_call(codes, rmeta, qcodes, *, m: int, subw: int = 0,
                 interpret: bool = False):
    """codes uint8[G, R, W]; rmeta int32[G, R, 128] (lanes 0..1 = offset,
    mreal of window A; 3..4 = of window B when subw packs two windows
    per row); qcodes int[NQ, 8, 128] query codes (8x sublane-replicated,
    pad codes < 0) -> stats keys int32[G, R, W] (_decode_key yields the
    per-lane column max + first attaining row)."""
    G, R, W = codes.shape
    nq = qcodes.shape[0]
    kernel = functools.partial(
        _window_kernel, m=m, nq=nq, subw=subw,
        unroll=int(os.environ.get("FASIM_WIN_UNROLL", "1")))
    return pl.pallas_call(
        kernel,
        grid=(G, nq),
        in_specs=[
            pl.BlockSpec((1, 8, _CHUNK), lambda g, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, W), lambda g, c: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, R, W), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((R, W), jnp.int32),
            pltpu.VMEM((R, W), jnp.int32),
        ],
        interpret=interpret,
    )(qcodes, codes, rmeta)


def apply_byte_break(colmax: np.ndarray) -> np.ndarray:
    """Post-op equivalent of the byte kernel's break-at-saturation
    (sswNew.cpp:384-386): zero the first column whose max reaches 251 and
    everything after it.  Works on [..., N]."""
    sat = colmax >= BYTE_SAT
    # first saturated column per row (N if none)
    first = np.where(sat.any(axis=-1), sat.argmax(axis=-1), colmax.shape[-1])
    pos = np.arange(colmax.shape[-1])
    return np.where(pos < first[..., None], colmax, 0).astype(np.int32)
