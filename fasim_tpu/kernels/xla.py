"""Portable pure-XLA engine for the hot Smith-Waterman passes.

Same contract and exact same int32 results as the Pallas kernel in
`tpu.py` (and the NumPy golden in `batch_np.py`), expressed with
`lax.scan` over reference columns and `lax.associative_scan` for the
vertical-gap prefix max.  It compiles on every JAX backend, which makes it

  * the CI target on CPU (Pallas interpret mode is slow and can wedge on
    the host platform),
  * the engine under the virtual-device mesh in `dist/` (multi-chip
    sharding dry-runs shard the segment axis of exactly this function),
  * a correct fallback wherever Mosaic is unavailable.

The math mirrors `batch_np.numpy_engine` (see `ref.py` for the exactness
argument vs the reference SSE2 kernels, stats.h:495-734 and
sswNew.cpp:255-464): affine-gap SW, gap open 16 / extend 4, per-column
maxima over the query axis including the striped byte kernel's phantom
rows (< m16), byte-break applied as a post-op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GAP_EXTEND, GAP_OPEN
from ..rules import SSW_ENC, SSW_MAT, THRESH_ENC, THRESH_MAT
from .tpu import _PURE, _PURE_OR_PAD, apply_byte_break

_NEG = -(2 ** 30)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("m16",))
def colmax_xla(codes: jax.Array, matq: jax.Array, *, m16: int) -> jax.Array:
    """codes: int32[S, T, N] (pad rows score 0); matq: int32[C, Mp]
    query profile.  Returns exact int32[S, T, N] column maxima."""
    S, T, N = codes.shape
    Mp = matq.shape[1]
    go = jnp.int32(GAP_OPEN)
    ge = jnp.int32(GAP_EXTEND)
    idx = jnp.arange(Mp, dtype=jnp.int32)
    fbias = idx * ge
    foff = go + (idx - 1) * ge
    real_row = idx < m16

    def step(carry, code_col):
        H, E = carry  # (S, T, Mp)
        s_col = matq[code_col]  # (S, T, Mp)
        E = jnp.maximum(E - ge, H - go)
        diag = jnp.pad(H[..., :-1], ((0, 0), (0, 0), (1, 0)))
        tmp = jnp.maximum(jnp.maximum(diag + s_col, E), 0)
        run = jax.lax.associative_scan(jnp.maximum, tmp + fbias, axis=-1)
        F = jnp.pad(run[..., :-1], ((0, 0), (0, 0), (1, 0)),
                    constant_values=_NEG) - foff
        H = jnp.maximum(tmp, F)
        cm = jnp.max(jnp.where(real_row, H, 0), axis=-1)  # (S, T)
        return (H, E), cm

    init = (jnp.zeros((S, T, Mp), jnp.int32), jnp.zeros((S, T, Mp), jnp.int32))
    _, cms = jax.lax.scan(step, init, jnp.moveaxis(codes, -1, 0))
    return jnp.moveaxis(cms, 0, -1)


class XlaScanEngine:
    """numpy_engine-contract engine running as one jitted XLA program."""

    def __init__(self, rna: np.ndarray, device=None):
        # device pins this engine to one local device (see TpuScanEngine)
        self._put = (jnp.asarray if device is None
                     else functools.partial(jax.device_put, device=device))
        m = len(rna)
        self.m16 = _round_up(m, 16)
        mp = self.m16  # no lane-alignment constraint outside Pallas

        def make_matq(enc, mat):
            q = enc[rna]
            mq = np.zeros((mat.shape[1] + 1, mp), np.int32)
            mq[:-1, :m] = mat[q].T  # phantom rows and the pad code score 0
            return self._put(mq)

        self.matq_ssw = make_matq(SSW_ENC, SSW_MAT)
        self.matq_thresh = make_matq(THRESH_ENC, THRESH_MAT)
        self.query_pure = bool(_PURE[rna].all())
        self._scan_luts = None

    def setup_scans(self, scans: list[dict]) -> None:
        """Same composed-LUT contract as TpuScanEngine.setup_scans."""
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
        self._scan_luts = (lut_s, lut_t, is_tr)

    def scan_segments(self, segs: np.ndarray, lengths: np.ndarray,
                      full_prefix: bool = False):
        """CPU/XLA equivalent of TpuScanEngine.scan_segments: builds the
        transform codes with the same reversal-index semantics, runs the
        exact XLA kernel, returns (thresh int32[S, T], colmax uint8[S, T,
        N] clamped at 255).  Always exact — full_prefix is accepted for
        interface parity."""
        lut_s, lut_t, is_tr = self._scan_luts
        S, N = segs.shape
        pos = np.arange(N)
        ridx = np.where(pos[None, :] < lengths[:, None],
                        lengths[:, None] - 1 - pos[None, :], pos[None, :])
        seg_rev = np.take_along_axis(segs, ridx, axis=1)
        sel = np.where(is_tr[None, :, None], seg_rev[:, None, :],
                       segs[:, None, :])
        codes_s = np.take_along_axis(
            lut_s[None, :, :], sel.astype(np.int64), axis=2).astype(np.int32)
        cm = self.colmax_batch(codes_s, "ssw")
        if self.query_pure and bool(_PURE_OR_PAD[segs].all()):
            # fused threshold (see tpu._device_scan): for pure-ACGT input
            # the two engines run the identical DP, so the exact threshold
            # is the scan pass's int32 column-max reduced over columns
            thresh = cm.max(axis=-1).astype(np.int32)
        else:
            codes_t = np.take_along_axis(
                lut_t[None, :, :], sel.astype(np.int64),
                axis=2).astype(np.int32)
            thresh = self.max_batch(codes_t, "thresh")
        return thresh, np.minimum(cm, 255).astype(np.uint8)

    def colmax_batch(self, codes: np.ndarray, which: str) -> np.ndarray:
        matq = self.matq_ssw if which == "ssw" else self.matq_thresh
        out = colmax_xla(self._put(np.asarray(codes, np.int32)), matq,
                         m16=self.m16)
        return np.asarray(jax.device_get(out))

    def max_batch(self, codes: np.ndarray, which: str) -> np.ndarray:
        """Exact global SW max int32[S, T] (the XLA colmax is exact for
        every column — full-length prefix scan, no escalation needed)."""
        return self.colmax_batch(codes, which).max(axis=-1).astype(np.int32)

    def __call__(self, rna: np.ndarray, seq2_list: list[np.ndarray]
                 ) -> tuple[np.ndarray, np.ndarray]:
        seq2 = np.stack(seq2_list)
        thresh_cm = self.colmax_batch(
            THRESH_ENC[seq2].astype(np.int32)[None], "thresh")[0]
        scan_cm = self.colmax_batch(
            SSW_ENC[seq2].astype(np.int32)[None], "ssw")[0]
        thresh = thresh_cm.max(axis=1).astype(np.int32)
        return thresh, apply_byte_break(scan_cm)
