"""Device window-pass vs the oracle-verified golden striped-pass model.

The golden model is kernels.align._sw_end_pass (differential-tested
against the instrumented reference in tests/test_kernels_ref.py); the
device pass must reproduce (best, end_col, end_row) for both the forward
(no terminate) and reverse (terminate + lanes-dependent phantom rows)
configurations, and the full align chain built on the device pass must
reproduce align_window_py bit-for-bit.
"""

import numpy as np
import pytest

from fasim_tpu import rules
from fasim_tpu.config import BYTE_SAT, GAP_EXTEND, GAP_OPEN
from fasim_tpu.kernels import align as kalign
from fasim_tpu.kernels.xla import XlaScanEngine, _window_qp, window_pass_xla


def _rand_codes(rng, n):
    return rng.integers(0, 5, n).astype(np.int32)  # SSW alphabet incl. N


def _ru(x, m):
    return (x + m - 1) // m * m


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_forward_pass_lane_independent(rng):
    """Forward outputs are identical for byte (16) and word (8) phantom
    layouts — the argument that lets the device pass skip escalation."""
    for m, w in [(37, 50), (64, 33), (201, 197)]:
        q = _rand_codes(rng, m)
        ref = _rand_codes(rng, w)
        b16 = kalign._sw_end_pass(q, ref, GAP_OPEN, GAP_EXTEND,
                                  rules.SSW_MAT, 16, False, None)
        b8 = kalign._sw_end_pass(q, ref, GAP_OPEN, GAP_EXTEND,
                                 rules.SSW_MAT, 8, False, None)
        assert b16 == b8


def test_window_pass_forward(rng):
    m = 173
    rna = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, m)]
    eng = XlaScanEngine(rna)
    eng.setup_windows(rna)
    R, W = 24, 64
    codes = np.empty((R, W), np.uint8)
    rlens = rng.integers(5, W + 1, R).astype(np.int32)
    for r in range(R):
        codes[r] = 4
        codes[r, :rlens[r]] = _rand_codes(rng, rlens[r])
    offs = np.zeros(R, np.int32)
    terms = np.full(R, -1, np.int32)
    mreals = np.full(R, _ru(m, 16), np.int32)
    out = np.asarray(eng.window_pass(codes, offs, terms, rlens, mreals,
                                     rev=False))
    q_idx = rules.SSW_ENC[rna]
    for r in range(R):
        best, ecol, erow, _ = kalign._sw_end_pass(
            q_idx, codes[r, :rlens[r]].astype(np.int64), GAP_OPEN,
            GAP_EXTEND, rules.SSW_MAT, 16, False, None)
        assert (int(out[r, 0]), int(out[r, 1])) == (best, ecol), r
        if best > 0:
            assert int(out[r, 2]) == erow, r


def test_window_pass_reverse_terminate(rng):
    """Reverse pass: offset rows, terminate break, per-row phantom bound."""
    m = 97
    rna = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, m)]
    eng = XlaScanEngine(rna)
    eng.setup_windows(rna)
    q_idx = rules.SSW_ENC[rna]
    cases = []
    for _ in range(24):
        w = int(rng.integers(8, 80))
        ref = _rand_codes(rng, w)
        # forward align to get a realistic (end_read, end_ref, best)
        best, ecol, erow, _ = kalign._sw_end_pass(
            q_idx, ref, GAP_OPEN, GAP_EXTEND, rules.SSW_MAT, 16, False,
            None)
        if best == 0:
            continue
        cases.append((ref, best, ecol, erow))
    assert cases
    R = len(cases)
    W = 80
    codes = np.full((R, W), 4, np.uint8)
    offs = np.empty(R, np.int32)
    terms = np.empty(R, np.int32)
    rlens = np.empty(R, np.int32)
    mreals = np.empty(R, np.int32)
    for lanes in (16, 8):
        for r, (ref, best, ecol, erow) in enumerate(cases):
            rev_ref = ref[ecol::-1]
            rlens[r] = len(rev_ref)
            codes[r, :len(rev_ref)] = rev_ref
            offs[r] = m - 1 - erow
            terms[r] = best
            mr = erow + 1  # reverse-query length
            mreals[r] = m + (-mr) % lanes
        out = np.asarray(eng.window_pass(codes, offs, terms, rlens, mreals,
                                         rev=True))
        for r, (ref, best, ecol, erow) in enumerate(cases):
            rev_q = q_idx[erow::-1]
            rb, rc, rr, _ = kalign._sw_end_pass(
                rev_q, ref[ecol::-1].astype(np.int64), GAP_OPEN, GAP_EXTEND,
                rules.SSW_MAT, lanes, False, best)
            assert int(out[r, 0]) == rb, (lanes, r)
            assert int(out[r, 1]) == rc, (lanes, r)
            assert int(out[r, 2]) - int(offs[r]) == rr, (lanes, r)


def test_pallas_window_kernel_matches_xla(rng):
    """Pallas window kernel (interpret mode) == XLA window pass, forward
    and reverse configurations."""
    from fasim_tpu.kernels.tpu import TpuScanEngine

    m = 143
    rna = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, m)]
    xla = XlaScanEngine(rna)
    xla.setup_windows(rna)
    tpu = TpuScanEngine(rna, interpret=True)
    tpu.setup_windows(rna)
    tpu.win_rows = 8  # force multi-group packing
    R, W = 21, 128
    codes = rng.integers(0, 5, (R, W)).astype(np.uint8)
    rlens = rng.integers(4, W + 1, R).astype(np.int32)
    offs = rng.integers(0, m // 2, R).astype(np.int32)
    terms = np.where(rng.random(R) < 0.5, -1,
                     rng.integers(5, 60, R)).astype(np.int32)
    mreals = (m + rng.integers(0, 16, R)).astype(np.int32)
    for rev in (False, True):
        a = np.asarray(xla.window_pass(codes, offs, terms, rlens, mreals,
                                       rev=rev))
        b = tpu.window_pass(codes, offs, terms, rlens, mreals, rev=rev)
        np.testing.assert_array_equal(a, b)


def test_pallas_window_kernel_v1_fallback(rng):
    """The v1 transposed kernel (FASIM_WIN_V1 fallback) stays exact."""
    from fasim_tpu.kernels.tpu import TpuScanEngine

    m = 143
    rna = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, m)]
    xla = XlaScanEngine(rna)
    xla.setup_windows(rna)
    tpu = TpuScanEngine(rna, interpret=True)
    import os

    os.environ["FASIM_WIN_V1"] = "1"
    try:
        tpu.setup_windows(rna)
    finally:
        del os.environ["FASIM_WIN_V1"]
    assert not tpu.win_v2
    tpu.win_rows = 8
    R, W = 13, 128
    codes = rng.integers(0, 5, (R, W)).astype(np.uint8)
    rlens = rng.integers(4, W + 1, R).astype(np.int32)
    offs = rng.integers(0, m // 2, R).astype(np.int32)
    terms = np.where(rng.random(R) < 0.5, -1,
                     rng.integers(5, 60, R)).astype(np.int32)
    mreals = (m + rng.integers(0, 16, R)).astype(np.int32)
    for rev in (False, True):
        a = np.asarray(xla.window_pass(codes, offs, terms, rlens, mreals,
                                       rev=rev))
        b = tpu.window_pass(codes, offs, terms, rlens, mreals, rev=rev)
        np.testing.assert_array_equal(a, b)


def test_window_pass_specs_parity(rng):
    """Production specs interface: Pallas (interpret) == XLA, and both
    equal the direct codes interface, on a realistic mixed fwd/rev spec
    batch with on-device window building."""
    from fasim_tpu.kernels.tpu import TpuScanEngine
    from fasim_tpu.kernels.xla import build_window_codes

    m = 131
    rna = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, m)]
    scans = rules.scan_list(0, 0)
    xla = XlaScanEngine(rna)
    xla.setup_scans(scans)
    xla.setup_windows(rna)
    tpu = TpuScanEngine(rna, interpret=True)
    tpu.setup_scans(scans)
    tpu.setup_windows(rna)
    S, N = 4, 640
    segs = np.zeros((S, N), np.uint8)
    lens = np.array([640, 503, 640, 77], np.int32)
    for i in range(S):
        segs[i, :lens[i]] = np.frombuffer(b"ACGTN", np.uint8)[
            rng.integers(0, 5, lens[i])]
    R = 37
    spec = {
        "seg_idx": rng.integers(0, S, R).astype(np.int32),
        "scan_idx": rng.integers(0, len(scans), R).astype(np.int32),
        "dirn": np.where(rng.random(R) < 0.5, 1, -1).astype(np.int32),
        "rlens": rng.integers(4, 120, R).astype(np.int32),
        "offs": rng.integers(0, m // 2, R).astype(np.int32),
        "terms": np.where(rng.random(R) < 0.5, -1,
                          rng.integers(5, 60, R)).astype(np.int32),
        "mreals": (m + rng.integers(0, 16, R)).astype(np.int32),
    }
    # keep window reads inside the segment
    base = np.empty(R, np.int32)
    for r in range(R):
        n = lens[spec["seg_idx"][r]]
        w = min(int(spec["rlens"][r]), int(n))
        spec["rlens"][r] = w
        if spec["dirn"][r] == 1:
            base[r] = rng.integers(0, n - w + 1)
        else:
            base[r] = rng.integers(w - 1, n)
    spec["base"] = base
    for rev in (False, True):
        a = np.asarray(xla.window_pass_specs(segs, lens, spec, rev=rev))
        b = tpu.window_pass_specs(segs, lens, spec, rev=rev)
        np.testing.assert_array_equal(a, b)
        # direct-codes cross-check
        lut_s, _, is_tr = xla._scan_luts
        codes = build_window_codes(segs, lens, lut_s, is_tr, spec)
        c = np.asarray(xla.window_pass(codes, spec["offs"], spec["terms"],
                                       spec["rlens"], spec["mreals"],
                                       rev=rev))
        np.testing.assert_array_equal(a, c)


def test_pack_candidates_parity(rng):
    """Device candidate packing (interpret-free jnp) == numpy mirror, and
    packed peaks == full-colmax peaks."""
    from fasim_tpu import native
    from fasim_tpu.kernels.tpu import _pack_candidates, pack_candidates_np

    S, T, N, K = 3, 6, 512, 16
    cm = rng.integers(0, 120, (S, T, N)).astype(np.uint8)
    cm[0, 0, 100:120] = 252  # byte-saturated run
    cm[1, 2, :] = 90  # overflow row (cnt >> K)
    thresh = rng.integers(50, 140, (S, T)).astype(np.int32)
    lengths = np.array([512, 400, 333], np.int32)
    import jax.numpy as jnp

    dp, dv, dc = _pack_candidates(jnp.asarray(thresh), jnp.asarray(cm),
                                  jnp.asarray(lengths), k=K)
    hp, hv, hc = pack_candidates_np(thresh, cm, lengths, K)
    np.testing.assert_array_equal(np.asarray(dc), hc)
    np.testing.assert_array_equal(np.asarray(dp), hp)
    np.testing.assert_array_equal(np.asarray(dv), hv)
    for s in range(S):
        full = native.segment_peaks(cm[s], N, thresh[s], int(lengths[s]))
        if (hc[s] > K).any():
            continue  # overflow rows go through the full path in prod
        packed = native.segment_peaks_packed(hp[s], hv[s], hc[s])
        np.testing.assert_array_equal(full, packed)


def test_align_chain_matches_align_window_py(rng):
    """Full chain (device fwd + device rev + host banded) == golden."""
    from fasim_tpu.scan.candidates import align_via_window_pass

    m = 151
    rna = np.frombuffer(b"ACGTN", np.uint8)[rng.integers(0, 5, m)]
    eng = XlaScanEngine(rna)
    eng.setup_windows(rna)
    q_idx = rules.SSW_ENC[rna]
    n_checked = 0
    for _ in range(40):
        w = int(rng.integers(10, 120))
        # mix random and planted-homology windows
        if rng.random() < 0.5:
            ref = _rand_codes(rng, w)
        else:
            lo = int(rng.integers(0, m - 5))
            piece = q_idx[lo:lo + min(w, m - lo)].copy()
            muts = rng.random(len(piece)) < 0.15
            piece[muts] = rng.integers(0, 5, muts.sum())
            ref = np.concatenate([piece, _rand_codes(rng, w)])[:w]
        golden = kalign.align_window_py(q_idx, ref, rules.SSW_MAT)
        got = align_via_window_pass(eng, q_idx, ref.astype(np.uint8),
                                    rules.SSW_MAT)
        assert got.sw_score == golden.sw_score
        if golden.sw_score:
            assert (got.ref_begin, got.ref_end, got.query_begin,
                    got.query_end) == (golden.ref_begin, golden.ref_end,
                                       golden.query_begin, golden.query_end)
            assert got.cigar == golden.cigar
            n_checked += 1
    assert n_checked >= 10


def test_window_pass_specs_fwd_v3(rng):
    """The v3 forward-specialized per-lane kernel == XLA == the v2
    per-column kernel on uniform production forward specs, across all
    width classes."""
    from fasim_tpu.kernels.tpu import TpuScanEngine, _WCLASSES

    m = 131
    m16 = _ru(m, 16)
    rna = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, m)]
    scans = rules.scan_list(0, 0)
    xla = XlaScanEngine(rna)
    xla.setup_scans(scans)
    xla.setup_windows(rna)
    tpu = TpuScanEngine(rna, interpret=True)
    tpu.setup_scans(scans)
    tpu.setup_windows(rna)
    assert tpu.win_v3
    # small buckets keep interpret-mode runtime sane; rows pad to R
    R = 16
    tpu._win_R = {k: R for k in tpu._win_R}
    tpu.WIN_BUCKETS = {w: (R,) + v[1:]
                       for w, v in tpu.WIN_BUCKETS.items()}
    S, N = 3, 512
    segs = np.zeros((S, N), np.uint8)
    lens = np.array([512, 301, 77], np.int32)
    for i in range(S):
        segs[i, :lens[i]] = np.frombuffer(b"ACGTN", np.uint8)[
            rng.integers(0, 5, lens[i])]
    rows = 11
    # one spec batch per width class, incl. the 196 production maximum
    for wmax in sorted(_WCLASSES):
        wlo = max(4, wmax // 2 + 1)
        whi = min(wmax, 196)
        spec = {
            "seg_idx": rng.integers(0, S, rows).astype(np.int32),
            "scan_idx": rng.integers(0, len(scans), rows).astype(np.int32),
            "dirn": np.ones(rows, np.int32),
            "rlens": rng.integers(wlo, whi + 1, rows).astype(np.int32),
            "offs": np.zeros(rows, np.int32),
            "terms": np.full(rows, -1, np.int32),
            "mreals": np.full(rows, m16, np.int32),
        }
        base = np.empty(rows, np.int32)
        for r in range(rows):
            n = lens[spec["seg_idx"][r]]
            w = min(int(spec["rlens"][r]), int(n))
            spec["rlens"][r] = w
            base[r] = rng.integers(0, n - w + 1)
        spec["base"] = base
        a = np.asarray(xla.window_pass_specs(segs, lens, spec, rev=False))
        n0 = tpu.n_v3_calls
        b = tpu.window_pass_specs(segs, lens, spec, rev=False)
        assert tpu.n_v3_calls == n0 + 1  # the v3 path actually ran
        np.testing.assert_array_equal(a, b)
        tpu.win_v3 = False
        c = tpu.window_pass_specs(segs, lens, spec, rev=False)
        tpu.win_v3 = True
        np.testing.assert_array_equal(a, c)
