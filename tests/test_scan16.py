"""int16 scan-kernel parity (interpret mode).

The 16-bit kernel cannot lower on v5e Mosaic (no packed int16 vector
ALU), so hardware runs keep it off; this pins its exactness — including
the compare-free pad handling (poison-add + cap-min) and the decaying
prefix max — against the int32 kernel and the XLA reference engine so it
is ready for packed-ALU targets.
"""
import os

import numpy as np
import pytest

from fasim_tpu import rules
from fasim_tpu.kernels.xla import XlaScanEngine


def _mk_engine(rna, scan16):
    from fasim_tpu.kernels import tpu as ktpu

    old = os.environ.get("FASIM_SCAN16")
    os.environ["FASIM_SCAN16"] = "1" if scan16 else "0"
    try:
        eng = ktpu.TpuScanEngine(rna, interpret=True)
    finally:
        if old is None:
            os.environ.pop("FASIM_SCAN16", None)
        else:
            os.environ["FASIM_SCAN16"] = old
    eng.setup_scans(rules.scan_list(0, 0))
    return eng


@pytest.mark.parametrize("seed", [0, 1])
def test_scan16_matches_int32_and_xla(seed):
    rng = np.random.default_rng(seed)
    rna = rng.choice(np.frombuffer(b"ACGT", np.uint8), 75)
    n = 230
    segs = np.zeros((3, 256), np.uint8)
    for i in range(3):
        segs[i, :n] = rng.choice(np.frombuffer(b"ACGT", np.uint8), n)
    if seed == 1:  # unfused path: non-ACGT bytes
        segs[1, 40:50] = ord("n")
    lengths = np.full(3, n, np.int32)

    e16 = _mk_engine(rna, True)
    e32 = _mk_engine(rna, False)
    xla = XlaScanEngine(rna)
    xla.setup_scans(rules.scan_list(0, 0))
    g16, c16 = (np.asarray(x) for x in e16.scan_segments(segs, lengths))
    g32, c32 = (np.asarray(x) for x in e32.scan_segments(segs, lengths))
    gx, cx = (np.asarray(x) for x in xla.scan_segments(segs, lengths))
    assert np.array_equal(g16, g32)
    assert np.array_equal(c16, c32)
    assert np.array_equal(g16, gx)
    assert np.array_equal(c16, cx)


@pytest.mark.parametrize("m", [64, 190, 61])
def test_pad_boundary_parity(m):
    """Regression: the sentinel prefix needs >= 64 pad lanes.  With
    round_up(m16+63) padding, m16 = 128k - 63 left exactly 63 pad lanes
    and the final fv roll leaked a real F value into lane 0 (latent in
    the 2048-bucket layout too, for m16 = 2048k - 63).  m = 64/190 sit
    exactly on the pad-64 boundary of the fixed layout."""
    rng = np.random.default_rng(m)
    rna = rng.choice(np.frombuffer(b"ACGT", np.uint8), m)
    n = 200
    segs = np.zeros((2, 256), np.uint8)
    for i in range(2):
        segs[i, :n] = rng.choice(np.frombuffer(b"ACGT", np.uint8), n)
    lengths = np.full(2, n, np.int32)
    for scan16 in (False, True):
        eng = _mk_engine(rna, scan16)
        xla = XlaScanEngine(rna)
        xla.setup_scans(rules.scan_list(0, 0))
        g, c = (np.asarray(x) for x in eng.scan_segments(segs, lengths))
        gx, cx = (np.asarray(x) for x in xla.scan_segments(segs, lengths))
        assert np.array_equal(g, gx), f"scan16={scan16}"
        assert np.array_equal(c, cx), f"scan16={scan16}"
