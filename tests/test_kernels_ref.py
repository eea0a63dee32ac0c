"""Validate the NumPy golden kernels against the instrumented reference
kernels (oracle/harness.cpp) on bundled and random data."""

import subprocess
import tempfile

import numpy as np
import pytest

from fasim_tpu import rules
from fasim_tpu.io import fasta
from fasim_tpu.kernels import ref as kref


def _run_harness(harness, mode, rna: bytes, seq: bytes, extra=()):
    with tempfile.NamedTemporaryFile(suffix=".txt") as fa, \
         tempfile.NamedTemporaryFile(suffix=".txt") as fb:
        fa.write(rna); fa.flush()
        fb.write(seq); fb.flush()
        out = subprocess.run(
            [harness, mode, fa.name, fb.name, *map(str, extra)],
            capture_output=True, text=True, check=True)
    return out.stdout


def _h19_and_seg():
    _, rna = fasta.read_rna("/root/reference/H19.fa")
    rec = fasta.read_dna("/root/reference/testDNA.fa")[0]
    return rna, rec.seq[:5000]


@pytest.mark.parametrize("scan_i", [0, 1, 12, 13, 30, 47])
def test_colmax_matches_reference(harness, scan_i):
    rna, seg = _h19_and_seg()
    scan = rules.SCAN_TABLE[scan_i]
    seq2, _ = rules.make_scan_strings(seg, scan)
    got = kref.sw_colmax(rules.SSW_ENC[rna], rules.SSW_ENC[seq2], rules.SSW_MAT)
    want = np.array([int(x) for x in _run_harness(
        harness, "colmax", rna.tobytes(), seq2.tobytes()).split()], dtype=np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("scan_i", [0, 13, 30])
def test_thresh_matches_reference(harness, scan_i):
    rna, seg = _h19_and_seg()
    scan = rules.SCAN_TABLE[scan_i]
    seq2, _ = rules.make_scan_strings(seg, scan)
    got = kref.sw_max(rules.THRESH_ENC[rna], rules.THRESH_ENC[seq2],
                      rules.THRESH_MAT)
    want = int(_run_harness(harness, "thresh", rna.tobytes(), seq2.tobytes()))
    assert got == want


def test_colmax_random_including_saturation(harness):
    rng = np.random.default_rng(0)
    for trial in range(4):
        m = int(rng.integers(60, 400))
        n = int(rng.integers(200, 900))
        rna = rng.choice(list(b"ACGT"), size=m).astype(np.uint8)
        seq = rng.choice(list(b"ACGTN"), size=n).astype(np.uint8)
        if trial >= 2:
            # plant a long perfect repeat to force score >= 251 (break path)
            k = min(m, 80)
            pos = n // 3
            seq[pos:pos + k] = rna[:k]
        got = kref.sw_colmax(rules.SSW_ENC[rna], rules.SSW_ENC[seq],
                             rules.SSW_MAT)
        want = np.array([int(x) for x in _run_harness(
            harness, "colmax", rna.tobytes(), seq.tobytes()).split()],
            dtype=np.int32)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_thresh_random_with_escalation(harness):
    rng = np.random.default_rng(1)
    for trial in range(3):
        m = int(rng.integers(80, 300))
        rna = rng.choice(list(b"ACGT"), size=m).astype(np.uint8)
        seq = rng.choice(list(b"ACGT"), size=600).astype(np.uint8)
        if trial == 2:
            seq[100:100 + m] = rna  # perfect hit, score 5*m may exceed 251
        got = kref.sw_max(rules.THRESH_ENC[rna], rules.THRESH_ENC[seq],
                          rules.THRESH_MAT)
        want = int(_run_harness(harness, "thresh", rna.tobytes(),
                                seq.tobytes()))
        assert got == want, f"trial {trial}"
