"""Differential tests of the native exact SIM engine vs the reference.

The oracle harness `sim` mode drives the reference SIM (sim.h:410-1143)
directly on one (rna, transformed-seq, source-seq) triple; the native
runtime must reproduce every row byte-for-byte: coordinates, nt, the
10x-descaled score, identity, stability (incl. TT/CC run penalties), and
both aligned strings — across k-best extraction, used-cell exclusion, and
rectangle recomputation.
"""

import os
import subprocess

import numpy as np
import pytest

from conftest import oracle_bin

from fasim_tpu import native


def _ref_rows(harness, tmp_path, rna, seq, src, min_score, strand, para,
              nt_min):
    fr = tmp_path / "r.txt"
    fs = tmp_path / "s.txt"
    fc = tmp_path / "c.txt"
    fr.write_text(rna)
    fs.write_text(seq)
    fc.write_text(src)
    out = subprocess.run(
        [harness, "sim", str(fr), str(fs), str(fc), str(min_score),
         str(strand), str(para), "1", str(nt_min)],
        capture_output=True, text=True, check=True)
    return out.stdout.strip().splitlines() if out.stdout.strip() else []


def _our_rows(rna, seq, src, min_score, strand, para, nt_min):
    rows = []
    for t in native.sim_scan(rna.encode(), seq.encode(), src.encode(), 0,
                             min_score, strand, para, nt_min, 100000,
                             -1000, 0):
        rows.append(f"{t[0]} {t[1]} {t[2]} {t[3]} {strand} {para} 1 {t[4]} "
                    f"{t[5]:.6g} {t[6]:.6g} {t[7]:.6g} {t[8]} {t[9]}")
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_sim_random_vs_oracle(harness, tmp_path, seed):
    rng = np.random.default_rng(seed)
    bases = list("ACGT")
    m = int(rng.integers(30, 250))
    n = int(rng.integers(60, 700))
    rna = "".join(rng.choice(bases, m))
    seq = "".join(rng.choice(bases, n))
    src = "".join(rng.choice(bases, n))
    min_score = int(rng.integers(5, 50))
    strand = int(rng.integers(0, 2))
    para = [1, -1][int(rng.integers(0, 2))]
    nt_min = int(rng.integers(3, 15))
    ref = _ref_rows(harness, tmp_path, rna, seq, src, min_score, strand,
                    para, nt_min)
    ours = _our_rows(rna, seq, src, min_score, strand, para, nt_min)
    assert ours == ref


def test_sim_tt_runs_and_coordinate_flip(harness, tmp_path):
    """TT runs exercise the penalty quirk; (para<0, strand=0) exercises the
    SIM-specific flip formula (sim.h:735-746, differs from fastSIM's)."""
    rna = "GGTTGGTTTTGGAAGGTTGG" * 4
    seq = "AATTGGTTTTGGAAGGTTGGAA" * 6
    src = "TTTTTTGGTTCCTTTTGGTTCC" * 6
    for strand, para in [(0, 1), (1, 1), (0, -1), (1, -1)]:
        ref = _ref_rows(harness, tmp_path, rna, seq, src, 10, strand, para, 4)
        ours = _our_rows(rna, seq, src, 10, strand, para, 4)
        assert ours == ref, (strand, para)


def test_sim_device_forward_replay():
    """Device (XLA) forward scan + host add_node replay == pure host
    sim_scan, row-for-row, across random and homology-planted cases."""
    from fasim_tpu.kernels.sim_dev import sim_forward_cells

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for case in range(6):
        m = int(rng.integers(40, 160))
        n = int(rng.integers(80, 400))
        rna = bases[rng.integers(0, 4, m)]
        seq = bases[rng.integers(0, 4, n)]
        if case % 2 == 0:  # plant homology so extraction does real work
            ql = min(m, int(rng.integers(20, 60)))
            lo = int(rng.integers(0, n - ql))
            piece = rna[:ql].copy()
            muts = rng.random(ql) < 0.1
            piece[muts] = bases[rng.integers(0, 4, int(muts.sum()))]
            seq[lo:lo + ql] = piece
        if case == 5:
            seq[10:20] = ord("N")  # non-ACGT column (V row zero)
        src = seq.copy()
        min_score = int(rng.integers(20, 80))
        host = native.sim_scan(rna.tobytes(), seq.tobytes(),
                               src.tobytes(), 0, min_score, 0, 1, 10,
                               100000, 1, 0)
        cells = sim_forward_cells(rna, [seq], [min_score])[0]
        dev = native.sim_scan_replay(rna.tobytes(), seq.tobytes(),
                                     src.tobytes(), 0, min_score, 0, 1,
                                     10, 100000, 1, 0, cells)
        assert dev == host, (case, m, n, min_score)
