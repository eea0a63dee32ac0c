"""Random differential tests against the compiled reference (oracle).

SURVEY.md §4 property tests: random sequences (with N, lowercase, U,
multi-record headers) through the full CLI must byte-match the patched
reference binary; the candidate-stage golden models (align_window_py,
prealign_peaks) are checked directly against the instrumented reference
kernels (oracle/harness.cpp align/prealign modes)."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from conftest import ORACLE, REPO, oracle_bin

from fasim_tpu import rules
from fasim_tpu.kernels import align as kalign
from fasim_tpu.kernels import ref as kref


def _write(path: str, text: str) -> None:
    with open(path, "w") as f:
        f.write(text)


def _rand_seq(rng, n, alphabet="ACGT"):
    return "".join(alphabet[i] for i in rng.integers(0, len(alphabet), n))


@pytest.mark.parametrize("seed", [11, 23])
def test_random_full_pipeline_vs_oracle(tmp_path, seed, harness):
    """Full CLI vs oracle/bin/fasim_patched on random multi-record input."""
    fasim = oracle_bin("fasim_patched")
    rng = np.random.default_rng(seed)
    rna = _rand_seq(rng, 160)
    if seed % 2:
        # U quirk ('U'->'A' in the scanner, ~'T' in the threshold engine)
        # and lowercase query bases (case-insensitive encoders)
        rna = rna[:50] + "u" + rna[51:81].lower() + rna[81:]
    # DNA alphabet ACGTN only: lowercase DNA makes the reference's
    # complement() drop characters (rules.h:82-84), shifting every
    # source-string read — undefined behavior we refuse instead of match
    recs = []
    start = 5000
    for i, n in enumerate((1100, 700, 450)):
        seq = _rand_seq(rng, n, "ACGTN" if i == 2 else "ACGT")
        # plant homology so hits exist
        lo = int(rng.integers(0, n - 120))
        seq = seq[:lo] + rna[10:110].upper().replace("U", "T") + seq[lo + 100:]
        recs.append(f">hg19|chr{i + 1}|{start}-{start + n - 1}\n{seq}\n")
        start += 10 * n
    dna = "".join(recs)
    for sub in ("ref", "fw"):
        d = tmp_path / sub
        d.mkdir()
        _write(str(d / "dna.fa"), dna)
        _write(str(d / "rna.fa"), ">TESTRNA\n" + rna + "\n")
        (d / "out").mkdir()
    r = subprocess.run([fasim, "-f1", "dna.fa", "-f2", "rna.fa",
                        "-O", "out/", "-lg", "40"],
                       cwd=tmp_path / "ref", capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-m", "fasim_tpu.cli", "-f1",
                        "dna.fa", "-f2", "rna.fa", "-O", "out/", "-lg",
                        "40", "--tpu-engine", "xla"],
                       cwd=tmp_path / "fw", env=env, capture_output=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    ref_files = sorted(os.listdir(tmp_path / "ref" / "out"))
    fw_files = sorted(os.listdir(tmp_path / "fw" / "out"))
    assert ref_files == fw_files and ref_files
    rows = 0
    for name in ref_files:
        a = (tmp_path / "ref" / "out" / name).read_bytes()
        b = (tmp_path / "fw" / "out" / name).read_bytes()
        assert a == b, f"{name} differs"
        rows += a.count(b"\n")
    assert rows > 10  # planted homology must produce real output


def test_align_window_py_vs_harness(tmp_path, harness):
    """align_window_py (the window-pass differential target) vs the
    reference ssw_align on random and planted-homology windows."""
    rng = np.random.default_rng(3)
    rna = _rand_seq(rng, 150)
    q_idx = rules.SSW_ENC[np.frombuffer(rna.encode(), np.uint8)]
    _write(str(tmp_path / "rna.txt"), rna)
    checked = 0
    for t in range(14):
        w = int(rng.integers(12, 140))
        if t % 2:
            lo = int(rng.integers(0, 140 - 30))
            core = list(rna[lo:lo + min(w, 150 - lo)])
            for j in range(len(core)):
                if rng.random() < 0.12:
                    core[j] = "ACGT"[rng.integers(0, 4)]
            win = ("".join(core) + _rand_seq(rng, w))[:w]
        else:
            win = _rand_seq(rng, w, "ACGTN")
        _write(str(tmp_path / "win.txt"), win)
        r = subprocess.run([harness, "align", str(tmp_path / "rna.txt"),
                            str(tmp_path / "win.txt")],
                           capture_output=True, text=True, timeout=60)
        assert r.returncode == 0, r.stderr
        parts = r.stdout.split()
        sw, qb, qe, rb, re_ = map(int, parts[:5])
        cig = parts[5] if len(parts) > 5 else ""
        al = kalign.align_window_py(
            q_idx, rules.SSW_ENC[np.frombuffer(win.encode(), np.uint8)],
            rules.SSW_MAT)
        assert al.sw_score == sw
        if sw:
            assert (al.query_begin, al.query_end, al.ref_begin,
                    al.ref_end) == (qb, qe, rb, re_)
            assert al.cigar_string == cig
            checked += 1
    assert checked >= 5


def test_prealign_peaks_vs_harness(tmp_path, harness):
    """prealign_peaks + byte-broken colmax vs the reference preAlign."""
    rng = np.random.default_rng(5)
    rna = _rand_seq(rng, 120)
    q_idx = rules.SSW_ENC[np.frombuffer(rna.encode(), np.uint8)]
    _write(str(tmp_path / "rna.txt"), rna)
    for t in range(4):
        seg = _rand_seq(rng, 500)
        lo = int(rng.integers(0, 380))
        seg = seg[:lo] + rna[:100] + seg[lo + 100:]
        _write(str(tmp_path / "seg.txt"), seg)
        colmax = kref.sw_colmax(
            q_idx, rules.SSW_ENC[np.frombuffer(seg.encode(), np.uint8)],
            rules.SSW_MAT)
        for thr in (30, 60, 120):
            r = subprocess.run([harness, "prealign",
                                str(tmp_path / "rna.txt"),
                                str(tmp_path / "seg.txt"), str(thr)],
                               capture_output=True, text=True, timeout=60)
            assert r.returncode == 0, r.stderr
            want = [tuple(map(int, line.split()))
                    for line in r.stdout.splitlines() if line.strip()]
            got = kalign.prealign_peaks(colmax, thr)
            assert got == want, (t, thr)
