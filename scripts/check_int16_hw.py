"""Hardware bit-parity + timing of the int16 kernels vs int32.

The int16 scan/window kernels rely on Mosaic's sublane-packed layout for
the bitcast lane-roll (_roll_l); interpret mode validates the semantics,
this script validates the actual Mosaic lowering on a real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    from fasim_tpu import rules
    from fasim_tpu.io import fasta
    from fasim_tpu.kernels.tpu import TpuScanEngine

    _, rna = fasta.read_rna(os.path.join(REPO, "oracle/MEG3.fa"))
    rng = np.random.default_rng(7)
    S, n = 64, 4900
    npad = (n + 127) // 128 * 128
    segs = np.zeros((S, npad), np.uint8)
    segs[:, :n] = rng.choice(np.frombuffer(b"ACGT", np.uint8), (S, n))
    # a couple of rows with non-ACGT bytes to exercise the unfused path
    segs[1, 100:120] = ord("n")
    segs[2, 50:60] = ord("U")
    lengths = np.full(S, n, np.int32)
    scans = rules.scan_list(0, 0)

    def make(scan16):
        os.environ["FASIM_SCAN16"] = "1" if scan16 else "0"
        e = TpuScanEngine(rna)
        e.setup_scans(scans)
        e.setup_windows(rna)
        return e

    e16, e32 = make(True), make(False)
    ok = True
    for name, full in (("windowed", False), ("full_prefix", True)):
        g16, c16 = (np.asarray(x) for x in e16.scan_segments(
            segs, lengths, full_prefix=full))
        g32, c32 = (np.asarray(x) for x in e32.scan_segments(
            segs, lengths, full_prefix=full))
        eq = np.array_equal(g16, g32) and np.array_equal(c16, c32)
        ok &= eq
        print(f"scan {name}: parity={eq}")
    # timing (fused windowed path)
    for label, e in (("int16", e16), ("int32", e32)):
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            g, c = e.scan_segments(segs, lengths)
            np.asarray(g), np.asarray(c)
        dt = (time.time() - t0) / reps
        cells = S * len(scans) * len(rna) * n
        print(f"scan {label}: {dt:.3f}s {cells / dt / 1e9:.1f} GCUPS")
    # window pass parity + timing, both width classes, fwd + rev
    rows = 4096
    spec = {
        "seg_idx": rng.integers(0, S, rows).astype(np.int32),
        "scan_idx": rng.integers(0, len(scans), rows).astype(np.int32),
        "base": rng.integers(0, 4000, rows).astype(np.int32),
        "dirn": np.ones(rows, np.int32),
        "rlens": rng.integers(8, 197, rows).astype(np.int32),
        "offs": np.zeros(rows, np.int32),
        "terms": np.full(rows, -1, np.int32),
        "mreals": np.full(rows, (len(rna) + 15) // 16 * 16, np.int32),
    }
    spec_r = dict(spec)
    spec_r["dirn"] = np.full(rows, -1, np.int32)
    spec_r["base"] = spec["base"] + 200
    spec_r["offs"] = rng.integers(0, len(rna) // 2, rows).astype(np.int32)
    spec_r["terms"] = np.where(rng.random(rows) < 0.5, -1,
                               rng.integers(5, 90, rows)).astype(np.int32)
    for rev, sp in ((False, spec), (True, spec_r)):
        w16 = e16.window_pass_specs(segs, lengths, sp, rev=rev)
        w32 = e32.window_pass_specs(segs, lengths, sp, rev=rev)
        eq = np.array_equal(w16, w32)
        ok &= eq
        print(f"window rev={rev}: parity={eq}")
    for label, e in (("int16", e16), ("int32", e32)):
        t0 = time.time()
        for _ in range(3):
            e.window_pass_specs(segs, lengths, spec, rev=False)
        dt = (time.time() - t0) / 3
        cells = rows * 256 * len(rna)
        print(f"window {label}: {dt:.3f}s {cells / dt / 1e9:.1f} GCUPS")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
