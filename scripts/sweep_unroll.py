"""Scan-kernel unroll sweep on hardware (VERDICT r2 item 5).

Times the fused scan pass at several column-loop unroll factors and
writes UNROLL_r<N>.json.  Each factor is a fresh Mosaic compile
(~2 min through the remote backend), so this is run once per round and
the winner becomes TpuConfig.unroll's default.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main() -> int:
    rnd = next((a.split("=")[1] for a in sys.argv
                if a.startswith("--round=")), "NN")
    # Mosaic fori_loop supports only unroll=1 or full unroll (=128 steps)
    factors = [int(x) for x in next(
        (a.split("=")[1] for a in sys.argv if a.startswith("--factors=")),
        "1,128").split(",")]
    from fasim_tpu import rules
    from fasim_tpu.io import fasta
    from fasim_tpu.kernels.tpu import TpuScanEngine

    _, rna = fasta.read_rna(os.path.join(REPO, "oracle/MEG3.fa"))
    rng = np.random.default_rng(0)
    S, n = 64, 4900
    npad = (n + 127) // 128 * 128
    segs = np.zeros((S, npad), np.uint8)
    segs[:, :n] = rng.choice(np.frombuffer(b"ACGT", np.uint8), (S, n))
    lengths = np.full(S, n, np.int32)
    scans = rules.scan_list(0, 0)
    cells = S * len(scans) * len(rna) * n
    res = {"cells": cells, "S": S, "n": n, "m": len(rna)}
    base = None
    for u in factors:
        eng = TpuScanEngine(rna, unroll=u)
        eng.setup_scans(scans)
        g, c = eng.scan_segments(segs, lengths)
        gm = np.asarray(g)
        cm = np.asarray(c)
        if base is None:
            base = (gm, cm)
        else:
            assert np.array_equal(base[0], gm), f"unroll={u} thresh differs"
            assert np.array_equal(base[1], cm), f"unroll={u} colmax differs"
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            g, c = eng.scan_segments(segs, lengths)
            np.asarray(g), np.asarray(c)
        dt = (time.time() - t0) / reps
        res[f"unroll{u}"] = {"dt_s": round(dt, 3),
                             "gcups": round(cells / dt / 1e9, 2)}
        print(f"unroll={u}: {dt:.3f}s {cells / dt / 1e9:.1f} GCUPS")
    path = os.path.join(REPO, f"UNROLL_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print("->", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
