"""Benchmark: DP cell-update throughput of the hot scan kernels on one chip.

Workload mirrors the reference's accounting (SURVEY.md §6): a genome scan
costs 48 rule transforms x 2 full DP passes (threshold + column-max scan)
over |RNA| x |segment| cells.  The reference runs 2.1 GCUPS on H19 x
testDNA single-core (BASELINE.md); vs_baseline is the speedup over that.
Timing includes host<->device transfers (raw segment bytes in, uint8
column maxima + int32 thresholds out), i.e. the sustained rate a genome
scan actually sees.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_GCUPS = 2.1  # reference H19 x testDNA, 1 CPU core (SURVEY.md §6)
REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    from fasim_tpu import rules
    from fasim_tpu.io import fasta
    from fasim_tpu.kernels.tpu import TpuScanEngine

    _, rna = fasta.read_rna(os.path.join(REPO, "oracle/H19.fa"))
    recs = fasta.read_dna(os.path.join(REPO, "oracle/testDNA.fa"))
    seg = recs[0].seq
    scans = rules.scan_list(0, 0)
    eng = TpuScanEngine(rna)
    eng.setup_scans(scans)

    n = len(seg)
    npad = (n + 127) // 128 * 128
    s_batch = 32
    segs = np.zeros((s_batch, npad), np.uint8)
    segs[:, :n] = seg
    lengths = np.full(s_batch, n, np.int32)

    def run():
        g, c = eng.scan_segments(segs, lengths)
        np.asarray(g)
        np.asarray(c)

    run()  # compile
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        run()
    dt = (time.time() - t0) / reps
    cells = 2 * s_batch * len(scans) * len(rna) * n
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "scan_kernel_throughput_per_chip",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
