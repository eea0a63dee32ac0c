"""Verify the Pallas TPU kernel bit-exact against the NumPy golden engine
on real TPU hardware, and report kernel throughput.

Run directly on a machine with a TPU attached (no JAX_PLATFORMS override):

    python scripts/verify_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from fasim_tpu.io import fasta
from fasim_tpu import rules
from fasim_tpu.kernels.batch_np import numpy_engine
from fasim_tpu.kernels.tpu import TpuScanEngine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    print("devices:", jax.devices())
    _, rna = fasta.read_rna(os.path.join(REPO, "oracle/H19.fa"))
    recs = fasta.read_dna(os.path.join(REPO, "oracle/testDNA.fa"))
    segs, _ = fasta.cut_sequence(recs[0].seq, 5000, 100)
    eng = TpuScanEngine(rna)
    ok = True
    for seg in segs:
        scans = rules.scan_list(0, 0)
        pairs = [rules.make_scan_strings(seg, s) for s in scans]
        s2l = [s2 for s2, _ in pairs]
        thresh_np, colmax_np = numpy_engine(rna, s2l)
        thresh_t, colmax_t = eng(rna, s2l)  # compile
        t0 = time.time()
        thresh_t, colmax_t = eng(rna, s2l)
        dt = time.time() - t0
        eq = (np.array_equal(thresh_np, thresh_t)
              and np.array_equal(colmax_np, colmax_t))
        ok &= eq
        cells = 2 * len(scans) * len(rna) * len(seg)
        print(f"seg len={len(seg)} equal={eq} warm={dt:.3f}s "
              f"({cells / dt / 1e9:.1f} GCUPS)")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
