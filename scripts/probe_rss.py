"""RSS-growth attribution probe: 5 Mb streamed scan with per-batch
live-array and RSS tracking.

GENOME_r4 shows RSS growing ~33 MB per Mb of input during the scan
phase.  This probe distinguishes (a) Python-side reference leaks (jax
live_arrays or object counts grow per batch) from (b) axon-client
internals (RSS grows while live arrays stay flat).
"""

import gc
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    import jax

    from bench import REPO as _  # noqa: F401  (repo path side effect)
    from fasim_tpu.cli import make_engine
    from fasim_tpu.config import Params, TpuConfig
    from fasim_tpu.io import fasta
    from fasim_tpu.scan.batched import scan_file_stream
    from scripts.bench_genome import synth_genome

    _, rna = fasta.read_rna(os.path.join(REPO, "oracle/MEG3.fa"))
    with tempfile.TemporaryDirectory() as td:
        os.chdir(td)
        synth_genome("g.fa", 5.0, rna)
        p = Params(file1path="g.fa", file2path=os.path.join(
            REPO, "oracle/MEG3.fa"), outpath=td)
        tpu = TpuConfig()
        engines = make_engine(tpu, rna)

        # sample every 5 s from a thread
        import threading

        samples = []
        stop = threading.Event()

        def sampler():
            while not stop.wait(5.0):
                gc.collect()
                la = jax.live_arrays()
                nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                             for a in la)
                samples.append((round(time.time() - t0, 1),
                                round(rss_mb(), 1), len(la),
                                round(nbytes / 1e6, 1)))

        t0 = time.time()
        threading.Thread(target=sampler, daemon=True).start()
        scan_file_stream(p, engines, batch_pairs=tpu.segments_per_batch,
                         max_inflight=tpu.max_inflight)
        stop.set()
    print("t_s rss_mb n_live_arrays live_MB")
    for s in samples:
        print(*s)
    return 0


if __name__ == "__main__":
    sys.exit(main())
