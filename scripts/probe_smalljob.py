"""Phase-timed fresh-process H19-demo run (small-job latency probe).

The reference runs the H19 demo in 0.57 s single-core; a warm-server
fresh framework process measured ~15.7 s in round 4 (VERIFY_r04
h19_default).  This script attributes that wall to phases:

    python scripts/probe_smalljob.py [--engine=pallas]

Writes nothing; prints one line per phase + total.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.time()
_last = [T0]


def mark(label: str) -> None:
    now = time.time()
    print(f"{label:28s} +{now - _last[0]:6.2f}s  (t={now - T0:6.2f}s)",
          flush=True)
    _last[0] = now


def main() -> int:
    eng_kind = next((a.split("=")[1] for a in sys.argv
                     if a.startswith("--engine=")), "pallas")
    import numpy as np  # noqa: F401

    mark("imports(numpy)")
    import jax

    jax.devices()
    mark("jax backend init")
    from fasim_tpu.cli import make_engine
    from fasim_tpu.config import Params, TpuConfig
    from fasim_tpu.io import fasta
    from fasim_tpu.post.output import print_result
    from fasim_tpu.scan.batched import scan_file_batched

    mark("framework imports")
    os.chdir(os.path.join(REPO, "oracle"))
    out = "/tmp/fasim_smalljob"
    os.makedirs(out, exist_ok=True)
    p = Params(file1path="testDNA.fa", file2path="H19.fa", outpath=out,
               c_length=40)
    tpu = TpuConfig(engine=eng_kind)
    _, rna = fasta.read_rna(p.file2path)
    mark("read inputs")
    engines = make_engine(tpu, rna)
    mark("make_engine")
    records, lnc, _, tlist = scan_file_batched(
        p, engines, batch_pairs=tpu.segments_per_batch,
        max_inflight=tpu.max_inflight)
    mark("scan (1 segment)")
    first = records[0]
    path = print_result(p, first.species, lnc, tlist, first.chro_tag,
                        len(first.seq), first.start_genome)
    mark("cluster+output")
    golden = os.path.join(REPO, "oracle/golden/h19_lg40",
                          os.path.basename(path))
    with open(path, "rb") as f1, open(golden, "rb") as f2:
        ident = f1.read() == f2.read()
    print(f"total {time.time() - T0:.2f}s  identical={ident}")
    rerun(p, engines, tpu)
    return 0




def rerun(p, engines, tpu):
    """In-process warm repeats = the long-lived service number."""
    from fasim_tpu.post.output import print_result
    from fasim_tpu.scan.batched import scan_file_batched

    for i in range(3):
        t0 = time.time()
        records, lnc, _, tlist = scan_file_batched(
            p, engines, batch_pairs=tpu.segments_per_batch,
            max_inflight=tpu.max_inflight)
        first = records[0]
        print_result(p, first.species, lnc, tlist, first.chro_tag,
                     len(first.seq), first.start_genome)
        print(f"warm rep{i}: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    sys.exit(main())
