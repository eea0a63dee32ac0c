"""One-off: measure the winning-alignment duplicate rate on MEG3-full.

Wraps native.finalize_pair to count wins rows vs distinct win tuples
(the work the in-C++ dedup now skips), runs the full MEG3 e2e on the
real engine, and checks the output against the committed golden.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from fasim_tpu import native

stats = {"rows": 0, "uniq": 0, "calls": 0}
_orig = native.finalize_pair


def counting_finalize_pair(q_idx, r_idx, rna, s2, src, wins, *a, **kw):
    stats["rows"] += len(wins)
    stats["uniq"] += len(np.unique(np.ascontiguousarray(wins, np.int32),
                                   axis=0))
    stats["calls"] += 1
    return _orig(q_idx, r_idx, rna, s2, src, wins, *a, **kw)


native.finalize_pair = counting_finalize_pair
import fasim_tpu.scan.candidates as cand  # noqa: E402

cand.native = native

import bench  # noqa: E402

t0 = time.time()
mb_s, warm, cold, identical, stages, eng, rna = bench.bench_e2e_meg3()
print({"dup_calls": stats["calls"], "rows": stats["rows"],
       "uniq": stats["uniq"],
       "dup_rate": round(1 - stats["uniq"] / max(1, stats["rows"]), 4),
       "warm_s": round(warm, 1), "cold_s": round(cold, 1),
       "identical": identical,
       "stages": {k: round(v, 2) for k, v in stages.items()
                  if not k.startswith("n_")}})
