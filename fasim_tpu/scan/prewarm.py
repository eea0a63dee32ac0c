"""Background compile pre-warming for one-shot CLI runs.

A fresh process pays one remote Mosaic compile (1-2 min each through the
axon backend) per kernel shape, and the serial driver would otherwise
discover the shapes one at a time: scan shape on the first batch, each
window class only when its first candidate bucket dispatches.  This
module launches every static shape's compile on daemon threads right
after engine setup, so

  * compiles run CONCURRENTLY on the compile server instead of
    serializing behind the driver's discovery order, and
  * the first real batches overlap with the still-outstanding window
    compiles (the scan compile gates the first dispatch either way —
    jax's per-signature cache lock dedups the work, it is never done
    twice).

Best-effort: any failure is swallowed (the driver compiles on demand as
before).  Reference target: the one-shot usage model of
/root/reference/README.md:87-88.
"""

from __future__ import annotations

import threading

import numpy as np

def prewarm_engines(engines, n_pad: int, batch_pairs: int,
                    windows: bool) -> None:
    """Launch compile warmers for every engine's static shapes."""
    for eng in engines:
        if not getattr(eng, "win_v2", False) or eng.interpret:
            continue  # Pallas TPU engine only; XLA-CPU compiles in sec
        key = (n_pad, batch_pairs)
        # flag lives on the engine itself (an id()-keyed module set could
        # alias a new engine after the old one is garbage-collected)
        warmed = getattr(eng, "_prewarmed", None)
        if warmed is None:
            warmed = eng._prewarmed = set()
        if key in warmed:
            continue
        warmed.add(key)

        def scan_job(eng=eng):
            segs = np.zeros((batch_pairs, n_pad), np.uint8)
            lengths = np.full(batch_pairs, 128, np.int32)
            out = eng.scan_segments_packed(segs, lengths)
            np.asarray(out[0])

        jobs = [scan_job]
        if windows and getattr(eng, "_scan_luts", None) is not None:
            from ..kernels.tpu import _WCLASSES

            def win_job(w, eng=eng):
                def job():
                    bsz = eng.WIN_BUCKETS[w][0]
                    spec = {
                        "seg_idx": np.zeros(bsz, np.int32),
                        "scan_idx": np.zeros(bsz, np.int32),
                        "base": np.zeros(bsz, np.int32),
                        "dirn": np.ones(bsz, np.int32),
                        "rlens": np.full(bsz, w, np.int32),
                        "offs": np.zeros(bsz, np.int32),
                        "terms": np.full(bsz, -1, np.int32),
                        # m16, so this hits the production fwd compile
                        # (the uniform-mask kernel variant)
                        "mreals": np.full(bsz, (eng.m + 15) // 16 * 16,
                                          np.int32),
                    }
                    segs = np.zeros((batch_pairs, n_pad), np.uint8)
                    lengths = np.full(batch_pairs, 128, np.int32)
                    # the uniform spec above routes rev=False through
                    # the v3 fwd kernel; rev=True compiles the v2
                    # kernel (they no longer share a Mosaic program)
                    eng.window_pass_specs(segs, lengths, spec, rev=False)
                    eng.window_pass_specs(segs, lengths, spec, rev=True)
                return job

            jobs += [win_job(w) for w in sorted(_WCLASSES)]
        for job in jobs:
            t = threading.Thread(target=_guard(job), daemon=True,
                                 name="fasim-prewarm")
            t.start()


def _guard(fn):
    def run():
        try:
            fn()
        except Exception:
            pass  # best-effort: the driver compiles on demand

    return run
