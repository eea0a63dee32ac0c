"""Serialized per-stage device profile of the MEG3-full scan.

Runs the batched driver's stages by hand with everything synchronous
(one batch at a time, blocking after each device call) so each stage's
true device+link cost is visible — the production driver overlaps these,
so the sum here is an upper bound on warm wall time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fasim_tpu import rules
from fasim_tpu.cli import make_engine
from fasim_tpu.config import BYTE_SAT, Params, TpuConfig
from fasim_tpu.io import fasta
from fasim_tpu.scan.batched import _ScanMeta, enumerate_work
from fasim_tpu.scan import candidates as C

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    os.chdir(os.path.join(REPO, "oracle"))
    p = Params(file1path="meg3dna.fa", file2path="MEG3.fa", outpath="/tmp")
    records = fasta.read_dna(p.file1path)
    _, rna = fasta.read_rna(p.file2path)
    eng = make_engine(TpuConfig(), rna)[0]
    work, scans = enumerate_work(p, records)
    print(f"{len(work)} segments")
    eng.setup_scans(scans)
    eng.setup_windows(rna)
    meta = _ScanMeta(scans)
    q_idx = np.ascontiguousarray(rules.SSW_ENC[rna], np.int32)
    n_pad = (max(len(w.segment) for w in work) + 127) // 128 * 128
    B = 64
    m16 = (len(rna) + 15) // 16 * 16

    for rep in range(2):
        t = {"scan": 0.0, "pack_fetch": 0.0, "peaks": 0.0, "fwd": 0.0,
             "rev": 0.0}
        rows_hist = []
        t_all = time.time()
        for lo in range(0, len(work), B):
            batch = work[lo:lo + B]
            segs = np.zeros((B, n_pad), np.uint8)
            lengths = np.zeros(B, np.int32)
            for i, w in enumerate(batch):
                segs[i, :len(w.segment)] = w.segment
                lengths[i] = len(w.segment)
            t0 = time.time()
            out = eng.scan_segments_packed(segs, lengths)
            gm = np.asarray(out[0])
            t["scan"] += time.time() - t0
            t0 = time.time()
            packed = (np.asarray(out[2]), np.asarray(out[3]),
                      np.asarray(out[4]))
            t["pack_fetch"] += time.time() - t0
            assert not (gm >= BYTE_SAT).any()
            t0 = time.time()
            peak_parts = []
            from fasim_tpu import native
            for i, w in enumerate(batch):
                # overflow rows (cnt > k) use the driver's full-row
                # fallback in production; clamp here (profiling only)
                cnt = np.minimum(packed[2][i], packed[0].shape[2])
                pk = native.segment_peaks_packed(packed[0][i], packed[1][i],
                                                 cnt)
                if len(pk):
                    peak_parts.append(np.column_stack(
                        [np.full(len(pk), i, np.int64), pk]))
            t["peaks"] += time.time() - t0
            if not peak_parts:
                continue
            peaks = np.concatenate(peak_parts)
            seg_i, scan_i, score, pos = (peaks[:, 0], peaks[:, 1],
                                         peaks[:, 2], peaks[:, 3])
            P = len(peaks)
            cutlens = C.sweep_cutlengths(score, pos)
            nr = cutlens.shape[1]
            uniq = np.ones((P, nr), bool)
            uniq[:, 1:] = cutlens[:, 1:] != cutlens[:, :-1]
            pk, rd = np.nonzero(uniq)
            rows_hist.append((P, len(pk)))
            spec = {
                "seg_idx": seg_i[pk].astype(np.int32),
                "scan_idx": scan_i[pk].astype(np.int32),
                "base": (pos[pk] - cutlens[pk, rd] + 1).astype(np.int32),
                "dirn": np.ones(len(pk), np.int32),
                "rlens": cutlens[pk, rd].astype(np.int32),
                "offs": np.zeros(len(pk), np.int32),
                "terms": np.full(len(pk), -1, np.int32),
                "mreals": np.full(len(pk), m16, np.int32),
            }
            t0 = time.time()
            outw = eng.window_pass_specs(segs, lengths, spec, rev=False)
            t["fwd"] += time.time() - t0
            # rev pass on ~P winners (approximate with all peaks' round 0)
            r0 = rd == 0
            w0 = outw[r0]
            wi = np.flatnonzero(w0[:, 0] > 0)
            lanes = np.where(w0[wi, 0] >= BYTE_SAT, 8, 16)
            spec_r = {
                "seg_idx": seg_i[wi].astype(np.int32),
                "scan_idx": scan_i[wi].astype(np.int32),
                "base": (pos[wi] - cutlens[wi, 0] + 1
                         + w0[wi, 1]).astype(np.int32),
                "dirn": np.full(len(wi), -1, np.int32),
                "rlens": (w0[wi, 1] + 1).astype(np.int32),
                "offs": (len(rna) - 1 - w0[wi, 2]).astype(np.int32),
                "terms": w0[wi, 0].astype(np.int32),
                "mreals": (len(rna) + (-(w0[wi, 2] + 1)) % lanes
                           ).astype(np.int32),
            }
            t0 = time.time()
            eng.window_pass_specs(segs, lengths, spec_r, rev=True)
            t["rev"] += time.time() - t0
        wall = time.time() - t_all
        tot_p = sum(a for a, _ in rows_hist)
        tot_r = sum(b for _, b in rows_hist)
        print(f"rep{rep}: wall={wall:.1f}s "
              + " ".join(f"{k}={v:.1f}" for k, v in t.items())
              + f" peaks={tot_p} fwd_rows={tot_r}"
              + f" max_batch_rows={max((b for _, b in rows_hist), default=0)}")


if __name__ == "__main__":
    main()
