"""Batched TPU scan driver.

The per-segment pipeline in `pipeline.py` calls the engine once per
segment (48 transforms).  At genome scale that wastes the chip: this
driver ships raw segment bytes to the device in fixed-size batches, the
engine builds all rule transforms on device and returns (threshold,
clamped-uint8 colmax) — ~100x less host-link traffic than shipping codes
and int32 maxima — and the host candidate stage runs per pair on the
results.  All device batches are dispatched up front (JAX async), so
device compute overlaps the host candidate stage.

Results are bit-identical to the sequential pipeline: batching only
reorders *independent* device computations, and the host stage consumes
them in (record, segment, transform) order — the reference's iteration
order (Fasim-LongTarget.cpp:133-163, :395).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import rules
from ..config import BYTE_SAT, Params
from ..io import fasta
from ..kernels.tpu import apply_byte_break
from .pipeline import Triplex, _fast_sim, _sim


@dataclasses.dataclass
class _Work:
    """One (record, segment) pair queued for the device scan."""

    record_idx: int
    start: int  # dnaStartPos of the segment within the record
    segment: np.ndarray


def enumerate_work(p: Params, records) -> tuple[list[_Work], list[dict]]:
    scans = rules.scan_list(p.rule, p.strand)
    work: list[_Work] = []
    for ri, rec in enumerate(records):
        segs, starts = fasta.cut_sequence(rec.seq, p.cut_length,
                                          p.overlap_length)
        for seg, start in zip(segs, starts):
            if fasta.same_seq(seg):
                continue
            work.append(_Work(ri, start, seg))
    return work, scans


def scan_records(p: Params, records, rna: np.ndarray, engine,
                 batch_pairs: int = 8) -> list[list[Triplex]]:
    """Run the full scan for all records; returns one triplex list per
    record (pre genome-coordinate fixup), matching long_target's output.

    `engine` must expose setup_scans/scan_segments (TpuScanEngine or
    XlaScanEngine); the NumPy fallback path lives in pipeline.long_target.
    """
    work, scans = enumerate_work(p, records)
    engine.setup_scans(scans)
    out: list[list[Triplex]] = [[] for _ in records]
    if not work:
        return out
    n_max = max(len(w.segment) for w in work)
    n_pad = (n_max + 127) // 128 * 128

    batches = []
    for lo in range(0, len(work), batch_pairs):
        batch = work[lo:lo + batch_pairs]
        segs = np.zeros((batch_pairs, n_pad), np.uint8)
        lengths = np.zeros(batch_pairs, np.int32)
        for i, w in enumerate(batch):
            segs[i, :len(w.segment)] = w.segment
            lengths[i] = len(w.segment)
        batches.append((batch, segs, lengths))

    # dispatch everything (async under JAX), then consume in order
    pending = [(batch, segs, lengths,
                engine.scan_segments(segs, lengths))
               for batch, segs, lengths in batches]

    for batch, segs, lengths, (gm_dev, cm_dev) in pending:
        gm = np.asarray(gm_dev)
        if (gm >= BYTE_SAT).any():
            # byte->word style escalation: exact thresholds need the
            # full-length prefix pass (rare)
            gm = np.asarray(engine.scan_segments(segs, lengths,
                                                 full_prefix=True)[0])
        cm = np.asarray(cm_dev)
        for i, w in enumerate(batch):
            n = len(w.segment)
            cm_rows = apply_byte_break(cm[i, :, :n].astype(np.int32))
            pairs = None
            for k, scan in enumerate(scans):
                min_score = int(int(gm[i, k]) * 0.8)
                if p.do_fast_sim and not (cm_rows[k] > min_score).any():
                    continue  # no candidate columns -> no peaks
                if pairs is None:  # build transform strings lazily
                    pairs = [rules.make_scan_strings(w.segment, s)
                             for s in scans]
                if p.do_fast_sim:
                    _fast_sim(rna, pairs[k][0], pairs[k][1], w.start,
                              min_score, cm_rows[k], scan["strand"],
                              scan["para"], scan["rule"], p,
                              out[w.record_idx])
                else:
                    _sim(rna, pairs[k][0], pairs[k][1], w.start,
                         min_score, scan["strand"], scan["para"],
                         scan["rule"], p, out[w.record_idx])
    return out


def scan_file_batched(p: Params, engine, batch_pairs: int = 8):
    """Batched equivalent of pipeline.scan_file: same return contract."""
    records = fasta.read_dna(p.file1path)
    lnc_name, rna = fasta.read_rna(p.file2path)
    per_record = scan_records(p, records, rna, engine, batch_pairs)
    all_t: list[Triplex] = []
    f32 = np.float32
    for rec, lst in zip(records, per_record):
        # final filter (Fasim-LongTarget.cpp:589-597) then coordinate fixup
        lst = [t for t in lst
               if (t.score >= f32(p.score_min)
                   and t.identity >= f32(p.min_identity)
                   and t.tri_score >= f32(p.min_stability)
                   and t.nt >= p.c_length)]
        for t in lst:
            if t.genomestart == 0:
                t.chr = rec.chro_tag
                t.genomestart = t.starj + rec.start_genome - 1
                t.genomeend = t.endj + rec.start_genome - 1
        all_t.extend(lst)
    return records, lnc_name, rna, all_t
