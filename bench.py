"""Benchmark: end-to-end genome scan throughput + hot-kernel rates.

Primary metric (one JSON line): `genome_mb_per_s` — *warm* wall-clock
Mb/s of the full pipeline (FASTA -> scan -> candidates -> clustering ->
files) on the MEG3 x 1.32 Mb multi-record dataset, the largest committed
oracle case.  vs_baseline is the speedup over the reference binary's
79.8 s on the same input (BASELINE.md: 0.0165 Mb/s, 1 CPU core).

Cold/warm split: the e2e runs three times in one process.  The first
(cold) run pays the in-process compiles (prewarm launches them
concurrently; uncached shapes cost 1-2 min each through the remote
backend — the persistent compile cache wedges it, see
cli._enable_compile_cache) and is reported as `e2e_cold_wall_s`; warm
is the BEST of two further runs (`e2e_warm_runs_s` records both — the
remote device's throughput varies tens of percent with server load)
and measures the steady state a long-lived deployment sees.

Extras in the same JSON object:
  * kernel_gcups_executed — DP cell updates/s the scan kernel actually
    performs (fused single pass on pure-ACGT input);
  * kernel_gcups_effective — the reference's 2-passes-per-cell accounting
    (SURVEY.md §6), comparable to its 2.1 GCUPS;
  * window_gcups — the candidate-window kernel's rate on resident
    device data (uploading inputs per call would measure the host
    link instead);
  * stage seconds from the profiler (device vs host split), last warm
    run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_E2E_MB_S = 1.316004 / 79.8  # reference MEG3-full (BASELINE.md)
BASELINE_GCUPS = 2.1
REPO = os.path.dirname(os.path.abspath(__file__))


def bench_kernel(eng, rna, seg):
    from fasim_tpu import rules

    eng.setup_scans(rules.scan_list(0, 0))
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

    run()
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        run()
    dt = (time.time() - t0) / reps
    nscans = len(rules.scan_list(0, 0))
    cells = s_batch * nscans * len(rna) * n
    executed = cells / dt / 1e9  # fused: ONE pass runs on pure-ACGT input
    return executed, 2 * executed


def bench_window(eng, rna):
    """Pure device rate of the PRODUCTION forward window kernel (v3,
    64-lane class — the dominant dispatch) on resident inputs, sync via
    a 1-element fetch.  (A microbench that re-uploads MBs per call
    measures the host link, not the kernel.)"""
    import jax

    from fasim_tpu.kernels import tpu as ktpu

    rng = np.random.default_rng(0)
    w = 64
    m = len(rna)
    wcols, fwin = ktpu._WCLASSES[w]
    R = eng._win_R[fwin]
    rows = 16 * R
    G = rows // R
    codes = rng.integers(0, 5, (G, R, max(128, wcols))).astype(np.uint8)
    codes[:, :, w:] = 4
    cd = jax.device_put(codes)
    qp = eng._qwin3[fwin]

    chain = 4  # dispatches per sync: one ~30 ms link RTT would
    # otherwise dominate a ~60 ms kernel run and measure the link

    def run():
        outs = [ktpu._wfwd_call(cd, qp, wcols=wcols, fwin=fwin)
                for _ in range(chain)]
        for o in outs:
            np.asarray(o[0, 0, :1])

    run()
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        run()
    dt = (time.time() - t0) / reps
    return chain * rows * w * m / dt / 1e9


def run_e2e_meg3(p, engines, tpu):
    from fasim_tpu.post.output import print_result
    from fasim_tpu.scan.batched import scan_file_batched

    t0 = time.time()
    records, lnc, _, tlist = scan_file_batched(
        p, engines, batch_pairs=tpu.segments_per_batch,
        max_inflight=tpu.max_inflight)
    first = records[0]
    path = print_result(p, first.species, lnc, tlist, first.chro_tag,
                        len(first.seq), first.start_genome)
    dt = time.time() - t0
    mb = sum(len(r.seq) for r in records) / 1e6
    golden = os.path.join(REPO, "oracle/golden/meg3_full",
                          os.path.basename(path))
    with open(path, "rb") as f1, open(golden, "rb") as f2:
        identical = f1.read() == f2.read()
    return mb, dt, identical


def bench_e2e_meg3():
    from fasim_tpu.cli import make_engine
    from fasim_tpu.config import Params, TpuConfig
    from fasim_tpu.io import fasta
    from fasim_tpu.profiling import STAGES

    out_dir = "/tmp/fasim_bench_out"
    os.makedirs(out_dir, exist_ok=True)
    # output filenames embed the -f1 path (reference quirk): run from the
    # oracle dir so they match the committed goldens
    prev_cwd = os.getcwd()
    os.chdir(os.path.join(REPO, "oracle"))
    try:
        p = Params(file1path="meg3dna.fa", file2path="MEG3.fa",
                   outpath=out_dir)
        tpu = TpuConfig()
        _, rna = fasta.read_rna(p.file2path)
        engines = make_engine(tpu, rna)
        mb, cold_dt, cold_ok = run_e2e_meg3(p, engines, tpu)
        # warm = MEDIAN of three runs (min/max recorded in the artifact):
        # the remote device's throughput varies tens of percent with
        # server load; the median keeps round-over-round comparisons
        # meaningful while the raw samples preserve the spread
        warms = []
        warm_ok = True
        for _ in range(3):
            STAGES.start_run()
            mb, dt, ok = run_e2e_meg3(p, engines, tpu)
            warms.append(dt)
            warm_ok = warm_ok and ok
        warm_dt = float(np.median(warms))
        return (mb / warm_dt, warm_dt, cold_dt, warm_ok and cold_ok,
                STAGES.report(), engines[0], rna, warms)
    finally:
        os.chdir(prev_cwd)


# --- roofline model (VERDICT r4 item 5) -------------------------------------
# v5e VPU: (8, 128) vector lanes per op, ~940 MHz.  Probed on this
# hardware (round 4, scripts/probe_wkernel + sweep_unroll): issue rate
# ~1 vector ALU op/cycle on both scan and window kernels, no dual-issue
# headroom, no packed int16 ALU.  Speed of light for an elementwise DP
# kernel is therefore clock * 1024 / (ops per padded cell).
_VPU_CLOCK = 0.94e9
_VPU_LANES = 8 * 128
# hand-counted vector ops per (column x (rows, lanes) tile) — i.e. per
# padded cell — on the critical inner loop (kernels/tpu.py):
#   scan v2 (fused, fwin 64): code-sel 1 + score 2 + E 3 + diag 2 +
#     tmp 3 + run 1 + prefix 12 + fv 2 + hn 1 + colmax-reduce ~4 +
#     emit 2 + roll 1 ~= 34
#   window v3 fwd (64-class avg, phased prefix ~10.4): 1+2+3+1+3+1+
#     10.4+2+1+3(key)+1 ~= 28
#   window v2 rev (64-class): v3 chain + per-row masks 2 + kmask-key
#     reduce ~6 + emit 2 - key 3 ~= 38
_OPS_PER_CELL = {"scan_v2": 34, "window_v3_fwd": 28, "window_v2_rev": 38}


def roofline(executed_gcups: float, win_gcups: float, eng, rna) -> dict:
    """Measured rates vs the 1-op/cycle VPU model.  sol = speed of
    light at the hand-counted op budget; issue_rate ~1.0 means the
    kernel runs at the machine limit for its op count — the SURVEY §6
    50-300 GCUPS/chip north-star is unreachable on v5e below ~25
    essential ops/cell (see ROADMAP.md round-5 revision)."""
    out = {"vpu_model": "1 vector ALU op/cycle x (8,128) lanes @ 0.94 GHz",
           "kernels": {}}
    m16 = eng.m16
    for name, gcups, mp, extra_pad in (
            ("scan_v2", executed_gcups, getattr(eng, "mp2", m16), 1.0),
            ("window_v3_fwd", win_gcups,
             _ru(eng.win_sstart + 128, 128) if hasattr(eng, "win_sstart")
             else m16, 1.0)):
        ops = _OPS_PER_CELL[name]
        pad = mp / m16 * extra_pad
        sol = _VPU_CLOCK * _VPU_LANES / ops / pad / 1e9
        out["kernels"][name] = {
            "gcups_measured": round(gcups, 1),
            "ops_per_padded_cell_est": ops,
            "lane_padding": round(pad, 3),
            "sol_gcups_at_op_budget": round(sol, 1),
            "implied_issue_ops_per_cycle": round(gcups / sol, 2),
        }
    out["north_star_note"] = (
        "SURVEY §6's 50-300 GCUPS/chip assumed multi-slot issue or a "
        "lower op budget; at the measured 1-op/cycle limit the ceiling "
        "for a ~30-op DP cell is ~30-36 GCUPS/chip on v5e — formally "
        "revised in ROADMAP.md (r5); packed int16 (2x) needs TPU v6")
    return out


def _ru(x, m):
    return (x + m - 1) // m * m


def main() -> int:
    from fasim_tpu.io import fasta

    mb_s, warm, cold, identical, stages, eng, rna, warms = bench_e2e_meg3()
    _, rna_h19 = fasta.read_rna(os.path.join(REPO, "oracle/H19.fa"))
    recs = fasta.read_dna(os.path.join(REPO, "oracle/testDNA.fa"))
    executed, effective = bench_kernel(type(eng)(rna_h19), rna_h19,
                                       recs[0].seq)
    win = bench_window(eng, rna)
    print(json.dumps({
        "metric": "genome_scan_throughput",
        "value": round(mb_s, 4),
        "unit": "Mb/s",
        "vs_baseline": round(mb_s / BASELINE_E2E_MB_S, 2),
        "e2e_warm_wall_s": round(warm, 1),  # median of the runs below
        "e2e_warm_runs_s": [round(w, 1) for w in warms],
        "e2e_warm_best_s": round(min(warms), 1),
        "e2e_cold_wall_s": round(cold, 1),
        "e2e_output_identical": identical,
        "kernel_gcups_executed": round(executed, 2),
        "kernel_gcups_effective": round(effective, 2),
        "kernel_vs_baseline": round(effective / BASELINE_GCUPS, 2),
        "window_gcups": round(win, 2),
        "roofline": roofline(executed, win, eng, rna),
        "stages": {k: v for k, v in stages.items()
                   if not k.startswith("n_")},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
