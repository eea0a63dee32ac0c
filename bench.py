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
    """Pure device rate of the window kernel (inputs resident, sync via
    a 1-element fetch).  The old version re-uploaded ~3 MB per call and
    measured the host link, not the kernel."""
    import jax

    from fasim_tpu.kernels import tpu as ktpu

    rng = np.random.default_rng(0)
    rows, w = 4096, 197
    m = len(rna)
    wcols, fwin = ktpu._WCLASSES[ktpu._WWIN]
    R = eng._win_R[fwin]
    G = rows // R
    codes = rng.integers(0, 5, (G, R, ktpu._WWIN)).astype(np.uint8)
    codes[:, :, w:] = 4
    rmeta = np.zeros((G, R, 128), np.int32)
    rmeta[:, :, 1] = (m + 15) // 16 * 16
    cd = jax.device_put(codes)
    md = jax.device_put(rmeta)
    qrow = eng._qwin2[(False, fwin)]

    def run():
        out = ktpu._wscan_call(cd, md, qrow, m=m, sstart=eng.win_sstart,
                               fwin=fwin, wcols=wcols)
        np.asarray(out[0, 0, :1])

    run()
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        run()
    dt = (time.time() - t0) / reps
    return rows * w * m / dt / 1e9


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
        "stages": {k: v for k, v in stages.items()
                   if not k.startswith("n_")},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
