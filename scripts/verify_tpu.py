"""Hardware verification: kernel bit-parity + full end-to-end byte-parity
matrix against the committed oracle goldens, on the real TPU backend.

Run directly on a machine with a TPU attached (no JAX_PLATFORMS override):

    python scripts/verify_tpu.py            # kernel check + fast e2e cases
    python scripts/verify_tpu.py --full     # adds MEG3-532rec, NEAT1, MALAT1

The fast cases take ~1 min (plus first-compile); --full adds the
532-record MEG3 genome scan (~1.5 min) and the long-query families.
"""
import filecmp
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "oracle")
GOLDEN = os.path.join(ORACLE, "golden")

FAST_CASES = [
    ("h19_lg40", "testDNA.fa", "H19.fa", ["-lg", "40"]),
    ("h19_default", "testDNA.fa", "H19.fa", []),
    ("meg3_sub3", "meg3sub3.fa", "MEG3.fa", []),
    ("h19F_trunc", "testDNAt.fa", "H19t.fa", ["-F", "-lg", "40"]),
    ("neat1t", "testDNA.fa", "NEAT1t.fa", []),
]
FULL_CASES = [
    ("meg3_full", "meg3dna.fa", "MEG3.fa", []),
    ("neat1", "testDNA.fa", "NEAT1.fa", []),
    ("malat1", "testDNA.fa", "MALAT1.fa", []),
    # full (non-truncated) -F SIM demo, ~90 s host engine
    ("h19_F", "testDNA.fa", "H19.fa", ["-F", "-lg", "40"]),
]


RESULTS: dict = {"cases": {}}


def kernel_check() -> bool:
    """Pallas TPU kernel bit-parity vs the NumPy golden engine (scan +
    threshold + candidate-window passes)."""
    import jax

    from fasim_tpu import rules
    from fasim_tpu.io import fasta
    from fasim_tpu.kernels.batch_np import numpy_engine
    from fasim_tpu.kernels.tpu import TpuScanEngine
    from fasim_tpu.kernels.xla import XlaScanEngine

    print("devices:", jax.devices())
    RESULTS["devices"] = str(jax.devices())
    _, rna = fasta.read_rna(os.path.join(ORACLE, "H19.fa"))
    recs = fasta.read_dna(os.path.join(ORACLE, "testDNA.fa"))
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
        gcups = cells / dt / 1e9
        print(f"kernel: seg len={len(seg)} equal={eq} warm={dt:.3f}s "
              f"({gcups:.1f} GCUPS)")
        RESULTS["cases"][f"scan_kernel_len{len(seg)}"] = {
            "identical": bool(eq), "dt": round(dt, 3),
            "gcups": round(gcups, 1)}
    # window pass: TPU hardware vs the CPU XLA reference implementation
    rng = np.random.default_rng(0)
    eng.setup_scans(rules.scan_list(0, 0))
    eng.setup_windows(rna)
    cpu = XlaScanEngine(rna)
    cpu.setup_windows(rna)
    rows = 300
    codes = rng.integers(0, 5, (rows, 256)).astype(np.uint8)
    rlens = rng.integers(8, 197, rows).astype(np.int32)
    offs = rng.integers(0, len(rna) // 2, rows).astype(np.int32)
    terms = np.where(rng.random(rows) < 0.5, -1,
                     rng.integers(5, 90, rows)).astype(np.int32)
    mreals = (len(rna) + rng.integers(0, 16, rows)).astype(np.int32)
    for rev in (False, True):
        a = eng.window_pass(codes, offs, terms, rlens, mreals, rev=rev)
        b = np.asarray(cpu.window_pass(codes, offs, terms, rlens, mreals,
                                       rev=rev))
        eq = np.array_equal(a, b)
        ok &= eq
        print(f"window rev={rev}: equal={eq}")
        RESULTS["cases"][f"window_pass_rev{int(rev)}"] = {
            "identical": bool(eq)}
    return ok


def e2e_case(case: str, f1: str, f2: str, extra: list[str]) -> bool:
    golden_dir = os.path.join(GOLDEN, case)
    with tempfile.TemporaryDirectory() as td:
        shutil.copy(os.path.join(ORACLE, f1), td)
        shutil.copy(os.path.join(ORACLE, f2), td)
        out = os.path.join(td, "out")
        os.mkdir(out)
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "fasim_tpu.cli", "-f1", f1, "-f2", f2,
             "-O", "out/", *extra],
            cwd=td, env=env, capture_output=True, timeout=1800)
        dt = time.time() - t0
        if r.returncode != 0:
            print(f"e2e {case}: CLI failed\n{r.stderr.decode()[-500:]}")
            RESULTS["cases"][case] = {"identical": False, "error": "CLI"}
            return False
        expected = sorted(f for f in os.listdir(golden_dir)
                          if not f.startswith("stdout"))
        produced = sorted(os.listdir(out))
        if produced != expected:
            print(f"e2e {case}: file set differs: {produced} vs {expected}")
            RESULTS["cases"][case] = {"identical": False,
                                      "error": "fileset"}
            return False
        for name in expected:
            if not filecmp.cmp(os.path.join(out, name),
                               os.path.join(golden_dir, name), shallow=False):
                print(f"e2e {case}: {name} DIFFERS")
                RESULTS["cases"][case] = {"identical": False,
                                          "error": name}
                return False
        print(f"e2e {case}: byte-identical ({dt:.1f}s)")
        RESULTS["cases"][case] = {"identical": True, "dt": round(dt, 1)}
    return True


def main() -> int:
    full = "--full" in sys.argv
    rnd = next((a.split("=")[1] for a in sys.argv
                if a.startswith("--round=")), "NN")
    ok = kernel_check()
    for case in FAST_CASES + (FULL_CASES if full else []):
        ok &= e2e_case(*case)
    RESULTS["pass"] = bool(ok)
    artifact = os.path.join(REPO, f"VERIFY_r{rnd}.json")
    with open(artifact, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(("PASS" if ok else "FAIL") + f" -> {artifact}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
