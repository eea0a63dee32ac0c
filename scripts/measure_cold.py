"""One-shot CLI cold-start measurement: fresh process, MEG3-full.

Cold is defined as: fresh Python process, whatever state the remote
compile server's cache is in (the only definition available — the
server cache cannot be cleared from here; BENCH artifacts record the
same).  Compares output against the committed golden.

    python scripts/measure_cold.py [--round=4]
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    rnd = next((a.split("=")[1] for a in sys.argv
                if a.startswith("--round=")), None)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    results = {}
    for prewarm in ("1", "0"):
        env["FASIM_PREWARM"] = prewarm
        with tempfile.TemporaryDirectory() as td:
            t0 = time.time()
            subprocess.run(
                [sys.executable, "-m", "fasim_tpu.cli", "-f1",
                 "meg3dna.fa", "-f2", "MEG3.fa", "-O", td + "/"],
                cwd=os.path.join(REPO, "oracle"), env=env, check=True,
                capture_output=True, timeout=3000)
            dt = time.time() - t0
            golden = os.path.join(REPO, "oracle/golden/meg3_full")
            ok = all(
                open(os.path.join(td, f), "rb").read() ==
                open(os.path.join(golden, f), "rb").read()
                for f in os.listdir(td))
            results[f"cold_wall_s_prewarm{prewarm}"] = round(dt, 1)
            results[f"identical_prewarm{prewarm}"] = ok
            print(f"prewarm={prewarm}: {dt:.1f}s identical={ok}",
                  flush=True)
    print(json.dumps(results))
    if rnd:
        with open(os.path.join(REPO, f"COLD_r{rnd}.json"), "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
