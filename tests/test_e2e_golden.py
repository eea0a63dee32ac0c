"""End-to-end byte-parity: full pipeline vs reference golden outputs."""

import filecmp
import os
import shutil
import subprocess
import sys

import pytest

from conftest import ORACLE, REFERENCE

GOLDEN = os.path.join(ORACLE, "golden")


@pytest.mark.parametrize("case,extra", [
    ("h19_lg40", ["-lg", "40"]),
    ("h19_default", []),
])
def test_h19_demo_byte_identical(tmp_path, case, extra):
    golden_dir = os.path.join(GOLDEN, case)
    shutil.copy(os.path.join(ORACLE, "testDNA.fa"), tmp_path)
    shutil.copy(os.path.join(ORACLE, "H19.fa"), tmp_path)
    out = tmp_path / "out"
    out.mkdir()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(ORACLE)
    subprocess.run(
        [sys.executable, "-m", "fasim_tpu.cli", "-f1", "testDNA.fa",
         "-f2", "H19.fa", "-O", "out/", *extra],
        cwd=tmp_path, env=env, check=True, capture_output=True, timeout=600)
    produced = sorted(os.listdir(out))
    expected = sorted(f for f in os.listdir(golden_dir) if f != "stdout.txt")
    assert produced == expected
    for name in expected:
        assert filecmp.cmp(out / name, os.path.join(golden_dir, name),
                           shallow=False), f"{case}/{name} differs"
