import os
import subprocess
import sys

# Force the CPU backend with a virtual 8-device mesh for all tests: multi-chip
# sharding is validated without TPU hardware (SURVEY.md §4).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "oracle")
REFERENCE = "/root/reference"


def oracle_bin(name: str) -> str:
    """Path to an oracle binary, building the oracle tools on demand."""
    path = os.path.join(ORACLE, "bin", name)
    if not os.path.exists(path):
        subprocess.run(["sh", os.path.join(ORACLE, "build.sh")], check=True,
                       capture_output=True)
    return path


@pytest.fixture(scope="session")
def harness():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    return oracle_bin("harness")
