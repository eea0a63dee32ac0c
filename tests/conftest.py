import os
import subprocess
import sys

# Force the CPU backend with a virtual 8-device mesh for all tests: multi-chip
# sharding is validated without TPU hardware (SURVEY.md §4).  The axon
# sitecustomize initializes the TPU backend before conftest runs, so the
# backends must be cleared and re-pinned to CPU — tests must not depend on
# (or spend) TPU time.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.extend.backend as _jeb  # noqa: E402

_jeb.clear_backends()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

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


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    """Tests must run on the virtual CPU mesh, never on TPU time."""
    import jax

    assert jax.default_backend() == "cpu", jax.devices()
    assert len(jax.devices()) == 8
