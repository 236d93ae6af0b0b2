import os

# A virtual 8-device CPU mesh so multi-chip sharding logic is exercised
# without TPU hardware.  JAX_PLATFORMS is only a default: on
# relay-attached machines the site hook force-selects the relay
# platform via jax.config at interpreter startup, so TPU-gated tests
# run live when a chip is healthy.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# A degraded relay wedges the first backend init of EVERY process (the
# site hook registers the relay platform regardless of JAX_PLATFORMS).
# Probe it in a subprocess and demote this pytest run to CPU-only jax
# if it hangs — otherwise collection itself deadlocks on the first
# module-level on_tpu_backend() gate.
from miniprot_tpu.sysutil import ensure_responsive_backend

ensure_responsive_backend()

import pathlib
import subprocess

import pytest

# stabilize test timing on THP-defrag-slow hosts (see sysutil helper)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

# never auto-attach to a machine-wide device daemon from generic tests:
# daemon behavior is covered by test_daemon.py, which points the engine
# at its own private socket
os.environ.setdefault("MINIPROT_TPU_DAEMON", "0")

REF_DIR = pathlib.Path("/root/reference")
REF_BIN = pathlib.Path("/tmp/refbuild/miniprot")
GENOME = REF_DIR / "test" / "DPP3-hs.gen.fa.gz"
QUERY = REF_DIR / "test" / "DPP3-mm.pep.fa.gz"
GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def dpp3_files():
    if not GENOME.exists():
        pytest.skip("reference DPP3 fixtures not available")
    return str(GENOME), str(QUERY)


@pytest.fixture(scope="session")
def ref_binary():
    """Build the reference binary in /tmp if sources are available."""
    if REF_BIN.exists():
        return str(REF_BIN)
    if not REF_DIR.exists():
        pytest.skip("reference sources not available")
    subprocess.run(
        f"mkdir -p /tmp/refbuild && cp -r {REF_DIR}/* /tmp/refbuild/ && "
        "make -C /tmp/refbuild -j8 >/dev/null 2>&1",
        shell=True, check=True)
    return str(REF_BIN)
