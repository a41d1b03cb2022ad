"""Test configuration: force a virtual 8-device CPU mesh and 64-bit floats.

Must run before any jax import in the test process.

This box exposes one real TPU through an *exclusive* tunnel that the
sitecustomize hook registers into every Python process (claimed at jax
backend init even under JAX_PLATFORMS=cpu); two concurrent jax processes
deadlock on the claim.  Tests are CPU-only, so if the hook's trigger env
is present we re-exec the whole pytest process with it removed — the
fresh interpreter then never touches the tunnel.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


DEMO_DIR = "/root/reference"


@pytest.fixture(scope="session")
def demo_pedigree():
    from cnf2freq_tpu.io import load_plantimpute
    return load_plantimpute(f"{DEMO_DIR}/demoplantimpute.map",
                            f"{DEMO_DIR}/demoplantimpute.ped",
                            f"{DEMO_DIR}/demoplantimpute.gen")
