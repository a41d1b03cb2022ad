"""Test configuration: force a virtual 8-device CPU mesh and 64-bit floats.

Must run before any backend initialization in the test process.

This box exposes one real TPU through an *exclusive* tunnel whose PJRT
plugin the sitecustomize hook registers into every Python process (the
claim happens at backend init); two concurrent jax processes deadlock on
the claim.  Tests are CPU-only, so we deregister the plugin before any
backend initializes and pin jax to the cpu platform.  (An earlier
version re-exec'd pytest with the hook's trigger env removed, but the
execve inherits pytest's fd-capture redirection — stdout of the fresh
process lands in pytest's unlinked capture tempfile and every report
line is lost.)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may already have imported jax (latching jax_platforms to
# "axon") and registered the tunnel-backed plugin: override the config
# and drop the factory so no test path can touch the exclusive tunnel.
jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
except Exception:  # jax internals moved: JAX_PLATFORMS=cpu still guards
    pass

jax.config.update("jax_enable_x64", True)

# persistent compilation cache: repeated suite runs skip the (dominant)
# XLA-CPU compile cost of the big jitted scan programs
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CNF2FREQ_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


DEMO_DIR = "/root/reference"


@pytest.fixture(scope="session")
def demo_pedigree():
    from cnf2freq_tpu.io import load_plantimpute
    return load_plantimpute(f"{DEMO_DIR}/demoplantimpute.map",
                            f"{DEMO_DIR}/demoplantimpute.ped",
                            f"{DEMO_DIR}/demoplantimpute.gen")
