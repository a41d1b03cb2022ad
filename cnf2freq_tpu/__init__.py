"""cnf2freq_tpu: TPU-native pedigree-HMM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cnettel/cnF2freq (PlantImpute): genotype/haplotype probability computation
and imputation in experimental-cross pedigrees via a hidden Markov model
over inheritance states of a three-generation analysis unit.
"""

from .config import (F2_HAPLO, F2_NOHAPLO, ModelConfig, RuntimeParams,
                     SEXMARKER, UNKNOWN)
from .pedigree import Individual, Pedigree

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent jax compilation cache, on by default.

    The TPU toolchain compiles some of this package's programs in
    minutes (worst measured: a whole-scan program at 400+ s remote);
    the persistent cache reuses them across processes (measured: 195 s
    cold -> 4 s warm for a fresh process).  Opt out with
    CNF2FREQ_NO_COMPILE_CACHE=1; an explicit JAX_COMPILATION_CACHE_DIR
    or prior jax config wins."""
    import os
    if os.environ.get("CNF2FREQ_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir:
            return
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "cnf2freq_tpu", "jax")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          2.0)
    except Exception:       # jax absent/old: the cache is an optimisation
        pass


_enable_compilation_cache()

__all__ = [
    "F2_HAPLO", "F2_NOHAPLO", "ModelConfig", "RuntimeParams",
    "SEXMARKER", "UNKNOWN", "Individual", "Pedigree",
]
