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

__all__ = [
    "F2_HAPLO", "F2_NOHAPLO", "ModelConfig", "RuntimeParams",
    "SEXMARKER", "UNKNOWN", "Individual", "Pedigree",
]
