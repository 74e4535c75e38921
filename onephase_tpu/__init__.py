"""TPU-native one-phase interior-point solver (JAX / XLA / Pallas).

A ground-up re-design of the capabilities of ohinder/OnePhase.jl (the
one-phase IPM of Hinder & Ye) for TPU hardware: functional core under jit,
MXU-mapped Schur-complement formation and Cholesky, vmapped instance
batching, and mesh-sharded sweeps.
"""

from .config import Params
from .nlp import NLPSpec, CanonNLP, canonicalize
from .solver import one_phase_solve, Result, EvalNaNError

__all__ = [
    "Params", "NLPSpec", "CanonNLP", "canonicalize",
    "one_phase_solve", "Result", "EvalNaNError",
]

__version__ = "0.1.0"
