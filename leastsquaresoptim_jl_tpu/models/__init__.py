"""Built-in model families and canonical test problems.

  * curves     — curve_fit / curve_fit_batch regression front end + CURVES zoo
  * separable  — variable projection (VarPro) structures for the zoo
  * nist       — the 16 NIST StRD certified datasets + their models
  * minpack    — the 14 More-Garbow-Hillstrom (MINPACK hybrj) test problems

The reference ships these only inside its test suite
(test/nonlinearsolvers.jl, test/nonlinearfitting.jl); here they are part of
the framework so users and benchmarks can import them directly.
"""

from .curves import CURVES, curve_fit, curve_fit_batch, gridded_model
from .init import guess_exp_sum, guess_gauss_sum, guess_p0
from .minpack import cholesky_suite, full_suite
from .nist import DATASETS as NIST_DATASETS
from .nist import MODELS as NIST_MODELS
from .nist import NIST_SEPARABLE
from .separable import (
    SEPARABLE,
    SeparableModel,
    exp_sum_separable,
    gauss_sum_separable,
    gridded_separable,
)

__all__ = [
    "curve_fit",
    "curve_fit_batch",
    "guess_exp_sum",
    "guess_gauss_sum",
    "guess_p0",
    "CURVES",
    "gridded_model",
    "SEPARABLE",
    "SeparableModel",
    "gridded_separable",
    "exp_sum_separable",
    "gauss_sum_separable",
    "full_suite",
    "cholesky_suite",
    "NIST_DATASETS",
    "NIST_MODELS",
    "NIST_SEPARABLE",
]
