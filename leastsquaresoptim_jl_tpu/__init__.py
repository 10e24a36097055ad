"""leastsquaresoptim_jl_tpu — a TPU-native nonlinear least-squares framework.

A from-scratch JAX/XLA/Pallas redesign with the capabilities of
LeastSquaresOptim.jl (reference mounted read-only at /root/reference):
Levenberg-Marquardt and Powell-dogleg trust-region optimizers, each
parameterizable by dense QR, normal-equations Cholesky, or matrix-free LSMR
inner solvers; forward-mode-AD / central-difference / user Jacobians;
matrix-free JVP/VJP operation; box constraints with a projected-gradient KKT
convergence test (plus an active-set refinement in both optimizers that
the reference lacks);
Optim-style results and traces — and TPU-first additions: jit/vmap batched
fits, residual-row sharding over device meshes with psum-reduced Gram
systems, distributed LSMR, a fused Pallas Gram kernel, sparse BCOO
Jacobians with compressed colored AD, structured (pytree) parameters,
robust losses, multi-start solving, curve-fit front end, and
checkpoint/resume.

Public surface is a superset of the reference exports
(reference: src/LeastSquaresOptim.jl:16-46); see docs/PARITY.md for the
line-by-line mapping.
"""

from .api import optimize, optimize_problem, polish, solve
from .batch import solve_batch
from .optimizer.base import Dogleg, LevenbergMarquardt
from .optimizer.common import Options
from .ops.sparse import sparse_jacobian
from .problem import (
    LeastSquaresProblem,
    least_squares_problem,
    matrix_free_problem,
)
from .result import (
    IsFiniteError,
    LeastSquaresResult,
    OptimizationState,
    OptimizationTrace,
    converged,
)
from .solver.base import LSMR, QR, BlockCholesky, Cholesky
from . import models
from .models.curves import curve_fit, curve_fit_batch
from .loss import LOSSES, robustify
from .multistart import best_of_raw, latin_hypercube_starts, optimize_multistart

__version__ = "0.1.0"

__all__ = [
    "optimize",
    "polish",
    "optimize_problem",
    "solve",
    "solve_batch",
    "LeastSquaresProblem",
    "least_squares_problem",
    "matrix_free_problem",
    "LeastSquaresResult",
    "OptimizationState",
    "OptimizationTrace",
    "IsFiniteError",
    "converged",
    "Dogleg",
    "LevenbergMarquardt",
    "QR",
    "Cholesky",
    "BlockCholesky",
    "LSMR",
    "Options",
    "sparse_jacobian",
    "models",
    "curve_fit",
    "curve_fit_batch",
    "optimize_multistart",
    "best_of_raw",
    "latin_hypercube_starts",
    "robustify",
    "LOSSES",
]
