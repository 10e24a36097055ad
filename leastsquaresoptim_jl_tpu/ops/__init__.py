"""Numeric kernels: fused Gram (Pallas), LSMR core, operators, utilities."""

from .gram import gram_and_rhs
from .linalg import (
    clip_step_to_bounds,
    colsumabs2,
    maxabs_projected_gradient,
    sumabs2,
    wdot,
    wnorm,
)
from .lsmr_core import LSMRStats, lsmr
from .operators import (
    JacobianOperator,
    for_problem,
    from_linearization,
    from_matrix,
    from_user,
)
from .sparse import colsumabs2_bcoo, sparse_jacobian

__all__ = [
    "sparse_jacobian",
    "colsumabs2_bcoo",
    "gram_and_rhs",
    "colsumabs2",
    "wdot",
    "wnorm",
    "sumabs2",
    "clip_step_to_bounds",
    "maxabs_projected_gradient",
    "lsmr",
    "LSMRStats",
    "JacobianOperator",
    "from_matrix",
    "for_problem",
    "from_linearization",
    "from_user",
]
