"""Optimizer tags and default-selection rules (reference: src/types.jl:89-127)."""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..solver.base import LSMR, AbstractSolver, default_solver


class AbstractOptimizer:
    solver: Optional[AbstractSolver]


@dataclasses.dataclass(frozen=True)
class Dogleg(AbstractOptimizer):
    """Powell dogleg trust-region optimizer tag (reference: src/optimizer/dogleg.jl)."""

    solver: Optional[AbstractSolver] = None


@dataclasses.dataclass(frozen=True)
class LevenbergMarquardt(AbstractOptimizer):
    """Levenberg-Marquardt optimizer tag (reference: src/optimizer/levenberg_marquardt.jl).

    ``geodesic=True`` enables geodesic acceleration (Transtrum & Sethna
    2012; beyond-reference): each iteration adds the half second-order
    correction ``a/2`` to the step, where ``a`` solves the same damped
    system with the directional second derivative ``f''[v, v]`` as rhs
    (one forward-over-forward JVP of the residual — exact, no finite
    differences). The correction is dropped — never the step — when
    ``||a|| > GEODESIC_ALPHA * ||v||`` (config.py), so every accepted
    step is at least as model-consistent as plain LM. Pays on "sloppy"
    models (exponential sums, NIST-class curve fits) where the canonical
    LM path crawls along a curved valley floor."""

    solver: Optional[AbstractSolver] = None
    geodesic: bool = False


def resolve(optimizer: Optional[AbstractOptimizer], problem):
    """Apply the reference default rules (src/types.jl:113-127).

    Materialized (dense) Jacobian -> QR solver; matrix-free -> LSMR.
    Solver LSMR -> LevenbergMarquardt; otherwise Dogleg.
    Returns a fully-specified optimizer with a non-None solver.
    """
    solver = default_solver(
        optimizer.solver if optimizer is not None else None, problem
    )
    if optimizer is None:
        if isinstance(solver, LSMR):
            return LevenbergMarquardt(solver)
        return Dogleg(solver)
    return dataclasses.replace(optimizer, solver=solver)
