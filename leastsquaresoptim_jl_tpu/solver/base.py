"""Solver tags and default-selection rules.

Mirrors the reference's solver tag types and defaults
(reference: src/types.jl:78-127):

  QR()       — dense QR solve of min ||J dx - y|| (stacked [J; diag(sqrt d)]
               for the damped LM system).
  Cholesky() — normal-equations solve of (J'J [+ diag(d)]) dx = J'y.
  LSMR(...)  — matrix-free Golub-Kahan iteration with a Jacobi
               (column-norm) preconditioner, user-overridable.

Default rules (reference: src/types.jl:113-127):
  * materialized (dense) Jacobian  -> QR
  * matrix-free problem            -> LSMR
  * solver LSMR -> default optimizer LevenbergMarquardt, else Dogleg.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


class AbstractSolver:
    pass


@dataclasses.dataclass(frozen=True)
class QR(AbstractSolver):
    """Dense QR solver tag (reference: src/solver/dense_qr.jl).

    The reference uses LAPACK's *column-pivoted* QR (geqp3); XLA's QR is
    unpivoted, so rank-deficient systems are covered by a jittered
    normal-equations fallback taken only when the triangular solve produces
    non-finite values (see solver/qr.py). This divergence is intentional and
    gated by the rank-deficient factor-model test.
    """


@dataclasses.dataclass(frozen=True)
class Cholesky(AbstractSolver):
    """Normal-equations Cholesky solver tag (reference: src/solver/dense_cholesky.jl)."""


@dataclasses.dataclass(frozen=True)
class LSMR(AbstractSolver):
    """Matrix-free LSMR solver tag (reference: src/solver/iterative_lsmr.jl).

    ``preconditioner`` — optional callable ``(op, damp) -> p`` (the
    current linear operator and the damping vector, or ``None`` on the
    undamped Gauss-Newton path) returning the *diagonal* of a right
    preconditioner P^{-1} (the solver iterates on A P^{-1}; reference:
    PreconditionedMatrix, iterative_lsmr.jl:12-51). Defaults to the Jacobi preconditioner
    1/sqrt(colsumabs2(J) + damp) (reference: iterative_lsmr.jl:129-141).
    ``maxiter`` — optional cap on inner iterations (default max(m, n),
    reference: src/utils/lsmr.jl:55).
    ``conlim`` — condition-number limit triggering istop=3 (default 1e8,
    reference: src/utils/lsmr.jl:54); the inner stop reason is surfaced in
    the result as ``inner_istop`` (reference ConvergenceHistory,
    src/utils/lsmr.jl:9-14).
    """

    preconditioner: Optional[Callable] = None
    maxiter: Optional[int] = None
    conlim: Optional[float] = None

    def __hash__(self):
        return hash((LSMR, self.preconditioner, self.maxiter, self.conlim))


def default_solver(solver: Optional[AbstractSolver], problem) -> AbstractSolver:
    """Reference: src/types.jl:113-121 — dense Jacobian -> QR, anything else
    (sparse, matrix-free) -> LSMR; QR with a sparse Jacobian is rejected
    (reference: src/types.jl:114-118), and so is Cholesky (the reference has
    no sparse-Cholesky method either, see SURVEY.md C9)."""
    sparse = getattr(problem, "jacobian_is_sparse", False)
    if solver is not None:
        if isinstance(solver, QR) and not problem.materialize_jacobian:
            raise ValueError(
                "solver QR() is not available for matrix-free problems. "
                "Choose LSMR()"
            )
        if isinstance(solver, Cholesky) and not problem.materialize_jacobian:
            raise ValueError(
                "solver Cholesky() is not available for matrix-free problems. "
                "Choose LSMR()"
            )
        if isinstance(solver, (QR, Cholesky)) and sparse:
            raise ValueError(
                f"solver {type(solver).__name__}() is not available for "
                "sparse Jacobians. Choose LSMR()"
            )
        return solver
    if problem.materialize_jacobian and not sparse:
        return QR()
    return LSMR()
