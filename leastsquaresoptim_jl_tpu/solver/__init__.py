"""Linear-solver layer: the inner solve for the trust-region step.

Dispatch from solver tags to the two-arity solve protocol the optimizers
consume — the functional counterpart of the reference's two-method ``ldiv!``
protocol (undamped Gauss-Newton + damped LM; reference:
src/solver/dense_qr.jl:30-88, dense_cholesky.jl:29-59,
iterative_lsmr.jl:179-259). Every solve returns ``(dx, mvps)``.
"""

from __future__ import annotations

from ..ops.operators import JacobianOperator
from . import cholesky as _cholesky
from . import lsmr as _lsmr
from . import qr as _qr
from .base import LSMR, QR, AbstractSolver, Cholesky, default_solver

__all__ = [
    "QR", "Cholesky", "LSMR", "AbstractSolver", "default_solver", "solver_fns",
]


def solver_fns(tag: AbstractSolver):
    """Return ``(solve_gn(op, y), solve_damped(op, y, damp))`` for a tag."""
    if isinstance(tag, QR):
        return (
            lambda op, y: _qr.solve_gn(op.J, y),
            lambda op, y, d: _qr.solve_damped(op.J, y, d),
        )
    if isinstance(tag, Cholesky):
        return (
            lambda op, y: _cholesky.solve_gn(op.J, y),
            lambda op, y, d: _cholesky.solve_damped(op.J, y, d),
        )
    if isinstance(tag, LSMR):
        return (
            lambda op, y: _lsmr.solve_gn(
                op, y, preconditioner=tag.preconditioner, maxiter=tag.maxiter
            ),
            lambda op, y, d: _lsmr.solve_damped(
                op, y, d, preconditioner=tag.preconditioner, maxiter=tag.maxiter
            ),
        )
    raise TypeError(f"unknown solver tag {tag!r}")
