"""Linear-solver layer: the inner solve for the trust-region step.

Dispatch from solver tags to the two-arity solve protocol the optimizers
consume — the functional counterpart of the reference's two-method ``ldiv!``
protocol (undamped Gauss-Newton + damped LM; reference:
src/solver/dense_qr.jl:30-88, dense_cholesky.jl:29-59,
iterative_lsmr.jl:179-259). Every solve returns ``(dx, mvps, istop)``:
``mvps`` is the reference's matvec accounting, ``istop`` is the inner
LSMR stop reason (reference ConvergenceHistory, src/utils/lsmr.jl:9-14)
surfaced into the result as ``inner_istop`` — ``ISTOP_DIRECT`` (-1) for
the direct QR/Cholesky solvers, which have no iterative stop taxonomy.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.operators import JacobianOperator
from . import block_cholesky as _block_cholesky
from . import cholesky as _cholesky
from . import lsmr as _lsmr
from . import qr as _qr
from .base import (
    LSMR,
    QR,
    AbstractSolver,
    BlockCholesky,
    Cholesky,
    default_solver,
)

__all__ = [
    "QR", "Cholesky", "BlockCholesky", "LSMR", "AbstractSolver",
    "default_solver", "solver_fns", "ISTOP_DIRECT",
]

# inner_istop value for direct (non-iterative) solves.
ISTOP_DIRECT = -1


def solver_fns(tag: AbstractSolver):
    """Return ``(solve_gn(op, y), solve_damped(op, y, damp))`` for a tag;
    each returns ``(dx, mvps, istop)``."""
    direct = jnp.int32(ISTOP_DIRECT)
    if isinstance(tag, QR):
        policy = tag.rank_policy
        return (
            lambda op, y: _qr.solve_gn(op.J, y, rank_policy=policy)
            + (direct,),
            lambda op, y, d: _qr.solve_damped(op.J, y, d) + (direct,),
        )
    if isinstance(tag, Cholesky):
        return (
            lambda op, y: _cholesky.solve_gn(op.J, y) + (direct,),
            lambda op, y, d: _cholesky.solve_damped(op.J, y, d) + (direct,),
        )
    if isinstance(tag, BlockCholesky):
        s, meth = tag.block_size, tag.method
        return (
            lambda op, y: _block_cholesky.solve_gn(op, y, s, meth)
            + (direct,),
            lambda op, y, d: _block_cholesky.solve_damped(op, y, d, s, meth)
            + (direct,),
        )
    if isinstance(tag, LSMR):
        def gn(op, y):
            dx, stats = _lsmr.solve_gn(
                op, y, preconditioner=tag.preconditioner,
                maxiter=tag.maxiter, conlim=tag.conlim,
            )
            return dx, stats.mvps, stats.istop

        def damped(op, y, d):
            dx, stats = _lsmr.solve_damped(
                op, y, d, preconditioner=tag.preconditioner,
                maxiter=tag.maxiter, conlim=tag.conlim,
            )
            return dx, stats.mvps, stats.istop

        return gn, damped
    raise TypeError(f"unknown solver tag {tag!r}")
