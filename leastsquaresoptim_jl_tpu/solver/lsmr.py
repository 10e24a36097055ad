"""LSMR solver adapters: preconditioning + damping as operator combinators.

TPU-native counterpart of reference: src/solver/iterative_lsmr.jl.

Gauss-Newton path (reference :179-198):
    solve min ||J dx - y|| with LSMR on A = J P^{-1} (right Jacobi
    preconditioner), then dx = P^{-1} x̃.

Damped LM path (reference :238-259):
    solve min ||[J; diag(sqrt(damp))] dx - [y; 0]|| with btol = 0.5 —
    deliberately inexact inner solves per Wright & Holt 1985
    (reference :200-214). The stacked system is an operator returning a
    (residual_part, damp_part) tuple: never materialized, exactly the
    DampenedMatrix/DampenedVector design (reference :61-109).

The default Jacobi preconditioner is p = 1/sqrt(colsumabs2(J) + damp),
zero where the column norm vanishes (reference :129-141), user-overridable
via ``LSMR(preconditioner=...)`` (reference :143-145, README.md:47).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from .. import config
from ..ops.lsmr_core import lsmr
from ..ops.operators import JacobianOperator


def _default_precond_diag(op: JacobianOperator, damp) -> jnp.ndarray:
    """Jacobi preconditioner diagonal (reference: iterative_lsmr.jl:129-141)."""
    s = op.colnorms2()
    if damp is not None:
        s = s + damp
    return jnp.where(s > 0, 1.0 / jnp.sqrt(s), jnp.zeros_like(s))


def _precond_diag(op, damp, preconditioner: Optional[Callable]):
    if preconditioner is None:
        return _default_precond_diag(op, damp)
    return preconditioner(op, damp)


def solve_gn(
    op: JacobianOperator,
    y: jnp.ndarray,
    *,
    preconditioner: Optional[Callable] = None,
    maxiter: Optional[int] = None,
    conlim: Optional[float] = None,
):
    """Gauss-Newton LSMR solve (reference: iterative_lsmr.jl:179-198).

    Returns (dx, LSMRStats) with stats.mvps = 2 * inner iterations
    (reference: lsmr.jl:236 surfaced at iterative_lsmr.jl:197); the stats
    are the reference's ConvergenceHistory (lsmr.jl:9-14) and the optimizer
    loops surface stats.istop into the result as ``inner_istop``.
    """
    p = _precond_diag(op, None, preconditioner)
    matvec = lambda v: op.matvec(p * v)
    rmatvec = lambda u: p * op.rmatvec(u)
    x0 = jnp.zeros((op.n,), dtype=y.dtype)
    if maxiter is None:
        maxiter = max(op.m, op.n)
    xt, stats = lsmr(
        matvec, rmatvec, y, x0,
        maxiter=maxiter,
        atol=config.LSMR_ATOL,
        btol=config.LSMR_BTOL,
        conlim=config.LSMR_CONLIM if conlim is None else conlim,
    )
    return p * xt, stats


def solve_damped(
    op: JacobianOperator,
    y: jnp.ndarray,
    damp: jnp.ndarray,
    *,
    preconditioner: Optional[Callable] = None,
    maxiter: Optional[int] = None,
    conlim: Optional[float] = None,
):
    """Damped (inexact) LSMR solve for LM (reference: iterative_lsmr.jl:238-259).

    Returns (dx, LSMRStats) — see solve_gn.
    """
    p = _precond_diag(op, damp, preconditioner)
    sqrt_damp = jnp.sqrt(damp)  # reference mutates damp in place at :252

    def matvec(v):
        pv = p * v
        return (op.matvec(pv), sqrt_damp * pv)

    def rmatvec(u):
        uy, ux = u
        return p * (op.rmatvec(uy) + sqrt_damp * ux)

    b = (y, jnp.zeros((op.n,), dtype=y.dtype))
    x0 = jnp.zeros((op.n,), dtype=y.dtype)
    if maxiter is None:
        maxiter = op.m + op.n  # stacked system has m + n rows
    xt, stats = lsmr(
        matvec, rmatvec, b, x0,
        maxiter=maxiter,
        atol=config.LSMR_ATOL,
        btol=config.LSMR_DAMPED_BTOL,  # btol = 0.5: inexact LM
        conlim=config.LSMR_CONLIM if conlim is None else conlim,
    )
    return p * xt, stats
