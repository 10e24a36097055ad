"""Normal-equations Cholesky linear solver.

TPU-native counterpart of reference: src/solver/dense_cholesky.jl.

Gauss-Newton solve (reference :29-35):  (J'J) dx = J'y
Damped solve      (reference :43-59):  (J'J + diag(damp)) dx = J'y

The Gram matrix J'J and rhs J'y come from the fused Pallas Gram kernel
(ops/gram.py) — the reference's two ``mul!`` BLAS calls fused into one
HBM pass. The reference uses LAPACK's *pivoted* Cholesky (pstrf) on the
possibly-singular Gauss-Newton system (reference :33); XLA's Cholesky is
unpivoted, so a jittered retry (taken via lax.cond) covers rank deficiency.
The retry triggers on *either* a non-finite solve (exactly singular) or a
scale-invariant pivot *survival* test (nearly singular: the unpivoted
factorization then succeeds but returns a finite garbage step that pivoted
pstrf would have truncated). The test compares each pivot to its own
original diagonal entry — L_ii^2 / G_ii > 100 n eps — i.e. the pivot of
the diagonally equilibrated matrix, so bad column *scaling* alone never
trips it (see _solve_spd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..ops.gram import gram_and_rhs
from ..ops.linalg import (
    UNROLLED_SOLVE_MAX_N,
    scaled_tikhonov_jitter,
    spd_chol_solve,
    unrolled_chol_solve_with_diag,
)


def _chol_solve(gram, rhs):
    # size-dispatched SPD solve shared with the QR fallback (ops/linalg.py)
    return spd_chol_solve(gram, rhs)


def _chol_solve_with_diag(gram, rhs):
    """Like _chol_solve but also returns diag(L) for the conditioning check."""
    if gram.shape[-1] <= UNROLLED_SOLVE_MAX_N:
        return unrolled_chol_solve_with_diag(gram, rhs)
    L = jax.scipy.linalg.cholesky(gram, lower=True)
    z = solve_triangular(L, rhs, lower=True)
    return solve_triangular(L.T, z, lower=False), jnp.diagonal(L)


def _solve_spd(gram, rhs):
    """Cholesky solve with a jittered fallback for (near-)semidefinite
    systems — the unpivoted stand-in for the reference's pivoted pstrf
    (dense_cholesky.jl:33)."""
    n = gram.shape[-1]
    eps = jnp.finfo(gram.dtype).eps
    d = jnp.diagonal(gram)
    dx, ldiag = _chol_solve_with_diag(gram, rhs)
    # Scale-invariant pivot test: L_ii^2 / G_ii is the fraction of the
    # diagonal surviving elimination (= the pivot of the diagonally
    # equilibrated matrix). Near-singularity drives it to ~eps for some i;
    # mere bad column *scaling* (powell_badly_scaled: column norms apart by
    # 1e8) leaves it O(1), and Cholesky itself is insensitive to diagonal
    # scaling, so those stay on the fast exact path. The 100x slack keeps
    # merely-ill-conditioned NIST-class systems exact too.
    tiny = jnp.asarray(jnp.finfo(gram.dtype).tiny, gram.dtype)
    survival = (ldiag * ldiag) / jnp.maximum(d, tiny)
    ok = jnp.all(jnp.isfinite(dx)) & (jnp.min(survival) > 100.0 * n * eps)

    def fallback():
        jitter = scaled_tikhonov_jitter(gram)
        return _chol_solve(gram + jnp.diag(jitter), rhs)

    return jax.lax.cond(ok, lambda: dx, fallback)


def solve_spd_system(gram, rhs, damp=None):
    """Solve (G [+ diag(damp)]) dx = rhs with the pivot-survival fallback.

    Gram-space entry for the fused-gram optimizer schedules (the carry
    holds G = J'J and rhs = J'r directly; see
    optimizer/levenberg_marquardt.py module docstring). Same numerics as
    solve_gn/solve_damped minus the Gram formation.
    """
    if damp is not None:
        n = gram.shape[-1]
        gram = gram + damp[..., None, :] * jnp.eye(n, dtype=gram.dtype)
    return _solve_spd(gram, rhs)


def solve_gn(J, y):
    """(J'J) dx = J'y (reference: dense_cholesky.jl:29-35). mvps = 1."""
    gram, rhs = gram_and_rhs(J, y)
    return _solve_spd(gram, rhs), jnp.int32(1)


def solve_damped(J, y, damp):
    """(J'J + diag(damp)) dx = J'y (reference: dense_cholesky.jl:43-59). mvps = 1."""
    gram, rhs = gram_and_rhs(J, y)
    gram = gram + jnp.diag(damp)
    return _solve_spd(gram, rhs), jnp.int32(1)
