"""Normal-equations Cholesky linear solver.

TPU-native counterpart of reference: src/solver/dense_cholesky.jl.

Gauss-Newton solve (reference :29-35):  (J'J) dx = J'y
Damped solve      (reference :43-59):  (J'J + diag(damp)) dx = J'y

The Gram matrix J'J and rhs J'y come from the fused Pallas Gram kernel
(ops/gram.py) — the reference's two ``mul!`` BLAS calls fused into one
HBM pass. The reference uses LAPACK's *pivoted* Cholesky (pstrf) on the
possibly-singular Gauss-Newton system (reference :33); XLA's Cholesky is
unpivoted, so a jittered retry (taken via lax.cond only when the plain
factorization produces non-finite values) covers rank deficiency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..ops.gram import gram_and_rhs
from ..ops.linalg import UNROLLED_SOLVE_MAX_N, unrolled_chol_solve


def _chol_solve(gram, rhs):
    if gram.shape[-1] <= UNROLLED_SOLVE_MAX_N:
        # Small parameter counts (the curve-fit regime) unroll into VPU
        # scalar-vector ops — batched LAPACK-style kernels on (B, n, n) with
        # tiny n are ~20x slower under vmap (see ops/linalg.py).
        return unrolled_chol_solve(gram, rhs)
    L = jax.scipy.linalg.cholesky(gram, lower=True)
    z = solve_triangular(L, rhs, lower=True)
    return solve_triangular(L.T, z, lower=False)


def _solve_spd(gram, rhs):
    """Cholesky solve with a jittered fallback for semidefinite systems."""
    dx = _chol_solve(gram, rhs)
    ok = jnp.all(jnp.isfinite(dx))

    def fallback():
        n = gram.shape[0]
        diag_mean = jnp.trace(gram) / n
        eps = jnp.finfo(gram.dtype).eps
        jitter = jnp.maximum(diag_mean, 1.0) * eps * 100.0
        return _chol_solve(gram + jitter * jnp.eye(n, dtype=gram.dtype), rhs)

    return jax.lax.cond(ok, lambda: dx, fallback)


def solve_gn(J, y):
    """(J'J) dx = J'y (reference: dense_cholesky.jl:29-35). mvps = 1."""
    gram, rhs = gram_and_rhs(J, y)
    return _solve_spd(gram, rhs), jnp.int32(1)


def solve_damped(J, y, damp):
    """(J'J + diag(damp)) dx = J'y (reference: dense_cholesky.jl:43-59). mvps = 1."""
    gram, rhs = gram_and_rhs(J, y)
    gram = gram + jnp.diag(damp)
    return _solve_spd(gram, rhs), jnp.int32(1)
