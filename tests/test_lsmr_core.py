"""Unit tests for the LSMR core (counterpart of reference src/utils/lsmr.jl)."""

import jax
import jax.numpy as jnp
import numpy as np

from leastsquaresoptim_jl_tpu.ops import from_matrix, lsmr
from leastsquaresoptim_jl_tpu.solver import lsmr as lsmr_solver


def _random_problem(m, n, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.array(rng.normal(size=(m, n)))
    b = jnp.array(rng.normal(size=(m,)))
    return A, b


def test_lsmr_matches_lstsq():
    A, b = _random_problem(50, 10)
    x, stats = lsmr(
        lambda v: A @ v, lambda u: A.T @ u, b, jnp.zeros(10),
        maxiter=50, atol=1e-12, btol=1e-12,
    )
    x_ref = jnp.linalg.lstsq(A, b)[0]
    assert stats.converged
    assert np.allclose(x, x_ref, atol=1e-8)
    assert int(stats.mvps) == 2 * int(stats.iterations)


def test_lsmr_regularized():
    """lam > 0 solves min ||Ax-b||^2 + lam^2||x||^2 (reference lsmr.jl:19)."""
    A, b = _random_problem(40, 8, seed=1)
    lam = 0.7
    x, stats = lsmr(
        lambda v: A @ v, lambda u: A.T @ u, b, jnp.zeros(8),
        maxiter=100, atol=1e-12, btol=1e-12, lam=lam,
    )
    x_ref = jnp.linalg.solve(A.T @ A + lam**2 * jnp.eye(8), A.T @ b)
    assert np.allclose(x, x_ref, atol=1e-8)


def test_lsmr_zero_rhs_exits_immediately():
    A, _ = _random_problem(20, 5)
    x, stats = lsmr(
        lambda v: A @ v, lambda u: A.T @ u, jnp.zeros(20), jnp.zeros(5),
        maxiter=20,
    )
    assert int(stats.iterations) == 0
    assert bool(stats.converged)  # istop == 0 path (reference lsmr.jl:115)
    assert np.allclose(x, 0.0)


def test_lsmr_maxiter_istop7():
    A, b = _random_problem(60, 30, seed=2)
    x, stats = lsmr(
        lambda v: A @ v, lambda u: A.T @ u, b, jnp.zeros(30),
        maxiter=2, atol=0.0, btol=0.0, conlim=0.0,
    )
    assert int(stats.istop) == 7
    assert not bool(stats.converged)


def test_solver_gn_matches_direct():
    """solve_gn with Jacobi preconditioner reproduces the normal-equations
    solution (reference iterative_lsmr.jl:179-198)."""
    A, b = _random_problem(30, 6, seed=3)
    op = from_matrix(A)
    dx, stats = lsmr_solver.solve_gn(op, b)
    mvps = stats.mvps
    x_ref = jnp.linalg.lstsq(A, b)[0]
    assert np.allclose(dx, x_ref, atol=1e-4)
    assert int(mvps) >= 2


def test_solver_damped_matches_augmented():
    """Damped solve targets min ||[A; diag(sqrt d)]x - [b; 0]|| with btol=0.5
    (inexact); verify against the exact augmented solution loosely, and
    exactly when re-solved with tight tolerance."""
    A, b = _random_problem(30, 6, seed=4)
    damp = jnp.linspace(0.5, 2.0, 6)
    op = from_matrix(A)
    dx, _stats = lsmr_solver.solve_damped(op, b, damp)
    x_ref = jnp.linalg.solve(A.T @ A + jnp.diag(damp), A.T @ b)
    # btol=0.5 is deliberately inexact — direction should still be close
    assert np.dot(np.asarray(dx), np.asarray(x_ref)) > 0
    # exact solve via the core with tight tolerances
    sqrt_d = jnp.sqrt(damp)
    x, stats = lsmr(
        lambda v: (A @ v, sqrt_d * v),
        lambda u: A.T @ u[0] + sqrt_d * u[1],
        (b, jnp.zeros(6)),
        jnp.zeros(6),
        maxiter=200, atol=1e-13, btol=1e-13,
    )
    assert np.allclose(x, x_ref, atol=1e-8)


def test_lsmr_under_jit_and_vmap():
    A, b = _random_problem(25, 5, seed=5)
    B = jnp.stack([b, 2 * b, -b])

    @jax.jit
    def run(bb):
        return lsmr(
            lambda v: A @ v, lambda u: A.T @ u, bb, jnp.zeros(5),
            maxiter=30, atol=1e-12, btol=1e-12,
        )[0]

    xs = jax.vmap(run)(B)
    x_ref = jnp.linalg.lstsq(A, B.T)[0].T
    assert np.allclose(xs, x_ref, atol=1e-6)
