"""BlockCholesky: block-tridiagonal direct normal-equations solver.

The TPU-native counterpart of the reference's sparse-CSC direct
factorizations (reference: test/nonlinearsolvers.jl:539-570) for banded
Grams: exact structured-probe Gram recovery + lax.scan blocked Cholesky
(ops/block_tridiag.py, solver/block_cholesky.py). Gates: probe recovery
and factor/solve exactness vs dense on random SPD block-tridiagonal
systems, the jittered semidefinite fallback, end-to-end matrix-free
LM/Dogleg on the banded MINPACK family matching the dense-QR route, the
batched (vmap) path, and the contract errors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.models.minpack import (
    broyden_tridiagonal,
    discrete_boundary_value,
)
from leastsquaresoptim_jl_tpu.ops.block_tridiag import (
    block_probe_matrix,
    probe_gram_blocks,
    solve_block_tridiag_spd,
)


def _random_spd_block_tridiag(rng, nb, s, diag_boost=3.0):
    n = nb * s
    A = np.zeros((n, n))
    for b in range(nb):
        Q = rng.standard_normal((s, s))
        A[b * s:(b + 1) * s, b * s:(b + 1) * s] = (
            Q @ Q.T + diag_boost * s * np.eye(s)
        )
        if b + 1 < nb:
            Off = 0.3 * rng.standard_normal((s, s))
            A[(b + 1) * s:(b + 2) * s, b * s:(b + 1) * s] = Off
            A[b * s:(b + 1) * s, (b + 1) * s:(b + 2) * s] = Off.T
    return A


@pytest.mark.parametrize("nb,s", [(1, 3), (2, 2), (5, 2), (7, 1), (4, 4)])
def test_probe_recovery_and_solve_match_dense(nb, s):
    rng = np.random.default_rng(0)
    n = nb * s
    A = _random_spd_block_tridiag(rng, nb, s)
    Aj = jnp.asarray(A)
    D, L = probe_gram_blocks(lambda v: Aj @ v, lambda u: u, n, s, jnp.float64)
    for b in range(nb):
        np.testing.assert_array_equal(
            np.asarray(D[b]), A[b * s:(b + 1) * s, b * s:(b + 1) * s]
        )
        if b + 1 < nb:
            np.testing.assert_array_equal(
                np.asarray(L[b]), A[(b + 1) * s:(b + 2) * s, b * s:(b + 1) * s]
            )
    rhs = rng.standard_normal(n)
    x = solve_block_tridiag_spd(D, L, jnp.asarray(rhs))
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(A, rhs), rtol=1e-12, atol=1e-12
    )


def test_damped_probing_adds_diagonal():
    rng = np.random.default_rng(1)
    nb, s = 4, 2
    n = nb * s
    A = _random_spd_block_tridiag(rng, nb, s)
    Aj = jnp.asarray(A)
    damp = jnp.asarray(rng.uniform(0.5, 2.0, n))
    D, L = probe_gram_blocks(
        lambda v: Aj @ v, lambda u: u, n, s, jnp.float64, damp=damp
    )
    rhs = rng.standard_normal(n)
    x = solve_block_tridiag_spd(D, L, jnp.asarray(rhs))
    np.testing.assert_allclose(
        np.asarray(x),
        np.linalg.solve(A + np.diag(np.asarray(damp)), rhs),
        rtol=1e-12,
    )


def test_semidefinite_fallback_is_finite():
    """A singular block-tridiagonal Gram (zero row/column) takes the
    jittered retry and returns a finite bounded step — the banded
    analogue of solver/cholesky._solve_spd's pstrf stand-in."""
    rng = np.random.default_rng(2)
    nb, s = 3, 2
    n = nb * s
    A = _random_spd_block_tridiag(rng, nb, s)
    A[3, :] = 0.0
    A[:, 3] = 0.0  # exactly singular
    Aj = jnp.asarray(A)
    D, L = probe_gram_blocks(lambda v: Aj @ v, lambda u: u, n, s, jnp.float64)
    x = solve_block_tridiag_spd(D, L, jnp.ones(n))
    assert bool(jnp.all(jnp.isfinite(x)))


@pytest.mark.parametrize("opt_name", ["lm", "dogleg"])
@pytest.mark.parametrize(
    "maker,n", [(broyden_tridiagonal, 60), (discrete_boundary_value, 64)]
)
def test_banded_minpack_matrix_free(opt_name, maker, n):
    """Matrix-free LM/Dogleg with BlockCholesky(2) solves the banded
    MINPACK problems to the reference ssr gate and matches the dense-QR
    route's minimizer — pins that the declared block-tridiagonal
    structure holds exactly for this family (any probe aliasing would
    corrupt the steps)."""
    name, f, x0, _ = maker(n)
    tag = lso.BlockCholesky(2)
    opt = {
        "lm": lso.LevenbergMarquardt(tag),
        "dogleg": lso.Dogleg(tag),
    }[opt_name]
    prob = lso.matrix_free_problem(f=f, x=x0, output_length=n)
    r = lso.solve(prob, opt)
    assert bool(r["converged"]), name
    assert float(r["ssr"]) <= 1e-3, name
    dense = lso.solve(
        lso.least_squares_problem(f=f, x=x0, output_length=n),
        type(opt)(lso.QR()),
    )
    # The reference's 1e-3 parity criterion, not bitwise: the two routes
    # take different trajectories and the x-criterion can stop either a
    # touch earlier on the flat BVP valleys (both endpoints have
    # ssr <= 1e-16 here); any probe aliasing would blow this gate apart.
    np.testing.assert_allclose(
        np.asarray(r["minimizer"]), np.asarray(dense["minimizer"]),
        rtol=0, atol=1e-3,
    )


def test_block_cholesky_vmapped_batch():
    """The probing + scan factorization compose with vmap (batched
    independent banded fits)."""
    n, B = 20, 6
    name, f, x0, _ = broyden_tridiagonal(n)
    x0b = jnp.asarray(
        np.asarray(x0)[None, :] * np.linspace(0.8, 1.2, B)[:, None]
    )
    raw = lso.solve_batch(
        lambda x: f(x), x0b, None,
        lso.LevenbergMarquardt(lso.BlockCholesky(2)),
        output_length=n, materialize_jacobian=False,
    )
    assert bool(jnp.all(raw["converged"]))
    assert float(jnp.max(raw["ssr"])) <= 1e-6


def test_block_cholesky_contract_errors():
    with pytest.raises(ValueError, match="block_size"):
        lso.BlockCholesky(0)
    with pytest.raises(ValueError, match="divide"):
        block_probe_matrix(10, 3, jnp.float64)
    # end-to-end: block size not dividing n surfaces at trace time
    name, f, x0, _ = broyden_tridiagonal(10)
    prob = lso.matrix_free_problem(f=f, x=x0, output_length=10)
    with pytest.raises(ValueError, match="divide"):
        lso.solve(prob, lso.LevenbergMarquardt(lso.BlockCholesky(3)))


def test_block_cholesky_materialized_jacobian():
    """The tag also accepts materialized-J problems (the operator view
    routes matvecs through the array)."""
    name, f, x0, _ = broyden_tridiagonal(20)
    prob = lso.least_squares_problem(f=f, x=x0, output_length=20)
    r = lso.solve(prob, lso.Dogleg(lso.BlockCholesky(2)))
    assert bool(r["converged"]) and float(r["ssr"]) <= 1e-6


@pytest.mark.parametrize("nb,s", [(2, 2), (5, 2), (64, 1), (65, 2), (128, 2),
                                  (100, 3)])
def test_cyclic_reduction_matches_scan_and_dense(nb, s):
    """Block cyclic reduction (the large-nb TPU route) solves the same
    systems as the sequential scan factorization, to dense-solve
    accuracy — including odd level lengths (edge blocks handled by the
    zero couplings, not branches)."""
    rng = np.random.default_rng(nb * 10 + s)
    n = nb * s
    A = _random_spd_block_tridiag(rng, nb, s)
    Aj = jnp.asarray(A)
    D, L = probe_gram_blocks(lambda v: Aj @ v, lambda u: u, n, s, jnp.float64)
    rhs = jnp.asarray(rng.standard_normal(n))
    x_cr = solve_block_tridiag_spd(D, L, rhs, method="cr")
    x_scan = solve_block_tridiag_spd(D, L, rhs, method="scan")
    x_dense = np.linalg.solve(A, np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x_cr), x_dense, rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(x_cr), np.asarray(x_scan), rtol=1e-10, atol=1e-11
    )


def test_cyclic_reduction_end_to_end_large():
    """auto-method (cyclic reduction at nb > 64) end-to-end on a bigger
    banded chain; matches the reference ssr gate."""
    n = 512
    name, f, x0, _ = broyden_tridiagonal(n)
    prob = lso.matrix_free_problem(f=f, x=x0, output_length=n)
    r = lso.solve(prob, lso.LevenbergMarquardt(lso.BlockCholesky(2)))
    assert bool(r["converged"]) and float(r["ssr"]) <= 1e-6
    # explicit-method equivalence at the solve level
    r2 = lso.solve(
        prob, lso.LevenbergMarquardt(lso.BlockCholesky(2, method="scan"))
    )
    np.testing.assert_allclose(
        np.asarray(r["minimizer"]), np.asarray(r2["minimizer"]),
        rtol=0, atol=1e-8,
    )


def test_block_cholesky_method_contract():
    with pytest.raises(ValueError, match="method"):
        lso.BlockCholesky(2, method="qr")
