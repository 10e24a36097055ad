"""Rank-deficient factor model (port of reference test/nonlinearleastsquares.jl).

A 3x2 rank-1 factor fit: 9 residuals, 6 parameters, J'J singular everywhere
along the scale gauge (x[:3] * c, x[3:] / c). Stresses the rank-deficient
fallbacks of QR/Cholesky and the LSMR path on a problem whose optimum has
ssr ~ 11.2 != 0.
"""

import jax.numpy as jnp
import pytest

import leastsquaresoptim_jl_tpu as lso

TARGETS = jnp.array([3.0, 2.0, 5.0, 4.5, 3.2, 2.0, 5.0, 1.3, 1.5])


def factor_residual(x):
    loadings = x[:3]
    factors = x[3:]
    return TARGETS - jnp.outer(loadings, factors).ravel()


@pytest.mark.parametrize(
    "opt_name,solver_name,materialize",
    [
        ("dogleg", "qr", True),
        ("dogleg", "lsmr", False),
        ("lm", "qr", True),
        ("lm", "lsmr", False),
        ("dogleg", "cholesky", True),
        ("lm", "cholesky", True),
    ],
)
def test_factor_model(opt_name, solver_name, materialize):
    solver = {"qr": lso.QR(), "lsmr": lso.LSMR(), "cholesky": lso.Cholesky()}[
        solver_name
    ]
    opt = {"dogleg": lso.Dogleg(solver), "lm": lso.LevenbergMarquardt(solver)}[
        opt_name
    ]
    p = lso.least_squares_problem(
        f=factor_residual, x=jnp.ones(6), materialize_jacobian=materialize
    )
    r = lso.optimize_problem(p, opt)
    assert r.ssr <= 12.0, f"ssr={r.ssr}"
    assert r.converged
