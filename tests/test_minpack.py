"""MINPACK hybrj correctness gate.

Port of the reference sweep (test/nonlinearsolvers.jl:505-617): every
problem instance must reach ssr <= 1e-3 across the optimizer x solver grid.
The reference's {dense, sparse} matrix axis maps to our
{materialized, matrix-free} axis (sparse CSC does not exist on TPU; the
matrix-free JVP/VJP path is the scaling representation, SURVEY.md §7).
"""

import jax.numpy as jnp
import pytest

import leastsquaresoptim_jl_tpu as lso

from leastsquaresoptim_jl_tpu.models.minpack import (
    cholesky_suite,
    full_suite,
    rosenbrock,
    wood,
)

SSR_TOL = 1e-3


def _solve(prob, optimizer, materialize=True, autodiff="forward", use_jac=True):
    name, f, x0, jac = prob
    problem = lso.least_squares_problem(
        f=f,
        x=x0,
        g=jac if use_jac else None,
        autodiff=autodiff,
        materialize_jacobian=materialize,
    )
    return name, lso.optimize_problem(problem, optimizer)


@pytest.mark.parametrize("opt_name", ["dogleg", "lm"])
@pytest.mark.parametrize("solver_name", ["qr", "lsmr"])
def test_grid_materialized(opt_name, solver_name):
    """Reference: dense sweep {QR, LSMR} x {Dogleg, LM} (:505-537)."""
    solver = {"qr": lso.QR(), "lsmr": lso.LSMR()}[solver_name]
    opt = {"dogleg": lso.Dogleg(solver), "lm": lso.LevenbergMarquardt(solver)}[
        opt_name
    ]
    for prob in full_suite():
        name, r = _solve(prob, opt)
        assert r.ssr <= SSR_TOL, f"{name}: ssr={r.ssr}"


@pytest.mark.parametrize("opt_name", ["dogleg", "lm"])
def test_grid_matrix_free_lsmr(opt_name):
    """Reference: sparse sweep with LSMR (:505-537) — here fully matrix-free."""
    opt = {
        "dogleg": lso.Dogleg(lso.LSMR()),
        "lm": lso.LevenbergMarquardt(lso.LSMR()),
    }[opt_name]
    for prob in full_suite():
        name, r = _solve(prob, opt, materialize=False, use_jac=False)
        assert r.ssr <= SSR_TOL, f"{name}: ssr={r.ssr}"


@pytest.mark.parametrize("opt_name", ["dogleg", "lm"])
def test_grid_cholesky(opt_name):
    """Reference: dense-Cholesky sweep asserting converged && ssr (:584-595)."""
    opt = {
        "dogleg": lso.Dogleg(lso.Cholesky()),
        "lm": lso.LevenbergMarquardt(lso.Cholesky()),
    }[opt_name]
    for prob in cholesky_suite():
        name, r = _solve(prob, opt)
        assert r.converged, f"{name}: not converged"
        assert r.ssr <= SSR_TOL, f"{name}: ssr={r.ssr}"


@pytest.mark.parametrize("opt_name", ["dogleg", "lm"])
def test_grid_autodiff_central(opt_name):
    """Reference: autodiff sweep with the :central default (:608-617)."""
    opt = {"dogleg": lso.Dogleg(), "lm": lso.LevenbergMarquardt()}[opt_name]
    for prob in full_suite():
        name, r = _solve(prob, opt, autodiff="central", use_jac=False)
        assert r.converged, f"{name}: not converged"
        assert r.ssr <= SSR_TOL, f"{name}: ssr={r.ssr}"


def test_defaults():
    """Default selection rules (reference: :619-628 and src/types.jl:113-127):
    materialized Jacobian -> Dogleg(QR); matrix-free -> LevenbergMarquardt(LSMR)."""
    name, f, x0, jac = wood()
    p = lso.least_squares_problem(f=f, x=x0)
    r = lso.optimize_problem(p)
    assert r.optimizer == "Dogleg"
    p = lso.least_squares_problem(f=f, x=x0, materialize_jacobian=False)
    r = lso.optimize_problem(p)
    assert r.optimizer == "LevenbergMarquardt"


def test_user_jacobian():
    """User-supplied analytic Jacobian path (reference g!)."""
    name, f, x0, jac = rosenbrock()
    p = lso.least_squares_problem(f=f, x=x0, g=jac)
    r = lso.optimize_problem(p, lso.LevenbergMarquardt(lso.QR()))
    assert r.ssr <= 1e-10
    assert jnp.allclose(jnp.asarray(r.minimizer), jnp.ones(2), atol=1e-6)


def test_dtype_generic_f32():
    """f32 counterpart of the reference BigFloat genericity smoke test
    (:631-639): the loop must run in the dtype of x0."""
    name, f, x0, jac = rosenbrock()
    p = lso.least_squares_problem(f=f, x=x0.astype(jnp.float32))
    r = lso.optimize_problem(p, lso.Dogleg())
    assert r.minimizer.dtype == jnp.float32
    assert r.ssr <= 1e-3
