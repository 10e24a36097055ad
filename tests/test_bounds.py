"""Box-constraint tests (port of reference test/bounds.jl).

The active-bound cases disable x_tol/f_tol so only the projected-gradient
KKT test can certify convergence — g_converged must fire at the bound.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import leastsquaresoptim_jl_tpu as lso


def rosenbrock(x):
    return jnp.array([1 - x[0], 100 * (x[1] - x[0] ** 2)])


@pytest.mark.parametrize(
    "opt", [lso.Dogleg(), lso.LevenbergMarquardt()], ids=["dogleg", "lm"]
)
def test_inactive_lower_bound(opt):
    r = lso.optimize(rosenbrock, jnp.zeros(2), opt, lower=[0.0, 0.0])
    assert r.converged
    assert np.all(r.minimizer >= -1e-8)
    assert np.linalg.norm(r.minimizer - np.array([1.0, 1.0])) <= 1e-6


@pytest.mark.parametrize(
    "opt", [lso.Dogleg(), lso.LevenbergMarquardt()], ids=["dogleg", "lm"]
)
def test_active_lower_bound(opt):
    # x1 wants 0.5 but is held at its bound 1; x2 is free and wants 3.
    def flo(x):
        return jnp.array([x[0] - 0.5, x[1] ** 2 - 9.0])

    r = lso.optimize(
        flo, jnp.array([2.0, 1.0]), opt,
        lower=[1.0, -100.0], x_tol=1e-50, f_tol=1e-50,
    )
    assert r.converged
    assert r.g_converged
    assert r.minimizer[0] >= 1.0 - 1e-8
    assert np.linalg.norm(r.minimizer - np.array([1.0, 3.0])) <= 1e-6


@pytest.mark.parametrize(
    "opt", [lso.Dogleg(), lso.LevenbergMarquardt()], ids=["dogleg", "lm"]
)
def test_active_upper_bound(opt):
    # x1 wants 5 but is held at its bound 2; the gradient points out of the box.
    def fhi(x):
        return jnp.array([x[0] - 5.0, x[1] ** 2 - 4.0])

    r = lso.optimize(
        fhi, jnp.array([0.0, 1.0]), opt,
        upper=[2.0, 100.0], x_tol=1e-50, f_tol=1e-50,
    )
    assert r.converged
    assert r.g_converged
    assert r.minimizer[0] <= 2.0 + 1e-8
    assert np.linalg.norm(r.minimizer - np.array([2.0, 2.0])) <= 1e-6
