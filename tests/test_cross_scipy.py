"""Cross-validation against scipy.optimize.least_squares.

Independent-implementation check (scipy's TRF), complementing the
reference-derived suites: on random smooth problems both solvers must
reach the same objective value.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import least_squares as scipy_ls

import leastsquaresoptim_jl_tpu as lso


def _random_problem(seed, m=20, n=5):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    c = 0.3 * rng.normal(size=m)  # per-residual nonlinearity coefficient

    def f_np(x):
        return A @ x + c * np.sin(x).sum() - b

    def f_jx(x):
        return jnp.asarray(A) @ x + jnp.asarray(c) * jnp.sum(jnp.sin(x)) - jnp.asarray(b)

    return f_np, f_jx, np.zeros(n)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("opt_name", ["lm", "dogleg"])
def test_matches_scipy_objective(seed, opt_name):
    f_np, f_jx, x0 = _random_problem(seed)
    ref = scipy_ls(f_np, x0, method="trf", xtol=1e-12, ftol=1e-12, gtol=1e-12)
    opt = {
        "lm": lso.LevenbergMarquardt(lso.Cholesky()),
        "dogleg": lso.Dogleg(lso.QR()),
    }[opt_name]
    r = lso.optimize(f_jx, jnp.asarray(x0), opt)
    assert r.ssr <= (1 + 1e-6) * 2 * ref.cost + 1e-12  # scipy cost = ssr/2


@pytest.mark.parametrize("seed", range(3))
def test_matches_scipy_bounded(seed):
    """Bounded: both solvers must agree on the constrained optimum value
    (scipy TRF is an interior-point-flavored method; ours clips + active-set
    refines — same KKT point on these convex-ish problems)."""
    f_np, f_jx, x0 = _random_problem(seed, m=30, n=4)
    lower = np.full(4, 0.1)
    x0 = np.full(4, 0.5)
    ref = scipy_ls(f_np, x0, method="trf", bounds=(lower, np.inf),
                   xtol=1e-12, ftol=1e-12, gtol=1e-12)
    r = lso.optimize(
        f_jx, jnp.asarray(x0), lso.LevenbergMarquardt(),
        lower=jnp.asarray(lower),
    )
    assert np.all(np.asarray(r.minimizer) >= lower - 1e-9)
    assert r.ssr <= (1 + 1e-5) * 2 * ref.cost + 1e-10
