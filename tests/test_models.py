"""Model-family front end: curve_fit / curve_fit_batch + built-in zoos."""

import jax.numpy as jnp
import numpy as np
import pytest

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.models import (
    CURVES,
    NIST_DATASETS,
    NIST_MODELS,
    full_suite,
)


def test_curve_fit_named_model():
    """Fit the built-in exp_saturation shape to exact data."""
    x = jnp.linspace(1.0, 80.0, 40)
    beta_true = jnp.array([240.0, 5e-4])
    y = CURVES["exp_saturation"](x, beta_true)
    r = lso.curve_fit("exp_saturation", x, y, [200.0, 1e-3])
    assert r.converged
    assert np.allclose(r.minimizer, np.asarray(beta_true), rtol=1e-6)


def test_curve_fit_nist_model_and_weights():
    """NIST model by name + weights: zero-weight rows are ignored."""
    d = NIST_DATASETS["misra1a"]
    x = jnp.asarray(d["x"])
    y = jnp.asarray(d["y"])
    # Corrupt two rows, zero their weights: the fit must match the fit on
    # the data with those rows removed (identical objective).
    y_bad = y.at[0].set(1e6).at[5].set(-1e6)
    w = jnp.ones_like(y).at[0].set(0.0).at[5].set(0.0)
    keep = np.array([i for i in range(len(d["x"])) if i not in (0, 5)])
    r = lso.curve_fit("misra1a", x, y_bad, d["starts"][0], weights=w)
    r_removed = lso.curve_fit("misra1a", x[keep], y[keep], d["starts"][0])
    assert np.allclose(r.minimizer, r_removed.minimizer, rtol=1e-6)


def test_curve_fit_unknown_model():
    with pytest.raises(ValueError, match="unknown model"):
        lso.curve_fit("not_a_model", [1.0], [1.0], [1.0])


def test_curve_fit_batch_matches_single():
    B, m = 8, 32
    x = jnp.linspace(1.0, 60.0, m)
    betas = jnp.stack(
        [jnp.linspace(150.0, 300.0, B), jnp.linspace(4e-4, 9e-4, B)], axis=1
    )
    import jax

    Y = jax.vmap(lambda b: CURVES["exp_saturation"](x, b))(betas)
    p0 = betas * 1.2
    raw = lso.curve_fit_batch("exp_saturation", x, Y, p0)
    assert raw["minimizer"].shape == (B, 2)
    assert np.allclose(np.asarray(raw["minimizer"]), np.asarray(betas),
                       rtol=1e-5)
    # spot-check one row against the single-fit API
    r0 = lso.curve_fit("exp_saturation", x, Y[0], p0[0])
    assert np.allclose(raw["minimizer"][0], r0.minimizer, rtol=1e-8, atol=1e-10)


def test_zoo_shapes():
    """Every built-in curve evaluates and the NIST registry is complete."""
    x = jnp.linspace(0.5, 3.0, 7)
    for name, fn in CURVES.items():
        nb = {"exp_saturation": 2, "power": 2, "michaelis_menten": 2}.get(name, 3)
        y = fn(x, jnp.ones(nb))
        assert y.shape == x.shape, name
    assert set(NIST_MODELS) == set(NIST_DATASETS)
    assert len(full_suite()) == 21


def test_covariance_and_standard_errors():
    """Gauss-Newton covariance from the final Jacobian matches the
    analytic linear-regression covariance on a linear model."""
    import numpy as onp

    from leastsquaresoptim_jl_tpu.utils import covariance, standard_errors

    rng = onp.random.default_rng(0)
    m = 200
    x = onp.linspace(0.0, 1.0, m)
    A = onp.stack([x, onp.ones(m)], axis=1)
    sigma = 0.05
    y = A @ onp.array([2.0, -1.0]) + rng.normal(0, sigma, m)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def f(beta):
        return yj - (beta[0] * xj + beta[1])

    r = lso.optimize(f, jnp.zeros(2), lso.LevenbergMarquardt(lso.QR()))
    cov = covariance(r)
    s2_hat = r.ssr / (m - 2)
    cov_ref = s2_hat * onp.linalg.inv(A.T @ A)
    assert onp.allclose(cov, cov_ref, rtol=1e-6)
    se = standard_errors(r)
    # standard errors should be in the right ballpark of the true sigma-based ones
    se_true = onp.sqrt(onp.diag(sigma**2 * onp.linalg.inv(A.T @ A)))
    assert onp.all(se > 0.5 * se_true) and onp.all(se < 2.0 * se_true)


def test_covariance_underdetermined_is_infinite():
    """m <= n leaves no residual degrees of freedom: s^2 = ssr/(m-n) is
    undefined and the covariance must be inf, not confidently wrong
    (scipy.optimize.curve_fit's inf-pcov behavior)."""
    import numpy as onp

    from leastsquaresoptim_jl_tpu.utils import covariance

    def f(x):
        return jnp.array([x[0] + x[1] - 1.0, x[0] - x[1] - 0.2])

    r = lso.optimize(f, jnp.zeros(2), lso.LevenbergMarquardt(lso.QR()))
    cov = covariance(r)  # m == n == 2
    assert cov.shape == (2, 2) and onp.all(onp.isinf(cov))


def test_covariance_rank_deficient():
    """Unidentifiable parameters get infinite variance; identifiable ones
    keep their finite pseudo-inverse covariance (no inf/NaN flooding)."""
    import numpy as onp

    from leastsquaresoptim_jl_tpu.utils import covariance, standard_errors

    m = 50
    x = onp.linspace(0.0, 1.0, m)
    y = 2.0 * x + 0.5
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    # beta[1] and beta[2] enter only through their sum -> J rank 2 of 3.
    def f(beta):
        return yj - (beta[0] * xj + beta[1] + beta[2])

    r = lso.optimize(f, jnp.zeros(3), lso.LevenbergMarquardt(lso.LSMR()),
                     materialize_jacobian=True)
    cov = covariance(r)
    assert onp.isfinite(cov[0, 0])  # slope is identifiable
    assert onp.isinf(cov[1, 1]) and onp.isinf(cov[2, 2])
    assert not onp.any(onp.isnan(cov))
    se = standard_errors(r)
    assert onp.isfinite(se[0]) and onp.isinf(se[1]) and onp.isinf(se[2])
    # identifiable-direction variance matches the pseudo-inverse reference
    A = onp.stack([x, onp.ones(m), onp.ones(m)], axis=1)
    cov_ref = (r.ssr / (m - 3)) * onp.linalg.pinv(A.T @ A)
    assert onp.allclose(cov[0, 0], cov_ref[0, 0], rtol=1e-5)


def test_covariance_pytree_minimizer():
    """covariance(result, problem=...) re-ravels structured minimizers."""
    import numpy as onp

    from leastsquaresoptim_jl_tpu.utils import covariance

    x = jnp.linspace(0.0, 1.0, 40)
    y = 2.0 * x - 1.0

    def f(p):
        return y - (p["slope"][0] * x + p["intercept"][0])

    prob = lso.least_squares_problem(
        f=f, x={"slope": jnp.zeros(1), "intercept": jnp.zeros(1)}
    )
    r = lso.optimize_problem(prob)
    assert isinstance(r.minimizer, dict)
    cov = covariance(r, problem=prob)
    assert cov.shape == (2, 2) and onp.all(onp.isfinite(cov))


def test_curve_fit_batch_robust_loss():
    """loss= in the batched front end: contaminated fits recover the clean
    parameters, matching single-fit robust results."""
    import jax
    import numpy as onp

    B, m = 6, 40
    x = jnp.linspace(1.0, 60.0, m)
    scales = jnp.linspace(200.0, 300.0, B)
    Y = jax.vmap(lambda s: s * (1 - jnp.exp(-5e-4 * x)))(scales)
    Y = Y.at[:, 3].set(1000.0)  # gross outlier in every fit
    P0 = jnp.stack([jnp.full((B,), 150.0), jnp.full((B,), 1e-3)], 1)
    raw = lso.curve_fit_batch(
        "exp_saturation", x, Y, P0, loss="cauchy", f_scale=0.5
    )
    assert onp.all(onp.asarray(raw["converged"]))
    mins = onp.asarray(raw["minimizer"])
    assert onp.allclose(mins[:, 0], onp.asarray(scales), rtol=1e-3)
    assert onp.allclose(mins[:, 1], 5e-4, rtol=1e-3)
    # parity with the single-fit robust path
    r0 = lso.curve_fit(
        "exp_saturation", x, Y[0], P0[0], loss="cauchy", f_scale=0.5
    )
    assert onp.allclose(mins[0], onp.asarray(r0.minimizer), rtol=1e-6)
