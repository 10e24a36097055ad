"""Robust losses: exact transform identity + outlier resistance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.loss import LOSSES, robustify


def _rho(name, z):
    """Direct rho definitions for cross-checking the ratio forms."""
    if name == "huber":
        return np.where(z <= 1, z, 2 * np.sqrt(np.maximum(z, 1)) - 1)
    if name == "soft_l1":
        return 2 * (np.sqrt(1 + z) - 1)
    if name == "cauchy":
        return np.log1p(z)
    if name == "arctan":
        return np.arctan(z)
    return z


@pytest.mark.parametrize("name", sorted(LOSSES))
def test_transform_objective_identity(name):
    """sum(robustified(r)^2) == f_scale^2 sum(rho((r/f_scale)^2)) exactly,
    including tiny and huge residuals; transform is AD-differentiable."""
    r = jnp.array([0.0, 1e-12, 0.3, -2.0, 50.0, -1e3])
    fs = 0.7
    wrapped = robustify(lambda x: r * x[0], name, f_scale=fs)
    out = wrapped(jnp.ones(1))
    z = (np.asarray(r) / fs) ** 2
    expect = fs**2 * _rho(name, z)
    assert np.allclose(np.asarray(out) ** 2, expect, rtol=1e-10, atol=1e-22)
    gradable = jax.grad(lambda x: jnp.sum(wrapped(x) ** 2))(jnp.ones(1))
    assert np.all(np.isfinite(np.asarray(gradable)))


@pytest.mark.parametrize("name", ["huber", "soft_l1", "cauchy", "arctan"])
def test_overflow_clamp_saturates(name):
    """Beyond the overflow cap the transformed residual saturates at a
    constant (the clamped value), so gross outliers have zero gradient, and
    below the cap the objective equals f_scale^2 rho((r/f_scale)^2)."""
    fs = 0.5
    wrapped = robustify(lambda x: x, name, f_scale=fs)
    cap = float(np.sqrt(np.finfo(np.float64).max)) / 4  # ~3.35e153

    # Identity holds right up to the cap (incl. |r/f_scale| ~ 1e25).
    below = jnp.array([1.0, fs * 1e25, 1e50, cap * fs * 0.99])
    out = wrapped(below)
    z = (np.asarray(below) / fs) ** 2
    assert np.allclose(np.asarray(out) ** 2, fs**2 * _rho(name, z), rtol=1e-10)

    # Beyond the cap: finite, saturated at the cap's value, gradient zero.
    above = jnp.array([fs * cap * 1.5, 1e200, 1e250])
    out_above = wrapped(above)
    assert np.all(np.isfinite(np.asarray(out_above)))
    sat = fs * cap * np.sqrt(float(LOSSES[name](jnp.asarray(cap * cap))))
    assert np.allclose(np.asarray(out_above), sat, rtol=1e-10)
    g = jax.jacfwd(wrapped)(above)
    assert np.all(np.asarray(g) == 0.0)


def test_robust_fit_resists_outliers():
    """A contaminated linear fit: soft_l1 recovers the true slope where
    plain least squares is dragged by the outliers."""
    rng = np.random.default_rng(0)
    x = jnp.linspace(0.0, 1.0, 60)
    true = jnp.array([2.0, -1.0])
    y = true[0] * x + true[1] + jnp.asarray(rng.normal(0, 0.01, 60))
    y = y.at[5].set(50.0).at[40].set(-40.0)  # gross outliers

    def f(beta):
        return y - (beta[0] * x + beta[1])

    r_plain = lso.optimize(f, jnp.zeros(2))
    r_robust = lso.optimize(f, jnp.zeros(2), loss="soft_l1", f_scale=0.1)
    err_plain = np.linalg.norm(r_plain.minimizer - np.asarray(true))
    err_robust = np.linalg.norm(r_robust.minimizer - np.asarray(true))
    assert err_robust < 0.05
    assert err_plain > 10 * err_robust


def test_loss_validation():
    with pytest.raises(ValueError, match="unknown loss"):
        lso.optimize(lambda x: x, jnp.ones(2), loss="not_a_loss")
    with pytest.raises(ValueError, match="user Jacobian"):
        lso.optimize(
            lambda x: x, jnp.ones(2), loss="huber",
            g=lambda x: jnp.eye(2),
        )
    # linear loss is a no-op passthrough
    fn = lambda x: x
    assert robustify(fn, "linear") is fn
    # f_scale=0 would collapse residuals to 0/NaN — a fake perfect fit
    with pytest.raises(ValueError, match="f_scale"):
        robustify(fn, "huber", f_scale=0.0)
    with pytest.raises(ValueError, match="f_scale"):
        robustify(fn, "huber", f_scale=float("nan"))


def test_curve_fit_robust_kwarg():
    x = jnp.linspace(1.0, 60.0, 30)
    y = 240.0 * (1 - jnp.exp(-5e-4 * x))
    y = y.at[3].set(1000.0)  # outlier
    r = lso.curve_fit(
        "exp_saturation", x, y, [200.0, 1e-3], loss="cauchy", f_scale=0.5
    )
    assert np.allclose(r.minimizer, [240.0, 5e-4], rtol=1e-3)
