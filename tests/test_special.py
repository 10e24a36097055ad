"""ops/special.py: gridded exponential sequences (2 exps + power tables).

Correctness gates for the value (vs a direct jnp.exp reference, f32 and
f64), the exact custom JVP / reverse gradient (vs the analytic x*e), and
the end-to-end use inside a batched curve fit (matches the naive-exp
residual's minimizers)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.ops.special import make_exp_grid


@pytest.mark.parametrize("m", [1, 2, 3, 5, 8, 17, 64, 100])
@pytest.mark.parametrize("s", [-0.05, 0.3, -2.0])
def test_exp_grid_matches_direct(m, s):
    t0, dt = 1.0, 79.0 / 63.0
    e = make_exp_grid(t0, dt, m)
    x = t0 + dt * np.arange(m)
    got = np.asarray(e(jnp.float64(s)))
    ref = np.exp(s * x)
    assert np.allclose(got, ref, rtol=5e-14), np.max(np.abs(got / ref - 1))


def test_exp_grid_f32_ulp_budget():
    """At m=64 the power-table rounding stays within ~a few 1e-7 relative
    — below the f32 solve tolerances the batched path runs at."""
    e = make_exp_grid(1.0, 79.0 / 63.0, 64)
    x = 1.0 + (79.0 / 63.0) * np.arange(64)
    for s in (-0.06, -0.24, 0.1):
        got = np.asarray(e(jnp.float32(s)), np.float64)
        ref = np.exp(float(np.float32(s)) * x)
        rel = np.max(np.abs(got / ref - 1.0))
        assert rel < 2e-6, (s, rel)


def test_exp_grid_gradients_exact_rule():
    m, t0, dt = 40, 0.5, 0.25
    e = make_exp_grid(t0, dt, m)
    x = t0 + dt * jnp.arange(m, dtype=jnp.float64)
    s = jnp.float64(-0.7)
    # forward
    prim, tang = jax.jvp(e, (s,), (jnp.float64(1.0),))
    assert np.allclose(np.asarray(tang), np.asarray(x * prim), rtol=1e-13)
    # reverse (the JVP is linear in the tangent: transposes automatically)
    g = jax.grad(lambda ss: jnp.sum(e(ss) * jnp.arange(1.0, m + 1.0)))(s)
    expect = jnp.sum(x * prim * jnp.arange(1.0, m + 1.0))
    assert np.allclose(np.asarray(g), np.asarray(expect), rtol=1e-13)


@pytest.mark.parametrize(
    "name", ["exp_saturation", "exp_decay", "exp_sum_2"]
)
def test_curve_fit_batch_gridded_matches_naive(name):
    from leastsquaresoptim_jl_tpu.models import curve_fit_batch

    B, m = 24, 50
    rng = np.random.default_rng(11)
    xd = np.linspace(0.5, 12.0, m)
    if name == "exp_saturation":
        betas = np.stack([rng.uniform(2, 5, B), rng.uniform(0.2, 0.8, B)], 1)
    elif name == "exp_sum_2":
        # well-separated rates (identifiable 2-exponential sum)
        betas = np.stack(
            [rng.uniform(2, 5, B), rng.uniform(0.1, 0.2, B),
             rng.uniform(1, 3, B), rng.uniform(0.8, 1.5, B)], 1
        )
    else:  # exp_decay
        betas = np.stack(
            [rng.uniform(2, 5, B), rng.uniform(0.2, 0.8, B), rng.uniform(0.5, 2, B)], 1
        )
    model = lso.models.CURVES[name]
    Y = np.asarray(jax.vmap(lambda b: model(jnp.asarray(xd), b))(jnp.asarray(betas)))
    p0 = betas * rng.uniform(0.9, 1.1, betas.shape)
    kw = dict(options=lso.Options(iterations=80))
    rg = curve_fit_batch(name, xd, Y, p0, gridded=True, **kw)
    rn = curve_fit_batch(name, xd, Y, p0, **kw)
    assert bool(jnp.all(rg["converged"]))
    assert np.allclose(np.asarray(rg["minimizer"]), betas, rtol=1e-7)
    assert np.allclose(
        np.asarray(rg["minimizer"]), np.asarray(rn["minimizer"]), rtol=1e-7
    )


def test_curve_fit_batch_gridded_contract_errors():
    from leastsquaresoptim_jl_tpu.models import curve_fit_batch, gridded_model

    B, m = 4, 16
    xd_nonuniform = np.geomspace(1.0, 10.0, m)
    xd = np.linspace(1.0, 10.0, m)
    Y = np.ones((B, m))
    p0 = np.ones((B, 2))
    with pytest.raises(ValueError, match="uniform"):
        curve_fit_batch("exp_saturation", xd_nonuniform, Y, p0, gridded=True)
    with pytest.raises(ValueError, match="named"):
        curve_fit_batch(lambda x, b: b[0] * x, xd, Y, p0, gridded=True)
    with pytest.raises(ValueError, match="1-d"):
        curve_fit_batch(
            "exp_saturation", np.tile(xd, (B, 1)), Y, p0, gridded=True
        )
    with pytest.raises(ValueError, match="gridded variant"):
        gridded_model("gaussian", 0.0, 1.0, m)


def test_curve_fit_batch_gridded_accepts_f32_grid():
    """A uniform grid *stored in f32* (the headline-workload case) has
    per-gap quantization ~eps32*|x| — the uniformity check must scale its
    tolerance with the storage dtype, not reject every f32 grid."""
    from leastsquaresoptim_jl_tpu.models import curve_fit_batch

    B, m = 8, 64
    rng = np.random.default_rng(2)
    xd32 = jnp.asarray(np.linspace(1.0, 80.0, m), jnp.float32)
    betas = np.stack([rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], 1)
    Y = betas[:, :1] * (1.0 - np.exp(-betas[:, 1:2] * np.asarray(xd32)[None, :]))
    raw = curve_fit_batch(
        "exp_saturation", xd32, jnp.asarray(Y, jnp.float32),
        jnp.asarray(betas * 1.05, jnp.float32), gridded=True,
    )
    assert bool(jnp.all(raw["converged"]))
    rel = np.max(np.abs(np.asarray(raw["minimizer"]) / betas - 1.0))
    assert rel < 1e-4, rel


def test_curve_fit_batch_gridded_composes_with_jit():
    """gridded=True works under an outer jax.jit when the grid itself is
    concrete (t0/dt are compile-time constants): validation must read the
    USER's array, not the traced jnp conversion. A traced grid raises the
    contract error."""
    from leastsquaresoptim_jl_tpu.models import curve_fit_batch

    B, m = 8, 32
    rng = np.random.default_rng(4)
    xd = np.linspace(0.5, 12.0, m)
    betas = np.stack([rng.uniform(2, 5, B), rng.uniform(0.2, 0.8, B)], 1)
    Y = betas[:, :1] * (1.0 - np.exp(-betas[:, 1:2] * xd[None, :]))
    p0 = jnp.asarray(betas * 1.05)

    @jax.jit
    def fit(p0j, yj):
        return curve_fit_batch("exp_saturation", xd, yj, p0j, gridded=True)

    raw = fit(p0, jnp.asarray(Y))
    assert bool(jnp.all(raw["converged"]))
    assert np.allclose(np.asarray(raw["minimizer"]), betas, rtol=1e-6)

    @jax.jit
    def fit_traced_grid(xj, p0j, yj):
        return curve_fit_batch("exp_saturation", xj, yj, p0j, gridded=True)

    with pytest.raises(ValueError, match="concrete"):
        fit_traced_grid(jnp.asarray(xd), p0, jnp.asarray(Y))


def test_gridded_logistic_rejected():
    """The logistic is deliberately unsupported: its parameter-dependent
    exp offset makes the scalar-prefactor-times-table factorization
    saturate (0*inf) where the naive form is finite — measured O(1)-wrong
    values near the grid edge for steep f32 transitions. The contract is
    a loud error, not silent corruption."""
    from leastsquaresoptim_jl_tpu.models import gridded_model

    with pytest.raises(ValueError, match="gridded variant"):
        gridded_model("logistic", 1.0, 1.0, 64)


def test_exp_grid_decreasing_abs_grid_no_nan():
    """A one-sided grid whose |x| DECREASES along the grid (all-negative
    ascending here) must base its tables at the near-zero end: basing at
    the start pairs an underflowed exp(s*t0) with overflowing powers —
    NaN where the naive exp is finite (x=0 sample: exactly 1.0)."""
    for t0, dt, m, s in [(-5.0, 1.0, 6, 30.0), (-40.0, 1.0, 41, 20.0),
                         (40.0, -1.0, 41, 20.0)]:
        e = make_exp_grid(t0, dt, m)
        x = t0 + dt * np.arange(m)
        got = np.asarray(e(jnp.float32(s)))
        assert not np.any(np.isnan(got)), (t0, dt, s, got)
        with np.errstate(over="ignore"):
            ref = np.exp(np.float32(s) * x.astype(np.float32), dtype=np.float32)
        finite = np.isfinite(ref) & (ref > 0)
        assert np.allclose(got[finite], ref[finite], rtol=2e-4), (t0, dt, s)
        assert np.array_equal(np.isinf(got), np.isinf(ref))


def test_exp_grid_sign_crossing_extreme_s_no_nan():
    """On a grid spanning x=0 an extreme |s| pairs an inf table factor
    with an underflowed one; the sign-repair must yield the same
    saturation (inf/0) the naive exp gives, never NaN."""
    m = 33
    t0, dt = -16.0, 1.0
    e = make_exp_grid(t0, dt, m)
    x = t0 + dt * np.arange(m)
    for s in (120.0, -120.0, 400.0):
        got = np.asarray(e(jnp.float32(s)))
        with np.errstate(over="ignore"):
            ref = np.exp(np.float32(s) * x.astype(np.float32), dtype=np.float32)
        assert not np.any(np.isnan(got)), (s, got)
        finite = np.isfinite(ref) & (ref > 0)
        assert np.allclose(got[finite], ref[finite], rtol=2e-4)
        assert np.array_equal(np.isinf(got), np.isinf(ref))


def test_exp_grid_batched_fit_matches_naive():
    """solve_batch with the gridded-exp residual converges to the same
    minimizers as the naive jnp.exp residual (the bench.py model)."""
    B, m = 64, 64
    rng = np.random.default_rng(3)
    xdata = np.linspace(1.0, 80.0, m)
    t0, dt = float(xdata[0]), float(xdata[1] - xdata[0])
    betas = np.stack([rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], 1)
    Y = betas[:, :1] * (1.0 - np.exp(-betas[:, 1:2] * xdata[None, :]))
    x0 = betas * rng.uniform(0.8, 1.2, (B, 2))

    e = make_exp_grid(t0, dt, m)

    def f_grid(b, yd):
        return yd - b[0] * (1.0 - e(-b[1]))

    xg = jnp.asarray(xdata)

    def f_naive(b, yd):
        return yd - b[0] * (1.0 - jnp.exp(-b[1] * xg))

    kw = dict(output_length=m, options=lso.Options(iterations=60))
    rg = lso.solve_batch(f_grid, jnp.asarray(x0), jnp.asarray(Y), **kw)
    rn = lso.solve_batch(f_naive, jnp.asarray(x0), jnp.asarray(Y), **kw)
    assert bool(jnp.all(rg["converged"]))
    assert np.allclose(np.asarray(rg["minimizer"]), betas, rtol=1e-8)
    assert np.allclose(
        np.asarray(rg["minimizer"]), np.asarray(rn["minimizer"]), rtol=1e-8
    )
