"""Data-driven starting points (models/init.py, ``p0="auto"``).

The reference has no analogue — its users supply every start by hand
(reference: test/nonlinearfitting.jl certified starts). These tests pin
the contract: for every named CURVES model, the closed-form guess lands
in the right basin (the subsequent trust-region fit converges to the
generating parameters), batched guesses ride one vmapped kernel, and the
exp_sum_2 integral-regression initializer survives realistic noise.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.models import curve_fit, curve_fit_batch, guess_p0
from leastsquaresoptim_jl_tpu.models.curves import CURVES

# (grid, true parameters) chosen as typical well-posed instances.
CASES = {
    "exp_saturation": (np.linspace(1, 80, 60), [240.0, 5e-2]),
    "exp_decay": (np.linspace(0, 10, 60), [5.0, 0.8, 2.0]),
    "power": (np.linspace(0.5, 9, 60), [1.3, 0.77]),
    "logistic": (np.linspace(0, 10, 60), [7.0, 4.0, 1.1]),
    "gaussian": (np.linspace(-5, 5, 60), [3.0, 0.8, 1.2]),
    "michaelis_menten": (np.linspace(0.2, 8, 60), [4.0, 1.5]),
    "exp_sum_2": (np.linspace(0, 6, 64), [2.5, 0.5, 1.2, 2.2]),
    "exp_sum_3": (np.linspace(0, 6, 96), [3.0, 0.3, 2.0, 1.1, 1.0, 3.5]),
    "gauss_sum_2": (
        np.linspace(0, 10, 128), [3.0, 2.5, 0.6, 1.8, 6.5, 0.9],
    ),
    "gauss_sum_3": (
        np.linspace(0, 10, 128),
        [2.0, 2.0, 0.5, 3.0, 5.0, 0.8, 1.5, 8.0, 0.6],
    ),
}


def _data(name, noise=0.0, seed=0):
    x, bt = CASES[name]
    bt = np.asarray(bt, np.float64)
    y = np.asarray(CURVES[name](jnp.asarray(x), jnp.asarray(bt)))
    if noise:
        rng = np.random.default_rng(seed)
        y = y + noise * np.abs(y).max() * rng.standard_normal(y.shape)
    return x, y, bt


@pytest.mark.parametrize("name", sorted(CASES))
def test_auto_start_converges_to_truth(name):
    x, y, bt = _data(name)
    r = curve_fit(name, x, y, "auto")
    assert bool(r.converged), name
    rel = np.abs(np.asarray(r.minimizer) - bt) / np.abs(bt)
    assert rel.max() < 1e-4, (name, np.asarray(r.minimizer), bt)


@pytest.mark.parametrize("name", sorted(CASES))
def test_auto_start_converges_under_noise(name):
    x, y, bt = _data(name, noise=0.01, seed=1)
    r = curve_fit(name, x, y, "auto")
    assert bool(r.converged), name
    # accuracy under 1% noise is bounded by the data, not the solver —
    # just require the same basin (fit ssr no worse than a fit started
    # AT the truth; ties at rounding level)
    r_truth = curve_fit(name, x, y, bt)
    assert float(r.ssr) <= float(r_truth.ssr) * (1 + 1e-6), name


def test_guess_is_batched():
    x, _, _ = _data("exp_saturation")
    rng = np.random.default_rng(2)
    B = 64
    bts = np.stack(
        [rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], axis=1
    )
    Y = np.stack(
        [np.asarray(CURVES["exp_saturation"](jnp.asarray(x), jnp.asarray(b)))
         for b in bts]
    )
    G = np.asarray(guess_p0("exp_saturation", x, Y))
    assert G.shape == (B, 2)
    # The guess contract is basin membership, not per-parameter accuracy
    # (an unsaturated curve only identifies the product b0*b1 — the ridge
    # lets the closed-form estimate wander per-coordinate): every fit
    # started from the batched guesses must recover the truth.
    raw = curve_fit_batch(
        "exp_saturation", x, jnp.asarray(Y), "auto",
        min_converged_fraction=1.0,
    )
    assert np.asarray(raw["converged"]).all()
    rel = np.abs(np.asarray(raw["minimizer"]) - bts) / np.abs(bts)
    assert rel.max() < 1e-8


def test_curve_fit_batch_auto():
    x, _, _ = _data("exp_sum_2")
    rng = np.random.default_rng(3)
    B = 128
    bts = np.stack(
        [rng.uniform(1, 4, B), rng.uniform(0.2, 0.8, B),
         rng.uniform(0.5, 2, B), rng.uniform(1.5, 3.5, B)], axis=1
    )
    Y = np.stack(
        [np.asarray(CURVES["exp_sum_2"](jnp.asarray(x), jnp.asarray(b)))
         for b in bts]
    )
    raw = curve_fit_batch(
        "exp_sum_2", x, jnp.asarray(Y), "auto", separable=True,
        min_converged_fraction=1.0,
    )
    conv = np.mean(np.asarray(raw["converged"]))
    assert conv > 0.95
    mins = np.asarray(raw["minimizer"])
    rel = np.abs(mins - bts) / np.abs(bts)
    ok = np.asarray(raw["converged"])
    assert np.median(rel[ok].max(-1)) < 1e-4


def test_exp_sum_2_integral_regression_noise_robust():
    """Jacquelin's integral regression survives noise that breaks Prony's
    shift recurrence (the double cumulative integral smooths the data)."""
    x, _, bt = _data("exp_sum_2")
    conv = 0
    for seed in range(10):
        _, y, _ = _data("exp_sum_2", noise=0.01, seed=seed)
        r = curve_fit("exp_sum_2", x, y, "auto", separable=True)
        conv += bool(r.converged)
    assert conv >= 9


def test_exp_sum_2_guess_recovers_rates_directly():
    """The integral-regression GUESS itself (not the rescuing LM solve)
    must recover the rates on clean data — regression for the round-4
    sign error (A = -b1*b3, so the rates are roots of r^2 + B r - A;
    the old code solved r^2 + B r + A and returned garbage rates that
    only benign LM basins forgave)."""
    x = np.linspace(0.0, 6.0, 64)
    rng = np.random.default_rng(7)
    for _ in range(12):
        bt = np.array([
            rng.uniform(1, 4), rng.uniform(0.2, 0.8),
            rng.uniform(0.5, 2), rng.uniform(1.5, 3.5),
        ])
        y = np.asarray(CURVES["exp_sum_2"](jnp.asarray(x), jnp.asarray(bt)))
        g = np.asarray(guess_p0("exp_sum_2", x, y), np.float64)
        # rates land within tens of percent of truth, not merely "a
        # finite clamp floor" — the basin-membership contract made sharp
        rel_slow = abs(g[1] - bt[1]) / bt[1]
        rel_fast = abs(g[3] - bt[3]) / bt[3]
        assert rel_slow < 0.25, (g, bt)
        assert rel_fast < 0.25, (g, bt)


def test_exp_sum_2_guess_trace_safe():
    """guess_p0('exp_sum_2') works under jit and vmap (the module
    docstring's 'batched and jit/vmap-safe' claim — the old span/dxmin
    used Python float() and raised ConcretizationTypeError)."""
    import jax

    x, y, bt = _data("exp_sum_2")
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    g_eager = guess_p0("exp_sum_2", xj, yj)
    g_jit = jax.jit(lambda a, b: guess_p0("exp_sum_2", a, b))(xj, yj)
    np.testing.assert_allclose(np.asarray(g_jit), np.asarray(g_eager))
    Y = jnp.stack([yj, yj * 1.5])
    g_vmap = jax.vmap(lambda b: guess_p0("exp_sum_2", xj, b))(Y)
    assert g_vmap.shape == (2, 4)
    np.testing.assert_allclose(
        np.asarray(g_vmap[0]), np.asarray(g_eager), rtol=1e-6
    )


def test_auto_rejects_unknown_and_custom_models():
    x, y, _ = _data("power")
    with pytest.raises(ValueError, match="auto"):
        curve_fit(lambda xx, b: b[0] * xx, x, y, "auto")
    with pytest.raises(ValueError, match="auto"):
        guess_p0("misra1a", x, y)  # NIST names have no initializer
    with pytest.raises(ValueError, match="p0"):
        curve_fit("power", x, y, "bogus")


def test_exp_sum_2_guess_nonuniform_grid():
    """The integral-regression initializer needs no uniform grid (unlike
    Prony's method)."""
    rng = np.random.default_rng(4)
    x = np.sort(rng.uniform(0.0, 6.0, 80))
    bt = np.asarray([2.5, 0.5, 1.2, 2.2])
    y = np.asarray(CURVES["exp_sum_2"](jnp.asarray(x), jnp.asarray(bt)))
    r = curve_fit("exp_sum_2", x, y, "auto", separable=True)
    assert bool(r.converged)
    rel = np.abs(np.asarray(r.minimizer) - bt) / np.abs(bt)
    assert rel.max() < 1e-4


def test_guess_exp_sum_k3_recovers_parameters():
    """guess_exp_sum(k=3): the triple-integral regression recovers all
    six parameters on clean data (rates within tens of percent), and the
    VarPro fit started there converges to truth."""
    from leastsquaresoptim_jl_tpu.models import exp_sum_separable, guess_exp_sum

    x = np.linspace(0.0, 6.0, 96)
    bt = np.array([3.0, 0.3, 2.0, 1.1, 1.0, 3.5])
    y = sum(bt[2 * j] * np.exp(-bt[2 * j + 1] * x) for j in range(3))
    g = np.asarray(guess_exp_sum(x, jnp.asarray(y), 3), np.float64)
    rel = np.abs(g - bt) / np.abs(bt)
    assert rel[1::2].max() < 0.25, (g, bt)  # rates
    r = curve_fit(exp_sum_separable(3), x, y, g, separable=True)
    assert bool(r.converged)
    fit_rel = np.abs(np.asarray(r.minimizer) - bt) / np.abs(bt)
    assert fit_rel.max() < 1e-3


def test_guess_exp_sum_matches_exp_sum_2_and_k1():
    from leastsquaresoptim_jl_tpu.models import guess_exp_sum

    x, y, _ = _data("exp_sum_2")
    np.testing.assert_array_equal(
        np.asarray(guess_exp_sum(x, y, 2)),
        np.asarray(guess_p0("exp_sum_2", x, y)),
    )
    y1 = 2.0 * np.exp(-0.7 * np.asarray(x))
    g1 = np.asarray(guess_exp_sum(x, jnp.asarray(y1), 1), np.float64)
    assert np.abs(g1 - [2.0, 0.7]).max() < 0.05
    with pytest.raises(ValueError, match="k in"):
        guess_exp_sum(x, y, 4)


def test_named_k_term_models_resolve():
    """The string names 'exp_sum_3'/'gauss_sum_2'/'gauss_sum_3' resolve
    through CURVES, SEPARABLE, and INITIALIZERS: separable auto-start
    fits work (exp_sum_3 also composes with gridded=True) and match the
    joint model's values."""
    from leastsquaresoptim_jl_tpu.models.curves import CURVES, gridded_model
    from leastsquaresoptim_jl_tpu.models.separable import SEPARABLE

    for name in ("exp_sum_3", "gauss_sum_2", "gauss_sum_3"):
        assert name in CURVES and name in SEPARABLE
        x, bt = CASES[name]
        bt = np.asarray(bt, np.float64)
        y = np.asarray(CURVES[name](jnp.asarray(x), jnp.asarray(bt)))
        r = curve_fit(name, x, y, "auto", separable=True)
        assert bool(r.converged), name
        rel = np.abs(np.asarray(r.minimizer) - bt) / np.abs(bt)
        assert rel.max() < 1e-4, (name, np.asarray(r.minimizer), bt)
    # gridded exp_sum_3 basis agrees with the naive model to f64 ulps
    x, bt = CASES["exp_sum_3"]
    bt = np.asarray(bt)
    gm = gridded_model("exp_sum_3", float(x[0]), float(x[1] - x[0]), len(x))
    y_naive = np.asarray(CURVES["exp_sum_3"](jnp.asarray(x), jnp.asarray(bt)))
    y_grid = np.asarray(gm(jnp.asarray(x), jnp.asarray(bt)))
    np.testing.assert_allclose(y_grid, y_naive, rtol=1e-12)
    # and the gridded separable fit converges too
    y = y_naive
    r = curve_fit_batch(
        "exp_sum_3", x, jnp.asarray(y)[None, :], "auto",
        separable=True, gridded=True, min_converged_fraction=1.0,
    )
    assert np.asarray(r["converged"]).all()


def test_separable_model_auto_p0():
    """p0='auto' flows through SeparableModel.guess: exp_sum_separable(3)
    fits start-free; a guess-less SeparableModel raises."""
    from leastsquaresoptim_jl_tpu.models import (
        SeparableModel, exp_sum_separable,
    )

    x = np.linspace(0.0, 6.0, 96)
    bt = np.array([3.0, 0.3, 2.0, 1.1, 1.0, 3.5])
    y = sum(bt[2 * j] * np.exp(-bt[2 * j + 1] * x) for j in range(3))
    sep3 = exp_sum_separable(3)
    r = curve_fit(sep3, x, y, "auto", separable=True)
    assert bool(r.converged)
    rel = np.abs(np.asarray(r.minimizer) - bt) / np.abs(bt)
    assert rel.max() < 1e-3
    # batched path too
    Y = jnp.stack([jnp.asarray(y), jnp.asarray(y) * 1.2])
    raw = curve_fit_batch(sep3, x, Y, "auto", separable=True,
                          min_converged_fraction=1.0)
    assert np.asarray(raw["converged"]).all()
    # no guess hook -> explicit error
    bare = SeparableModel((0,), (1,), lambda xx, a: (1.0 - jnp.exp(
        -a[0] * xx))[..., None])
    with pytest.raises(ValueError, match="auto"):
        curve_fit(bare, x, y, "auto", separable=True)


def test_guess_exp_sum_k3_noise_and_batch():
    """k=3 guesses stay in-basin under 0.5% noise, batched."""
    from leastsquaresoptim_jl_tpu.models import guess_exp_sum

    x = np.linspace(0.0, 6.0, 96)
    bt = np.array([3.0, 0.3, 2.0, 1.1, 1.0, 3.5])
    y = sum(bt[2 * j] * np.exp(-bt[2 * j + 1] * x) for j in range(3))
    rng = np.random.default_rng(11)
    B = 8
    Y = y[None, :] + 0.005 * np.abs(y).max() * rng.standard_normal((B, 96))
    G = np.asarray(guess_exp_sum(x, jnp.asarray(Y), 3), np.float64)
    assert G.shape == (B, 6)
    assert np.isfinite(G).all()
    # rates ascending per row (canonical layout) and in a sane band
    rates = G[:, 1::2]
    assert (np.diff(rates, axis=1) >= 0).all()
    assert (rates > 0).all()
    # median rate error across the batch stays within ~50% under noise
    rel = np.abs(rates - bt[1::2]) / bt[1::2]
    assert np.median(rel, axis=0).max() < 0.5


def test_lanczos3_start_free_certified():
    """Start-free NIST Lanczos3: the canonical sloppy 3-exponential whose
    certified starts the reference hand-feeds (test/nonlinearfitting.jl)
    fits to the certified solution from guess_exp_sum alone — the raw
    integral-regression guess already lands within ~2% of x* on all six
    parameters, and the VarPro fit certifies at the NIST 1e-3 criterion."""
    from leastsquaresoptim_jl_tpu.models import (
        NIST_DATASETS, exp_sum_separable, guess_exp_sum,
    )

    d = NIST_DATASETS["Lanczos3"]
    x = np.asarray(d["x"])
    y = np.asarray(d["y"])
    sol = np.asarray(d["solution"])
    g = np.asarray(guess_exp_sum(x, jnp.asarray(y), 3), np.float64)
    assert (np.abs(g - sol) / np.abs(sol)).max() < 0.10
    r = curve_fit(exp_sum_separable(3), x, y, "auto", separable=True)
    assert bool(r.converged)
    assert np.abs(np.asarray(r.minimizer) - sol).max() < 1e-3


def test_gauss_sum_separable_auto_fit():
    """gauss_sum_separable(k) + p0='auto' (greedy peak extraction):
    clean k=2 and k=3 peak sums recover the generating parameters to
    certified accuracy, canonical layout (centers ascending, widths
    positive)."""
    from leastsquaresoptim_jl_tpu.models import gauss_sum_separable

    x = np.linspace(0.0, 10.0, 128)
    for bt in (
        np.array([3.0, 2.5, 0.6, 1.8, 6.5, 0.9]),
        np.array([2.0, 2.0, 0.5, 3.0, 5.0, 0.8, 1.5, 8.0, 0.6]),
    ):
        k = len(bt) // 3
        y = sum(
            bt[3 * j] * np.exp(-((x - bt[3 * j + 1]) ** 2)
                               / (2 * bt[3 * j + 2] ** 2))
            for j in range(k)
        )
        r = curve_fit(gauss_sum_separable(k), x, y, "auto", separable=True)
        assert bool(r.converged), k
        mins = np.asarray(r.minimizer)
        rel = np.abs(mins - bt) / np.abs(bt)
        assert rel.max() < 1e-6, (k, mins, bt)
        # canonical: centers ascending, widths positive
        assert (np.diff(mins[1::3]) > 0).all()
        assert (mins[2::3] > 0).all()


def test_gauss_sum_guess_noise_robust():
    """Auto-started 2-peak fits under 5% noise converge to the noise
    floor (basin membership, the initializer contract)."""
    from leastsquaresoptim_jl_tpu.models import gauss_sum_separable

    x = np.linspace(0.0, 10.0, 128)
    sep = gauss_sum_separable(2)
    ok = 0
    for seed in range(6):
        r2 = np.random.default_rng(seed)
        bt = np.array([
            r2.uniform(1, 4), r2.uniform(1.5, 3.5), r2.uniform(0.3, 1.0),
            r2.uniform(1, 4), r2.uniform(5.5, 8.5), r2.uniform(0.3, 1.0),
        ])
        y = sum(bt[3 * j] * np.exp(-((x - bt[3 * j + 1]) ** 2)
                                   / (2 * bt[3 * j + 2] ** 2))
                for j in range(2))
        y = y + 0.05 * np.abs(y).max() * r2.standard_normal(y.shape)
        r = curve_fit(sep, x, y, "auto", separable=True)
        mins = np.asarray(r.minimizer)
        yfit = sum(mins[3 * j] * np.exp(-((x - mins[3 * j + 1]) ** 2)
                                        / (2 * mins[3 * j + 2] ** 2))
                   for j in range(2))
        floor = (0.05 * np.abs(y).max()) ** 2 * len(x)
        ok += bool(r.converged) and ((y - yfit) ** 2).sum() <= 1.5 * floor
    assert ok >= 5


def test_guess_gauss_sum_degenerate_x_finite():
    """Constant (zero-span) x must yield a FINITE start (the module
    contract: flat/degenerate data produce mediocre starts, not NaN) —
    regression for the underflowing localization window W*W -> 0."""
    from leastsquaresoptim_jl_tpu.models import guess_gauss_sum

    y = np.array([1.0, 2.0, 1.5, 0.5] * 8)
    for xc in (2.0, 0.0):
        g = np.asarray(guess_gauss_sum(np.full(32, xc), jnp.asarray(y), 2))
        assert np.isfinite(g).all(), (xc, g)


def test_guess_gauss_sum_batched_jit():
    import jax

    from leastsquaresoptim_jl_tpu.models import guess_gauss_sum

    x = np.linspace(0.0, 10.0, 128)
    bt = np.array([3.0, 2.5, 0.6, 1.8, 6.5, 0.9])
    y = sum(bt[3 * j] * np.exp(-((x - bt[3 * j + 1]) ** 2)
                               / (2 * bt[3 * j + 2] ** 2))
            for j in range(2))
    g = np.asarray(guess_gauss_sum(x, jnp.asarray(y), 2))
    gj = jax.jit(lambda a, b: guess_gauss_sum(a, b, 2))(
        jnp.asarray(x), jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(gj), g)
    Y = jnp.stack([jnp.asarray(y), jnp.asarray(y) * 1.4])
    G = guess_gauss_sum(x, Y, 2)
    assert G.shape == (2, 6)
    assert np.isfinite(np.asarray(G)).all()
    with pytest.raises(ValueError, match="k >= 1"):
        guess_gauss_sum(x, y, 0)


def test_guess_dtype_follows_data():
    x, y, _ = _data("gaussian")
    g32 = guess_p0("gaussian", x, np.asarray(y, np.float32))
    assert g32.dtype == jnp.float32


def test_spd_chol_solve_batched_large_n():
    """The n > 8 XLA Cholesky path must accept LEADING BATCH AXES: the
    batched k>8 initializer Gram reaches it directly (no vmap), and
    ndarray.T on a (B, n, n) factor reverses ALL axes — regression for
    the swapaxes fix in ops/linalg.spd_chol_solve."""
    from leastsquaresoptim_jl_tpu.ops.linalg import spd_chol_solve

    rng = np.random.default_rng(3)
    B, n = 4, 12  # n > UNROLLED_SOLVE_MAX_N = 8
    A = rng.standard_normal((B, n, 2 * n))
    G = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
    r = rng.standard_normal((B, n))
    got = np.asarray(spd_chol_solve(jnp.asarray(G), jnp.asarray(r)))
    want = np.linalg.solve(G, r[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_guess_gauss_sum_batched_k9():
    """k > 8 sends the amplitude re-solve down the XLA Cholesky path;
    batched data must still give finite, shaped guesses (this crashed
    before the spd_chol_solve batched-transpose fix)."""
    from leastsquaresoptim_jl_tpu.models import guess_gauss_sum

    k, m, B = 9, 512, 3
    x = np.linspace(0.0, 90.0, m)
    rng = np.random.default_rng(5)
    mus = np.linspace(5.0, 85.0, k)
    y = sum(
        (2.0 + j) * np.exp(-((x - mus[j]) ** 2) / (2 * 1.5**2))
        for j in range(k)
    )
    Y = jnp.asarray(
        np.stack([y * (1.0 + 0.1 * b) for b in range(B)])
        + 0.01 * rng.standard_normal((B, m))
    )
    G = guess_gauss_sum(x, Y, k)
    assert G.shape == (B, 3 * k)
    assert np.isfinite(np.asarray(G)).all()


def test_exp_sum_2_registered_with_guess_hook():
    """SEPARABLE['exp_sum_2'] is built by exp_sum_separable(2) so the
    OBJECT carries the guess hook — p0='auto' must work the same whether
    the user passes the name or the SeparableModel itself (it used to be
    a hand literal without the hook and only the name worked)."""
    from leastsquaresoptim_jl_tpu.models.separable import SEPARABLE

    x = np.linspace(0.0, 6.0, 64)
    bt = np.array([2.5, 0.5, 1.2, 2.2])
    y = bt[0] * np.exp(-bt[1] * x) + bt[2] * np.exp(-bt[3] * x)
    sep = SEPARABLE["exp_sum_2"]
    assert sep.guess is not None
    r = curve_fit(sep, x, y, "auto", separable=True)
    assert bool(r.converged)
    rel = np.abs(np.asarray(r.minimizer) - bt) / np.abs(bt)
    assert rel.max() < 1e-3
