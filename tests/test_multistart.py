"""Multi-start solves: one vmapped kernel over many starts, best picked."""

import jax
import jax.numpy as jnp
import numpy as np

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.models.nist import DATASETS, MODELS


def test_latin_hypercube_starts_stratified():
    key = jax.random.PRNGKey(0)
    S = 16
    lo = jnp.array([0.0, -1.0])
    hi = jnp.array([2.0, 1.0])
    starts = lso.latin_hypercube_starts(key, S, lo, hi)
    assert starts.shape == (S, 2)
    assert np.all(np.asarray(starts) >= np.asarray(lo))
    assert np.all(np.asarray(starts) <= np.asarray(hi))
    # stratification: each dimension has one sample per 1/S-cell
    for d in range(2):
        u = (np.asarray(starts[:, d]) - float(lo[d])) / float(hi[d] - lo[d])
        cells = np.floor(u * S).astype(int)
        assert len(set(cells.tolist())) == S


def test_multistart_cracks_hard_nist_start():
    """MGH10 from its certified far start defeats single-start LM (the one
    scoreboard miss in test_nist.py); a latin-hypercube multi-start around
    the same prior box recovers the certified solution."""
    d = DATASETS["MGH10"]
    model = MODELS["MGH10"]
    x = jnp.asarray(d["x"])
    y = jnp.asarray(d["y"])
    sol = np.asarray(d["solution"])

    def residual(beta):
        return y - model(x, beta)

    lo = jnp.array([1e-3, 1e2, 1e1])
    hi = jnp.array([1.0, 1e6, 1e3])
    starts = lso.latin_hypercube_starts(jax.random.PRNGKey(7), 64, lo, hi)
    best, allraw = lso.optimize_multistart(
        residual,
        starts,
        lso.LevenbergMarquardt(lso.QR()),
        output_length=len(d["y"]),
        options=lso.Options(iterations=300),
    )
    assert allraw["ssr"].shape == (64,)
    assert np.linalg.norm(np.asarray(best["minimizer"]) - sol) / np.linalg.norm(sol) <= 1e-4


def test_multistart_with_shared_data():
    def f(beta, data):
        xd, yd = data
        return yd - beta[0] * (1 - jnp.exp(-beta[1] * xd))

    xd = jnp.linspace(1.0, 60.0, 24)
    yd = 240.0 * (1 - jnp.exp(-5e-4 * xd))
    starts = jnp.array([[1.0, 1.0], [200.0, 1e-3], [500.0, 1e-2]])
    best, _ = lso.optimize_multistart(
        f, starts, data=(xd, yd), output_length=24
    )
    assert np.allclose(best["minimizer"], [240.0, 5e-4], rtol=1e-5)


def test_best_of_raw_jit_composable():
    """best_of_raw is pure and on-device: a full multistart pipeline
    (solve_batch -> best pick) compiles into ONE program, and the pick
    matches optimize_multistart's result."""
    import jax

    xdata = jnp.linspace(0.5, 8.0, 40)
    true = jnp.array([3.0, 0.7])
    ydata = true[0] * (1.0 - jnp.exp(-true[1] * xdata))

    def f(beta, d):
        x, y = d
        return y - beta[0] * (1.0 - jnp.exp(-beta[1] * x))

    starts = lso.latin_hypercube_starts(
        jax.random.PRNGKey(1), 16, jnp.array([0.5, 0.05]), jnp.array([10.0, 3.0])
    )

    @jax.jit
    def pipeline(starts, d):
        raw = lso.solve_batch(
            f, starts, d, output_length=40, data_axis=None,
            options=lso.Options(iterations=60),
        )
        return lso.best_of_raw(raw)

    best = pipeline(starts, (xdata, ydata))
    assert bool(np.asarray(best["converged"]))
    assert np.allclose(np.asarray(best["minimizer"]), np.asarray(true),
                       atol=1e-6)
    # matches the host-level verb
    host_best, _ = lso.optimize_multistart(
        f, starts, data=(xdata, ydata), output_length=40,
        options=lso.Options(iterations=60),
    )
    assert np.allclose(np.asarray(best["minimizer"]),
                       np.asarray(host_best["minimizer"]))


def test_best_of_raw_kkt_tie_break():
    """ssr_rtol enables the KKT-quality tie-break: among rows whose ssr
    ties within the tolerance, the smallest projected-gradient max wins;
    a decisively better ssr still wins regardless of gradient."""
    raw = {
        "ssr": jnp.asarray([1.0000, 1.0001, 2.5, jnp.inf]),
        "converged": jnp.asarray([True, True, True, False]),
        "maxabs_gr": jnp.asarray([1e-3, 1e-9, 1e-12, 0.0]),
        "minimizer": jnp.arange(4.0),
    }
    # default: plain min-ssr pick (row 0)
    assert float(lso.best_of_raw(raw)["minimizer"]) == 0.0
    # tie-break: rows 0/1 tie at 1e-2 rtol; row 1 has the smaller
    # gradient. Row 2 (tiny gradient, 2.5x worse ssr) must NOT win.
    best = lso.best_of_raw(raw, ssr_rtol=1e-2)
    assert float(best["minimizer"]) == 1.0
    # optimize_multistart passes the knob through
    xdata = jnp.linspace(0.5, 8.0, 30)
    ydata = 3.0 * (1.0 - jnp.exp(-0.7 * xdata))

    def f(beta, d):
        x, y = d
        return y - beta[0] * (1.0 - jnp.exp(-beta[1] * x))

    starts = jnp.asarray([[2.0, 0.5], [4.0, 1.0]])
    best2, _ = lso.optimize_multistart(
        f, starts, data=(xdata, ydata), output_length=30, ssr_rtol=1e-3
    )
    assert np.allclose(np.asarray(best2["minimizer"]), [3.0, 0.7], atol=1e-5)
