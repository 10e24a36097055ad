"""Geodesic acceleration for LM (opt-in, ``LevenbergMarquardt(geodesic=True)``).

Beyond-reference feature (Transtrum & Sethna 2012; the reference
/root/reference has no analogue): each iteration adds half the
second-order correction ``a/2`` to the step, where ``a`` solves the same
damped system with the exact directional second derivative ``f''[v, v]``
(forward-over-forward JVP) as rhs, guarded by the standard
``||a|| <= 0.75 ||v||`` trust test (config.GEODESIC_ALPHA) — the
correction is *dropped*, never the step, so an accepted geodesic step is
always at least as model-consistent as plain LM.

Measured on the NIST f64 suite (CPU): total iterations 2684 -> 2217,
with the sloppy exponential sums cut ~2x (Bennet5 s0 348 -> 222,
MGH10 s1 175 -> 86, Lanczos3 s0 92 -> 57) and MGH09 s0 recovering the
certified basin that plain LM misses (rel err 7e3 -> 1.3e-4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.models.nist import DATASETS, MODELS


def _rosen(x):
    return jnp.array([1 - x[0], 100 * (x[1] - x[0] ** 2)])


def test_geodesic_rosenbrock_fewer_iterations():
    plain = lso.optimize(_rosen, jnp.zeros(2), lso.LevenbergMarquardt())
    geo = lso.optimize(
        _rosen, jnp.zeros(2), lso.LevenbergMarquardt(geodesic=True)
    )
    assert plain.converged and geo.converged
    assert np.allclose(np.asarray(geo.minimizer), [1.0, 1.0], atol=1e-6)
    # 35 vs 56 on CPU f64; gate loosely on "strictly fewer".
    assert int(geo.iterations) < int(plain.iterations)
    # the second-order evals are charged: 3 f_calls per iteration + seed
    assert int(geo.f_calls) == 3 * int(geo.iterations) + 1


def _nist_problem(name, start_idx):
    d = DATASETS[name]
    mdl = MODELS[name]
    xd, yd = jnp.asarray(d["x"]), jnp.asarray(d["y"])
    f = lambda b: mdl(xd, b) - yd
    x0 = jnp.asarray(d["starts"][start_idx], jnp.float64)
    sol = np.asarray(d["solution"])
    return f, x0, sol


@pytest.mark.parametrize(
    "name,sidx,plain_iters",
    [("MGH10", 1, 175), ("Bennet5", 0, 348), ("Lanczos3", 0, 92)],
)
def test_geodesic_cuts_sloppy_exponential_iterations(name, sidx, plain_iters):
    """The headline wins: the sloppy exponential sums converge in ~half
    the iterations with the correction on. plain_iters pins the measured
    plain-LM count so a plain-path regression also surfaces here."""
    f, x0, sol = _nist_problem(name, sidx)
    plain = lso.optimize(f, x0, lso.LevenbergMarquardt())
    geo = lso.optimize(f, x0, lso.LevenbergMarquardt(geodesic=True))
    assert plain.converged and geo.converged
    assert abs(int(plain.iterations) - plain_iters) <= plain_iters // 4
    assert int(geo.iterations) <= (2 * int(plain.iterations)) // 3
    rel = np.max(
        np.abs(np.asarray(geo.minimizer) - sol) / np.maximum(np.abs(sol), 1e-30)
    )
    assert rel < 2e-3  # Lanczos3-geo stops at ~1.8e-3 (earlier f-stop)


def test_geodesic_recovers_mgh09_basin():
    """MGH09 from the certified far start: plain LM lands in a spurious
    basin (rel err ~7e3); the geodesic trajectory reaches the certified
    solution. A measured — not incidental — robustness win."""
    f, x0, sol = _nist_problem("MGH09", 0)
    geo = lso.optimize(f, x0, lso.LevenbergMarquardt(geodesic=True))
    rel = np.max(np.abs(np.asarray(geo.minimizer) - sol) / np.abs(sol))
    assert geo.converged and rel < 1e-3


def _curve_batch(B=24, m=32, seed=3):
    rng = np.random.default_rng(seed)
    xd = np.linspace(1.0, 80.0, m)
    bt = np.stack([rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], 1)
    Y = bt[:, :1] * (1 - np.exp(-bt[:, 1:2] * xd[None, :]))
    x0 = bt * rng.uniform(0.7, 1.4, (B, 2))
    return jnp.asarray(xd), jnp.asarray(Y), jnp.asarray(x0), bt


def test_geodesic_batched_matches_sequential():
    xd, Y, x0, bt = _curve_batch()

    def f(b, y):
        return b[0] * (1 - jnp.exp(-b[1] * xd)) - y

    opt = lso.LevenbergMarquardt(lso.Cholesky(), geodesic=True)
    batched = lso.solve_batch(f, x0, data_batch=Y, data_axis=0, optimizer=opt)
    for i in range(x0.shape[0]):
        single = lso.optimize(lambda b: f(b, Y[i]), x0[i], opt)
        assert np.allclose(
            np.asarray(batched["minimizer"][i]),
            np.asarray(single.minimizer),
            rtol=1e-10,
            atol=1e-10,
        )
        assert int(batched["iterations"][i]) == int(single.iterations)


def test_geodesic_fraction_stop_batch():
    """Geodesic threads through the fraction-stop batched driver
    (batch.py _solve_batch_fraction passes the tag's geodesic flag to
    loop_pieces): the batch converges and the minimizers match the
    plain-LM batch to solver tolerance."""
    xd, Y, x0, bt = _curve_batch(B=16)

    def f(b, y):
        return b[0] * (1 - jnp.exp(-b[1] * xd)) - y

    raws = {}
    for geo in (False, True):
        raws[geo] = lso.solve_batch(
            f, x0, data_batch=Y, data_axis=0,
            optimizer=lso.LevenbergMarquardt(lso.Cholesky(), geodesic=geo),
            min_converged_fraction=1.0,
        )
        assert bool(jnp.all(raws[geo]["converged"]))
    assert np.allclose(
        np.asarray(raws[True]["minimizer"]), bt, rtol=1e-8
    )


def test_geodesic_fused_gram_matches_unfused():
    """The Gram-carry schedule has no operator: its acceleration rhs goes
    through an explicit VJP + the carried SPD system. Same minimizer."""
    xd, Y, x0, bt = _curve_batch(B=6)

    def fit(i, fused):
        prob = lso.least_squares_problem(
            f=lambda b: b[0] * (1 - jnp.exp(-b[1] * xd)) - Y[i], x=x0[i]
        )
        raw = lso.solve(
            prob,
            lso.LevenbergMarquardt(lso.Cholesky(), geodesic=True),
            fused=fused,
        )
        return np.asarray(raw["minimizer"]), int(raw["iterations"])

    for i in range(x0.shape[0]):
        mu, itu = fit(i, False)
        mf, itf = fit(i, True)
        assert np.allclose(mu, bt[i], rtol=1e-6)
        assert np.allclose(mf, bt[i], rtol=1e-6)


def test_geodesic_with_active_bound():
    """Geodesic composes with box bounds: the accelerated step feeds the
    same clip + active-set refinement, and the projected-gradient KKT
    test certifies the active-bound stop."""
    xd = jnp.linspace(0.0, 4.0, 40)
    y = 2.5 * (1 - jnp.exp(-1.3 * xd))

    def f(b):
        return b[0] * (1 - jnp.exp(-b[1] * xd)) - y

    upper = jnp.array([jnp.inf, 1.0])  # rate capped below its optimum
    r = lso.optimize(
        f, jnp.array([1.0, 0.5]),
        lso.LevenbergMarquardt(geodesic=True), upper=upper,
    )
    assert r.converged
    assert float(np.asarray(r.minimizer)[1]) <= 1.0 + 1e-12
    assert abs(float(np.asarray(r.minimizer)[1]) - 1.0) < 1e-6


def test_geodesic_matrix_free_lsmr():
    """Geodesic composes with the matrix-free LSMR path: f''vv comes from
    AD of the residual, the acceleration from the same damped LSMR solve."""
    f, x0, sol = _nist_problem("misra1a", 0)
    prob = lso.least_squares_problem(
        f=f, x=x0, output_length=len(DATASETS["misra1a"]["y"]),
        materialize_jacobian=False,
    )
    raw = lso.solve(
        prob, lso.LevenbergMarquardt(lso.LSMR(), geodesic=True)
    )
    rel = np.max(np.abs(np.asarray(raw["minimizer"]) - sol) / np.abs(sol))
    assert bool(raw["converged"]) and rel < 1e-6
