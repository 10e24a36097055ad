"""Fused residual+Jacobian evaluation schedule (opt-in, ``fused=True``).

ROADMAP #3 / round-2 VERDICT next #1: the fused schedule evaluates
residual AND Jacobian together at the trial point — one shared primal via
jax.linearize; Gram products carried for Cholesky, flat J for QR —
halving model-evaluation cost. On the data-bound headline workload it
measured 0.95-0.99x (the model's exp() is not the bottleneck there), so
the default stays unfused and the schedule is an opt-in for genuinely
expensive residuals (benchmarks/README.md round 3). These tests pin the
semantic guarantee: same trajectory (iteration counts, work counters) and
same minimizers as the unfused path.

Reference analogue: the user-g! analytic-Jacobian path
(/root/reference/src/types.jl:54-66) — this is its TPU-efficient form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import leastsquaresoptim_jl_tpu as lso


def _batch(B=48, m=32, seed=0):
    rng = np.random.default_rng(seed)
    xd = np.linspace(1.0, 80.0, m)
    bt = np.stack([rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], 1)
    Y = bt[:, :1] * (1 - np.exp(-bt[:, 1:2] * xd[None, :]))
    x0 = bt * rng.uniform(0.7, 1.4, (B, 2))

    def f(b, d):
        xdd, yd = d
        return yd - b[0] * (1 - jnp.exp(-b[1] * xdd))

    data = (jnp.broadcast_to(jnp.asarray(xd), (B, m)), jnp.asarray(Y))
    return f, jnp.asarray(x0), data, m


@pytest.mark.parametrize(
    "opt",
    [
        lso.LevenbergMarquardt(lso.Cholesky()),
        lso.Dogleg(lso.Cholesky()),
        lso.LevenbergMarquardt(lso.QR()),
    ],
    ids=["lm-chol", "dogleg-chol", "lm-qr"],
)
def test_fused_equals_unfused_batched(opt):
    f, x0, data, m = _batch()
    opts = lso.Options(iterations=50)
    r_f = lso.solve_batch(f, x0, data, opt, output_length=m,
                          options=opts, fused=True)
    r_u = lso.solve_batch(f, x0, data, opt, output_length=m,
                          options=opts, fused=False)
    # identical trajectory: iteration counts and counters match exactly
    for k in ("iterations", "f_calls", "g_calls", "converged"):
        assert np.array_equal(np.asarray(r_f[k]), np.asarray(r_u[k])), k
    assert np.allclose(
        np.asarray(r_f["minimizer"]), np.asarray(r_u["minimizer"]),
        rtol=1e-12, atol=1e-12,
    )
    assert np.asarray(r_f["converged"]).all()


def test_fused_default_off_and_equivalent():
    """The default schedule is unfused (measured faster on the data-bound
    headline workload; api.solve docstring) and the fused opt-in follows
    the same trajectory."""
    f, x0, data, m = _batch(B=16)
    opts = lso.Options(iterations=50)
    r_d = lso.solve_batch(f, x0, data, output_length=m, options=opts)
    r_u = lso.solve_batch(f, x0, data, output_length=m, options=opts,
                          fused=False)
    r_f = lso.solve_batch(f, x0, data, output_length=m, options=opts,
                          fused=True)
    assert np.array_equal(np.asarray(r_d["minimizer"]),
                          np.asarray(r_u["minimizer"]))  # default == unfused
    assert np.array_equal(np.asarray(r_d["iterations"]),
                          np.asarray(r_f["iterations"]))
    assert np.allclose(np.asarray(r_d["minimizer"]),
                       np.asarray(r_f["minimizer"]), rtol=1e-12)


def test_fused_fraction_stop_matches_plain_vmap():
    """The fraction-stop loop (the bench path) under fused evaluation
    reaches the same minimizers as plain vmap at frac=1.0."""
    f, x0, data, m = _batch(B=24, seed=3)
    opts = lso.Options(iterations=50)
    r_frac = lso.solve_batch(
        f, x0, data, lso.LevenbergMarquardt(lso.Cholesky()),
        output_length=m, options=opts, min_converged_fraction=1.0,
    )
    r_plain = lso.solve_batch(
        f, x0, data, lso.LevenbergMarquardt(lso.Cholesky()),
        output_length=m, options=opts,
    )
    assert np.asarray(r_frac["converged"]).all()
    assert np.allclose(np.asarray(r_frac["minimizer"]),
                       np.asarray(r_plain["minimizer"]),
                       rtol=1e-10, atol=1e-10)


def test_fused_sequential_solve_matches():
    """fused=True on a single (non-batched) solve follows the same
    trajectory as the default path."""
    def f(x):
        return jnp.array([1.0 - x[0], 10.0 * (x[1] - x[0] ** 2)])

    p = lso.least_squares_problem(f=f, x=jnp.zeros(2))
    r_u = lso.solve(p, lso.LevenbergMarquardt(lso.Cholesky()))
    r_f = lso.solve(p, lso.LevenbergMarquardt(lso.Cholesky()), fused=True)
    assert int(r_f["iterations"]) == int(r_u["iterations"])
    assert np.allclose(np.asarray(r_f["minimizer"]),
                       np.asarray(r_u["minimizer"]), atol=1e-12)
    # fused counters keep the reference accounting
    assert int(r_f["g_calls"]) == int(r_u["g_calls"])
    assert int(r_f["f_calls"]) == int(r_u["f_calls"])


def test_fused_with_user_jacobian():
    """A user-supplied analytic g composes with the fused schedule (XLA CSE
    shares common subexpressions between f and g traced together)."""
    xd = jnp.linspace(1.0, 10.0, 20)
    yd = 3.0 * (1 - jnp.exp(-0.4 * xd))

    def f(b):
        return yd - b[0] * (1 - jnp.exp(-b[1] * xd))

    def g(b):
        e = jnp.exp(-b[1] * xd)
        return jnp.stack([-(1 - e), -b[0] * xd * e], axis=1)

    p = lso.least_squares_problem(f=f, x=jnp.array([2.0, 0.2]), g=g)
    raw = lso.solve(p, lso.LevenbergMarquardt(lso.Cholesky()), fused=True)
    assert bool(raw["converged"])
    assert np.allclose(np.asarray(raw["minimizer"]), [3.0, 0.4], atol=1e-8)


def test_fused_rejected_for_matrix_free_and_sparse():
    def f(x):
        return jnp.concatenate([x * 2.0, x[:1] - 1.0])

    p_mf = lso.least_squares_problem(
        f=f, x=jnp.ones(3), materialize_jacobian=False
    )
    with pytest.raises(ValueError, match="fused"):
        lso.solve(p_mf, lso.LevenbergMarquardt(lso.LSMR()), fused=True)
    # default (None) silently stays unfused for matrix-free problems
    raw = lso.solve(p_mf, lso.LevenbergMarquardt(lso.LSMR()))
    assert bool(raw["converged"])


def test_fused_nonfinite_poisoning_parity():
    """A step into non-finite territory halts the loop with
    STATUS_NOT_FINITE under the fused schedule too (the carried J stays
    the one from the last finite iterate)."""
    def f(x):
        # overflows for x[0] much above ~30 in f64 exp(x^2)
        return jnp.array([jnp.exp(x[0] ** 2) - 2.0, x[1] - 1.0])

    p = lso.least_squares_problem(f=f, x=jnp.array([40.0, 0.0]))
    raw = lso.solve(p, lso.LevenbergMarquardt(lso.Cholesky()), fused=True)
    raw_u = lso.solve(p, lso.LevenbergMarquardt(lso.Cholesky()), fused=False)
    assert int(raw["status"]) == int(raw_u["status"])


# --- fused="ssr": dd-SSR carry (no residual in the loop carry) ----------


def test_sumabs2_dd_matches_f64():
    """The two-float sum of squares represents the exact sum to ~eps^2
    relative (pairwise dd reduction over the static axis)."""
    from leastsquaresoptim_jl_tpu.ops.linalg import dd_diff, sumabs2_dd

    rng = np.random.default_rng(0)
    for m in (1, 3, 17, 64, 250):
        x = (rng.standard_normal((5, m)) * 10).astype(np.float32)
        hi, lo = sumabs2_dd(jnp.asarray(x))
        exact = (x.astype(np.float64) ** 2).sum(-1)
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        assert np.max(np.abs(got - exact) / exact) < 1e-13, m
    # ared at the f-criterion scale: two vectors differing by ~1e-5
    x = rng.standard_normal((5, 64)).astype(np.float32)
    y = (x + 1e-5 * rng.standard_normal((5, 64))).astype(np.float32)
    ah, al = sumabs2_dd(jnp.asarray(x))
    bh, bl = sumabs2_dd(jnp.asarray(y))
    ared = np.asarray(dd_diff(ah, al, bh, bl), np.float64)
    exact = (x.astype(np.float64) ** 2).sum(-1) - (
        y.astype(np.float64) ** 2
    ).sum(-1)
    assert np.max(np.abs((ared - exact) / exact)) < 1e-6


@pytest.mark.parametrize(
    "opt",
    [lso.LevenbergMarquardt(lso.Cholesky()), lso.Dogleg(lso.Cholesky())],
    ids=["lm-chol", "dogleg-chol"],
)
def test_fused_ssr_equals_fused_batched(opt):
    """fused='ssr' follows the fused=True trajectory (in f64 the dd ared
    and the cancellation-free elementwise ared agree far below every
    decision threshold, so iteration counts match exactly)."""
    f, x0, data, m = _batch()
    opts = lso.Options(iterations=50)
    r_s = lso.solve_batch(f, x0, data, opt, output_length=m,
                          options=opts, fused="ssr")
    r_f = lso.solve_batch(f, x0, data, opt, output_length=m,
                          options=opts, fused=True)
    for k in ("iterations", "f_calls", "g_calls", "converged"):
        assert np.array_equal(np.asarray(r_s[k]), np.asarray(r_f[k])), k
    assert np.allclose(
        np.asarray(r_s["minimizer"]), np.asarray(r_f["minimizer"]),
        rtol=1e-12, atol=1e-12,
    )
    assert np.asarray(r_s["converged"]).all()


def test_fused_ssr_fraction_stop():
    """The fraction-stop loop (the bench path) composes with fused='ssr' —
    same minimizers as plain vmap fused=True at frac=1.0."""
    f, x0, data, m = _batch(B=24, seed=3)
    opts = lso.Options(iterations=50)
    r_s = lso.solve_batch(
        f, x0, data, lso.LevenbergMarquardt(lso.Cholesky()),
        output_length=m, options=opts, min_converged_fraction=1.0,
        fused="ssr",
    )
    r_f = lso.solve_batch(
        f, x0, data, lso.LevenbergMarquardt(lso.Cholesky()),
        output_length=m, options=opts, fused=True,
    )
    assert np.asarray(r_s["converged"]).all()
    assert np.allclose(np.asarray(r_s["minimizer"]),
                       np.asarray(r_f["minimizer"]),
                       rtol=1e-10, atol=1e-10)


def test_fused_ssr_varpro_route():
    """The headline composition: VarPro + gridded + fused='ssr' through
    curve_fit_batch reaches the same fits as fused=True."""
    from leastsquaresoptim_jl_tpu.models import curve_fit_batch

    B, m = 32, 64
    rng = np.random.default_rng(5)
    xd = np.linspace(1.0, 80.0, m)
    bt = np.stack([rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], 1)
    Y = bt[:, :1] * (1 - np.exp(-bt[:, 1:2] * xd[None, :]))
    x0 = jnp.asarray(bt * rng.uniform(0.7, 1.4, (B, 2)))
    kw = dict(
        optimizer=lso.LevenbergMarquardt(lso.Cholesky()),
        options=lso.Options(iterations=50),
        min_converged_fraction=1.0, separable=True, gridded=True,
    )
    r_s = curve_fit_batch("exp_saturation", xd, jnp.asarray(Y), x0,
                          fused="ssr", **kw)
    r_f = curve_fit_batch("exp_saturation", xd, jnp.asarray(Y), x0,
                          fused=True, **kw)
    assert np.asarray(r_s["converged"]).all()
    assert np.allclose(np.asarray(r_s["minimizer"]),
                       np.asarray(r_f["minimizer"]), rtol=1e-10, atol=1e-10)


def test_fused_ssr_rejected_for_qr_and_unknown_mode():
    def f(x):
        return jnp.array([1.0 - x[0], 10.0 * (x[1] - x[0] ** 2)])

    p = lso.least_squares_problem(f=f, x=jnp.zeros(2))
    with pytest.raises(ValueError, match="ssr"):
        lso.solve(p, lso.LevenbergMarquardt(lso.QR()), fused="ssr")
    with pytest.raises(ValueError, match="unknown fused mode"):
        lso.solve(p, lso.LevenbergMarquardt(lso.Cholesky()), fused="gram")


def test_fused_ssr_nonfinite_poisoning_parity():
    def f(x):
        return jnp.array([jnp.exp(x[0] ** 2) - 2.0, x[1] - 1.0])

    p = lso.least_squares_problem(f=f, x=jnp.array([40.0, 0.0]))
    raw = lso.solve(p, lso.LevenbergMarquardt(lso.Cholesky()), fused="ssr")
    raw_u = lso.solve(p, lso.LevenbergMarquardt(lso.Cholesky()), fused=False)
    assert int(raw["status"]) == int(raw_u["status"])


@pytest.mark.parametrize(
    "opt",
    [lso.LevenbergMarquardt(lso.Cholesky()), lso.Dogleg(lso.Cholesky())],
    ids=["lm", "dogleg"],
)
def test_fused_gram_bounds_active_set(opt):
    """The fused-gram bounds refinement solves the active-set system in
    Gram space (rhs J'(f - J dx_a) = b - G dx_a) — must match the unfused
    operator-space refinement and still certify KKT at the bound."""
    x = jnp.linspace(0.1, 6.0, 40)
    true = jnp.array([2.4, 0.5])
    y = true[0] * (1 - jnp.exp(-true[1] * x))

    def f(b):
        return y - b[0] * (1 - jnp.exp(-b[1] * x))

    p = lso.least_squares_problem(f=f, x=jnp.array([3.0, 1.0]))
    kw = dict(
        options=lso.Options(x_tol=0.0, f_tol=0.0),
        lower=jnp.array([2.6, 0.0]),
        x0=jnp.array([3.0, 1.0]),
    )
    r_u = lso.solve(p, opt, fused=False, **kw)
    r_f = lso.solve(p, opt, fused=True, **kw)
    assert bool(r_f["g_converged"])  # KKT certified at the active bound
    assert np.isclose(float(r_f["minimizer"][0]), 2.6)
    assert np.allclose(np.asarray(r_f["minimizer"]),
                       np.asarray(r_u["minimizer"]), atol=1e-10)
    assert int(r_f["iterations"]) == int(r_u["iterations"])
