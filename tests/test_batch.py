"""Batched-solve gates: vmap-batch results must equal sequential results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import leastsquaresoptim_jl_tpu as lso


def _curve_model(x, beta):
    return beta[0] * (1.0 - jnp.exp(-beta[1] * x))


def test_batch_equals_sequential():
    """SURVEY.md §7 step 5 gate: per-problem convergence under vmap matches
    solving each problem alone (iterations included — carries freeze once a
    problem's own loop condition goes false)."""
    rng = np.random.default_rng(0)
    B, m = 16, 20
    xdata = jnp.array(np.linspace(1.0, 60.0, m))
    betas_true = jnp.array(
        np.stack([rng.uniform(100, 400, B), rng.uniform(2e-4, 2e-3, B)], 1)
    )
    ydata = jax.vmap(lambda b: _curve_model(xdata, b))(betas_true)
    x0s = betas_true * jnp.array(
        rng.uniform(0.5, 1.8, size=(B, 2))
    )

    def f(beta, data):
        xd, yd = data
        return yd - _curve_model(xd, beta)

    data = (jnp.broadcast_to(xdata, (B, m)), ydata)
    raw = lso.solve_batch(
        f, x0s, data, lso.LevenbergMarquardt(lso.Cholesky()), output_length=m
    )
    assert np.all(np.asarray(raw["converged"]))

    # sequential reference
    for i in range(B):
        p = lso.least_squares_problem(
            f=lambda b, i=i: f(b, (data[0][i], data[1][i])), x=x0s[i]
        )
        ref = lso.solve(p, lso.LevenbergMarquardt(lso.Cholesky()))
        assert np.allclose(
            raw["minimizer"][i], ref["minimizer"], atol=1e-9
        ), f"problem {i}"
        assert int(raw["iterations"][i]) == int(ref["iterations"]), f"problem {i}"

    # most starts should recover the (noise-free) global optimum; some far
    # starts may legitimately stop at local plateaus — equivalence above is
    # the real gate.
    ssr = np.asarray(raw["ssr"])
    assert np.mean(ssr <= 1e-8) >= 0.8


def test_batch_infeasible_start_raises():
    """Reference parity (levenberg_marquardt.jl:49-51): a start outside the
    box raises eagerly instead of being silently certified g_converged at
    an infeasible point."""
    def f(x):
        return jnp.concatenate([x - 3.0, jnp.atleast_1d(x[0] * x[1])])

    x0 = jnp.array([[0.5, 0.5], [-2.0, 0.5]])  # second row below lower
    import pytest

    with pytest.raises(ValueError, match="within bounds"):
        lso.solve_batch(f, x0, lower=jnp.zeros(2), upper=jnp.full(2, 5.0))


def test_batch_fraction_prefix_data_axis():
    """A vmap-style PREFIX data_axis tree (one axis leaf covering a whole
    data subtree) must work identically with and without the fraction-stop
    loop — vmap's in_axes resolves prefixes, so the probe must too."""
    rng = np.random.default_rng(3)
    B, m = 12, 16
    xdata = jnp.array(np.linspace(1.0, 60.0, m))
    betas_true = jnp.array(
        np.stack([rng.uniform(100, 400, B), rng.uniform(2e-4, 2e-3, B)], 1)
    )
    ydata = jax.vmap(lambda b: _curve_model(xdata, b))(betas_true)
    x0s = betas_true * jnp.array(rng.uniform(0.8, 1.2, size=(B, 2)))

    def f(beta, data):
        xd, obs = data
        return obs["y"] - _curve_model(xd, beta) * obs["w"]

    # axis leaf 0 covers the {'y','w'} subtree as a prefix
    data = (xdata, {"y": ydata, "w": jnp.ones((B, m))})
    axes = (None, 0)
    plain = lso.solve_batch(f, x0s, data, output_length=m, data_axis=axes)
    frac = lso.solve_batch(
        f, x0s, data, output_length=m, data_axis=axes,
        min_converged_fraction=1.0,
    )
    assert np.allclose(
        np.asarray(plain["minimizer"]), np.asarray(frac["minimizer"]),
        rtol=1e-12,
    )


def test_batch_fraction_stop():
    """min_converged_fraction: the fraction-stop loop ends a batch early,
    frozen fits are flagged unconverged, and every fit it did finish agrees
    exactly with the plain vmap path."""
    rng = np.random.default_rng(1)
    B, m = 24, 20
    xdata = jnp.array(np.linspace(1.0, 60.0, m))
    betas_true = jnp.array(
        np.stack([rng.uniform(100, 400, B), rng.uniform(2e-4, 2e-3, B)], 1)
    )
    ydata = jax.vmap(lambda b: _curve_model(xdata, b))(betas_true)
    x0s = betas_true * jnp.array(rng.uniform(0.5, 1.8, size=(B, 2)))

    def f(beta, data):
        xd, yd = data
        return yd - _curve_model(xd, beta)

    data = (jnp.broadcast_to(xdata, (B, m)), ydata)
    opt = lso.LevenbergMarquardt(lso.Cholesky())
    full = lso.solve_batch(f, x0s, data, opt, output_length=m)
    frac = lso.solve_batch(
        f, x0s, data, opt, output_length=m, min_converged_fraction=0.75
    )
    cf = np.asarray(frac["converged"])
    assert cf.mean() >= 0.75
    # early stop really happened: the straggler iterations are below full's
    assert np.asarray(frac["iterations"]).max() <= np.asarray(
        full["iterations"]
    ).max()
    both = cf & np.asarray(full["converged"])
    assert np.allclose(
        np.asarray(frac["minimizer"])[both],
        np.asarray(full["minimizer"])[both],
        rtol=1e-12,
    )
    # and per-fit iteration counts agree on the finished subset
    assert np.array_equal(
        np.asarray(frac["iterations"])[both],
        np.asarray(full["iterations"])[both],
    )
    # fraction 0.0 keeps its degenerate meaning: nothing required, the
    # loop body never runs (zero iterations everywhere)
    frac0 = lso.solve_batch(
        f, x0s, data, opt, output_length=m, min_converged_fraction=0.0
    )
    assert int(np.asarray(frac0["iterations"]).max()) == 0
    # fraction 1.0 reproduces the full batch exactly
    frac1 = lso.solve_batch(
        f, x0s, data, opt, output_length=m, min_converged_fraction=1.0
    )
    assert np.allclose(
        np.asarray(frac1["minimizer"]), np.asarray(full["minimizer"]),
        rtol=1e-12,
    )


def test_batch_fraction_stop_check_every():
    """stop_check_every=k: the quorum check is k-granular, but each fit
    still freezes at its OWN convergence iteration — fits finished under
    k=1 are bitwise identical under k>1; stragglers may run up to k-1
    extra (productive) iterations."""
    rng = np.random.default_rng(5)
    B, m = 24, 20
    xdata = jnp.array(np.linspace(1.0, 60.0, m))
    betas_true = jnp.array(
        np.stack([rng.uniform(100, 400, B), rng.uniform(2e-4, 2e-3, B)], 1)
    )
    ydata = jax.vmap(lambda b: _curve_model(xdata, b))(betas_true)
    x0s = betas_true * jnp.array(rng.uniform(0.5, 1.8, size=(B, 2)))

    def f(beta, data):
        xd, yd = data
        return yd - _curve_model(xd, beta)

    data = (jnp.broadcast_to(xdata, (B, m)), ydata)
    opt = lso.LevenbergMarquardt(lso.Cholesky())
    kw = dict(output_length=m, min_converged_fraction=0.75)
    r1 = lso.solve_batch(f, x0s, data, opt, **kw)
    r3 = lso.solve_batch(f, x0s, data, opt, stop_check_every=3, **kw)
    c1 = np.asarray(r1["converged"])
    c3 = np.asarray(r3["converged"])
    assert c3.mean() >= 0.75
    # k=3 never converges FEWER fits (extra productive iterations only)
    assert (c3 | ~c1).all()
    both = c1 & c3
    assert np.array_equal(
        np.asarray(r1["minimizer"])[both], np.asarray(r3["minimizer"])[both]
    )
    assert np.array_equal(
        np.asarray(r1["iterations"])[both], np.asarray(r3["iterations"])[both]
    )
    # overshoot is bounded by k-1 lockstep iterations
    assert (
        np.asarray(r3["iterations"]).max()
        <= np.asarray(r1["iterations"]).max() + 2
    )
    with pytest.raises(ValueError, match="stop_check_every"):
        lso.solve_batch(f, x0s, data, opt, output_length=m,
                        stop_check_every=2)
    with pytest.raises(ValueError, match="stop_check_every"):
        lso.solve_batch(f, x0s, data, opt, stop_check_every=0, **kw)
    # non-integers are rejected (int() would silently truncate 2.7 -> 2)
    with pytest.raises(ValueError, match="integer"):
        lso.solve_batch(f, x0s, data, opt, stop_check_every=2.7, **kw)
    # the unroll is capped: k copies of the loop body inline into one
    # while iteration, so compile cost grows multiplicatively with k
    with pytest.raises(ValueError, match="cap"):
        lso.solve_batch(f, x0s, data, opt, stop_check_every=128, **kw)


def test_batch_fraction_stop_dogleg_no_data():
    def rosenbrock(x):
        return jnp.array([1 - x[0], 100 * (x[1] - x[0] ** 2)])

    x0s = jnp.array([[0.0, 0.0], [-1.2, 1.0], [2.0, 2.0], [0.5, -0.5]])
    raw = lso.solve_batch(
        rosenbrock, x0s, optimizer=lso.Dogleg(),
        min_converged_fraction=1.0,
    )
    assert np.all(np.asarray(raw["converged"]))
    assert np.allclose(raw["minimizer"], 1.0, atol=1e-6)


def test_batch_without_data():
    def rosenbrock(x):
        return jnp.array([1 - x[0], 100 * (x[1] - x[0] ** 2)])

    x0s = jnp.array([[0.0, 0.0], [-1.2, 1.0], [2.0, 2.0], [0.5, -0.5]])
    raw = lso.solve_batch(rosenbrock, x0s, optimizer=lso.Dogleg())
    assert np.all(np.asarray(raw["converged"]))
    assert np.allclose(raw["minimizer"], 1.0, atol=1e-6)


def test_batch_lsmr_matrix_free():
    def rosenbrock(x):
        return jnp.array([1 - x[0], 100 * (x[1] - x[0] ** 2)])

    x0s = jnp.zeros((8, 2))
    raw = lso.solve_batch(
        rosenbrock, x0s,
        optimizer=lso.LevenbergMarquardt(lso.LSMR()),
        materialize_jacobian=False,
    )
    assert np.all(np.asarray(raw["converged"]))
    assert np.allclose(raw["minimizer"], 1.0, atol=1e-6)


def test_batch_rejects_live_trace_printing():
    """show_trace needs host printing and is rejected; store_trace works
    (test_batched_store_trace)."""
    with pytest.raises(ValueError):
        lso.solve_batch(
            lambda x: x, jnp.zeros((2, 2)),
            options=lso.Options(show_trace=True),
        )


def test_batched_store_trace():
    """store_trace under vmap: per-problem fixed-size trace buffers."""
    import numpy as np

    def f(x, data):
        return data - x

    B, m = 3, 4
    data = jnp.arange(float(B * m)).reshape(B, m)
    x0 = jnp.zeros((B, m))
    raw = lso.solve_batch(
        f, x0, data, lso.LevenbergMarquardt(lso.Cholesky()),
        output_length=m,
        options=lso.Options(iterations=10, store_trace=True),
    )
    assert raw["trace"].shape == (B, 11, 3)
    # row 0 records each problem's initial ssr
    ssr0 = np.sum(np.asarray(data) ** 2, axis=1)
    assert np.allclose(np.asarray(raw["trace"])[:, 0, 1], ssr0)


def test_batched_bounded_solves():
    """Bounds under vmap: the active-set refinement's lax.cond becomes a
    select (both branches run for every problem); results must stay
    feasible with per-problem pinning."""
    import jax
    import numpy as np

    B, m = 6, 30
    x = jnp.linspace(0.1, 6.0, m)
    betas = jnp.stack([jnp.linspace(2.0, 3.0, B), jnp.full((B,), 0.5)], 1)
    Y = jax.vmap(lambda b: b[0] * (1 - jnp.exp(-b[1] * x)))(betas)

    def f(beta, data):
        xd, yd = data
        return yd - beta[0] * (1 - jnp.exp(-beta[1] * xd))

    data = (jnp.broadcast_to(x, (B, m)), Y)
    lowerb = jnp.array([2.6, 0.0])
    # starts must be feasible (reference parity: infeasible starts raise —
    # test_batch_infeasible_start_raises); clip them onto the box
    x0b = jnp.maximum(betas * 1.2, lowerb)
    for opt in (lso.LevenbergMarquardt(lso.Cholesky()), lso.Dogleg(lso.QR())):
        raw = lso.solve_batch(
            f, x0b, data, opt, output_length=m, lower=lowerb,
        )
        mins = np.asarray(raw["minimizer"])
        assert np.all(mins[:, 0] >= 2.6 - 1e-9)
        # true scales at or below the bound pin exactly at it; rest are free
        expect_pinned = np.asarray(betas[:, 0] <= 2.6 + 1e-12)
        assert np.array_equal(np.isclose(mins[:, 0], 2.6), expect_pinned)
        assert np.asarray(raw["converged"]).all()


def test_batched_qr_at_scale_compiles_and_matches():
    """QR is now batched-safe at small n via the unrolled MGS solve — XLA's
    batched Householder QR could not even compile at large B x tiny n
    (the reason the batched default is Cholesky). Gate: B=20k fits with
    Dogleg(QR) compile, converge, and match the Cholesky route."""
    rng = np.random.default_rng(3)
    B, m = 20_000, 24
    xdata = jnp.array(np.linspace(1.0, 60.0, m))
    betas_true = jnp.array(
        np.stack([rng.uniform(100, 400, B), rng.uniform(2e-4, 2e-3, B)], 1)
    )
    ydata = jax.vmap(lambda b: _curve_model(xdata, b))(betas_true)
    x0s = betas_true * 1.2

    def f(beta, data):
        xd, yd = data
        return yd - _curve_model(xd, beta)

    data = (jnp.broadcast_to(xdata, (B, m)), ydata)
    raw_qr = lso.solve_batch(
        f, x0s, data, lso.Dogleg(lso.QR()), output_length=m
    )
    assert np.asarray(raw_qr["converged"]).all()
    raw_ch = lso.solve_batch(
        f, x0s, data, lso.Dogleg(lso.Cholesky()), output_length=m
    )
    assert np.allclose(
        np.asarray(raw_qr["minimizer"]), np.asarray(raw_ch["minimizer"]),
        rtol=1e-6,
    )
