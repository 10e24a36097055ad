"""Variable projection (VarPro, models/separable.py; separable=True).

Beyond-reference capability (the reference optimizes all parameters
jointly, test/nonlinearfitting.jl): the linear coefficients are
eliminated in closed form, the outer NLLS runs on the nonlinear
parameters with the exact reduced Jacobian via autodiff through the
coefficient solve. Gates: full-parameter minimizers match the naive
joint fit, weighted/gridded composition, robustness to arbitrarily wrong
linear starts, custom SeparableModel (2-term exponential sum), and the
contract errors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.models import (
    SEPARABLE,
    SeparableModel,
    curve_fit,
    curve_fit_batch,
)


def _exp_sat_batch(B=24, m=50, seed=7, start_scale=(0.9, 1.1)):
    rng = np.random.default_rng(seed)
    xd = np.linspace(0.5, 12.0, m)
    betas = np.stack([rng.uniform(2, 5, B), rng.uniform(0.2, 0.8, B)], 1)
    Y = betas[:, :1] * (1.0 - np.exp(-betas[:, 1:2] * xd[None, :]))
    p0 = betas * rng.uniform(*start_scale, betas.shape)
    return xd, Y, betas, p0


@pytest.mark.parametrize("name", ["exp_saturation", "exp_decay", "gaussian",
                                  "michaelis_menten"])
def test_separable_matches_naive_batched(name):
    B, m = 16, 40
    rng = np.random.default_rng(3)
    xd = np.linspace(0.5, 10.0, m)
    if name == "exp_saturation":
        betas = np.stack([rng.uniform(2, 5, B), rng.uniform(0.2, 0.8, B)], 1)
    elif name == "exp_decay":
        betas = np.stack(
            [rng.uniform(2, 5, B), rng.uniform(0.2, 0.8, B),
             rng.uniform(0.5, 2, B)], 1
        )
    elif name == "gaussian":
        betas = np.stack(
            [rng.uniform(2, 5, B), rng.uniform(3, 7, B),
             rng.uniform(0.8, 2.0, B)], 1
        )
    else:  # michaelis_menten
        betas = np.stack([rng.uniform(2, 5, B), rng.uniform(1, 4, B)], 1)
    model = lso.models.CURVES[name]
    Y = np.asarray(
        jax.vmap(lambda b: model(jnp.asarray(xd), b))(jnp.asarray(betas))
    )
    p0 = betas * rng.uniform(0.9, 1.1, betas.shape)
    kw = dict(options=lso.Options(iterations=100))
    rs = curve_fit_batch(name, xd, Y, p0, separable=True, **kw)
    rn = curve_fit_batch(name, xd, Y, p0, **kw)
    assert bool(jnp.all(rs["converged"]))
    # the separable minimizer is the FULL parameter vector
    assert rs["minimizer"].shape == betas.shape
    assert np.allclose(np.asarray(rs["minimizer"]), betas, rtol=1e-6)
    assert np.allclose(
        np.asarray(rs["minimizer"]), np.asarray(rn["minimizer"]), rtol=1e-6
    )


def test_separable_immune_to_wrong_linear_start():
    """The linear coefficient start is irrelevant under VarPro: a 1e6-x
    wrong amplitude start converges in the same few iterations as a good
    one (the joint fit must walk the amplitude in)."""
    xd, Y, betas, p0 = _exp_sat_batch()
    p_bad = p0.copy()
    p_bad[:, 0] *= 1e6  # absurd linear start; nonlinear start unchanged
    kw = dict(options=lso.Options(iterations=100))
    r_good = curve_fit_batch("exp_saturation", xd, Y, p0, separable=True, **kw)
    r_bad = curve_fit_batch(
        "exp_saturation", xd, Y, p_bad, separable=True, **kw
    )
    assert bool(jnp.all(r_bad["converged"]))
    assert np.allclose(np.asarray(r_bad["minimizer"]), betas, rtol=1e-6)
    assert np.array_equal(
        np.asarray(r_bad["iterations"]), np.asarray(r_good["iterations"])
    )


def test_separable_fewer_iterations_far_starts():
    """From far joint starts (0.25-4x) VarPro's reduced problem converges
    with at most the naive iteration count on every fit, strictly fewer
    in aggregate (the classic VarPro payoff on exponential models)."""
    rng = np.random.default_rng(11)
    xd, Y, betas, _ = _exp_sat_batch(B=48, seed=11)
    p0 = betas * np.exp(rng.uniform(np.log(0.25), np.log(4.0), betas.shape))
    kw = dict(options=lso.Options(iterations=200))
    rs = curve_fit_batch("exp_saturation", xd, Y, p0, separable=True, **kw)
    rn = curve_fit_batch("exp_saturation", xd, Y, p0, **kw)
    assert bool(jnp.all(rs["converged"]))
    assert np.allclose(np.asarray(rs["minimizer"]), betas, rtol=1e-5)
    it_s = np.asarray(rs["iterations"], np.int64)
    it_n = np.asarray(rn["iterations"], np.int64)
    assert it_s.sum() < it_n.sum(), (it_s.sum(), it_n.sum())


def test_separable_weighted_matches_naive():
    xd, Y, betas, p0 = _exp_sat_batch(B=12, seed=5)
    rng = np.random.default_rng(6)
    w = rng.uniform(0.5, 2.0, Y.shape)
    kw = dict(options=lso.Options(iterations=100))
    rs = curve_fit_batch(
        "exp_saturation", xd, Y, p0, weights=w, separable=True, **kw
    )
    rn = curve_fit_batch("exp_saturation", xd, Y, p0, weights=w, **kw)
    assert bool(jnp.all(rs["converged"]))
    assert np.allclose(
        np.asarray(rs["minimizer"]), np.asarray(rn["minimizer"]), rtol=1e-6
    )
    # noise-free data: weighted optimum is still the truth
    assert np.allclose(np.asarray(rs["minimizer"]), betas, rtol=1e-6)


def test_separable_gridded_composition():
    """separable=True + gridded=True: the VarPro basis built on the
    gridded-exp evaluator matches the naive joint fit."""
    B, m = 16, 64
    rng = np.random.default_rng(9)
    xd = np.linspace(1.0, 80.0, m)
    betas = np.stack([rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], 1)
    Y = betas[:, :1] * (1.0 - np.exp(-betas[:, 1:2] * xd[None, :]))
    p0 = betas * rng.uniform(0.8, 1.2, betas.shape)
    kw = dict(options=lso.Options(iterations=100))
    rs = curve_fit_batch(
        "exp_saturation", xd, Y, p0, separable=True, gridded=True, **kw
    )
    rn = curve_fit_batch("exp_saturation", xd, Y, p0, **kw)
    assert bool(jnp.all(rs["converged"]))
    assert np.allclose(np.asarray(rs["minimizer"]), betas, rtol=1e-7)
    assert np.allclose(
        np.asarray(rs["minimizer"]), np.asarray(rn["minimizer"]), rtol=1e-7
    )


def test_separable_custom_two_term_exponential_sum():
    """A user-declared SeparableModel: y = c1 e^{-a1 x} + c2 e^{-a2 x}
    (the Lanczos class — the canonical VarPro workload)."""
    m = 60
    xd = np.linspace(0.0, 6.0, m)
    true = np.array([2.0, 0.5, 5.0, 3.0])  # c1, a1, c2, a2 interleaved

    sm = SeparableModel(
        lin=(0, 2),
        nl=(1, 3),
        phi=lambda x, a: jnp.stack(
            [jnp.exp(-a[0] * x), jnp.exp(-a[1] * x)], axis=-1
        ),
    )
    Y = true[0] * np.exp(-true[1] * xd) + true[2] * np.exp(-true[3] * xd)
    # linear starts deliberately terrible; rates ~30% off
    p0 = np.array([100.0, 0.65, -7.0, 2.2])
    r = curve_fit(sm, xd, Y, p0, separable=True, iterations=300)
    assert r.converged
    got = np.asarray(r.minimizer)
    # exponential-sum label permutation: sort the (c, a) pairs by rate
    pairs = sorted([(got[1], got[0]), (got[3], got[2])])
    want = sorted([(true[1], true[0]), (true[3], true[2])])
    assert np.allclose(np.asarray(pairs), np.asarray(want), rtol=1e-6)


def test_separable_single_fit_result_surface():
    """curve_fit(separable=True) returns an Optim-style result whose
    minimizer is the full vector; repr prints; repeated calls hit the
    residual cache (no error, same answer)."""
    xd = np.linspace(0.5, 12.0, 40)
    true = np.array([3.0, 0.4])
    Y = true[0] * (1.0 - np.exp(-true[1] * xd))
    r1 = curve_fit("exp_saturation", xd, Y, np.array([1.0, 0.2]),
                   separable=True)
    r2 = curve_fit("exp_saturation", xd, Y, np.array([1.0, 0.2]),
                   separable=True)
    assert r1.converged and r2.converged
    assert np.allclose(r1.minimizer, true, rtol=1e-8)
    assert np.allclose(r1.minimizer, r2.minimizer)
    assert "Algorithm" in repr(r1)
    assert r1.minimizer.shape == (2,)


def test_separable_contract_errors():
    xd = np.linspace(0.5, 12.0, 16)
    Y = np.ones((4, 16))
    p0 = np.ones((4, 2))
    with pytest.raises(ValueError, match="separable structure"):
        curve_fit_batch("nonsense_model", xd, Y, p0, separable=True)
    with pytest.raises(ValueError, match="separable structure"):
        curve_fit_batch(lambda x, b: b[0] * x, xd, Y, p0, separable=True)
    # bounds may touch only the NONLINEAR parameters (linear components
    # must be infinite); a finite bound on the linear coefficient raises
    with pytest.raises(ValueError, match="NONLINEAR"):
        curve_fit_batch(
            "exp_saturation", xd, Y, p0, separable=True,
            lower=np.zeros(2),
        )
    with pytest.raises(ValueError, match="irls_iterations"):
        curve_fit_batch(
            "exp_saturation", xd, Y, p0, separable=True, loss="huber",
            irls_iterations=0,
        )
    with pytest.raises(ValueError, match="FULL parameter"):
        curve_fit_batch(
            "exp_saturation", xd, Y, np.ones((4, 1)), separable=True
        )
    with pytest.raises(ValueError, match="custom SeparableModel"):
        curve_fit_batch(
            SEPARABLE["exp_saturation"], xd, Y, p0,
            separable=True, gridded=True,
        )
    with pytest.raises(ValueError, match="partition"):
        SeparableModel((0,), (2,), lambda x, a: x[:, None])
    with pytest.raises(ValueError, match="NONLINEAR"):
        curve_fit("exp_saturation", xd, Y[0], np.ones(2), separable=True,
                  upper=np.full(2, 10.0))


@pytest.mark.parametrize("opt_name", ["dogleg", "lm"])
def test_nist_varpro_scoreboard(opt_name):
    """VarPro over the 14 separable NIST models x 2 certified starts,
    reference forcing protocol (same as test_nist.py). Gates are
    measured-0: dogleg misses MGH09 s0 (diverges), lm misses MGH10 s0 —
    and VarPro *rescues* basins the joint fit loses from the same starts
    (dogleg: MGH10 s0; lm: the joint scoreboard's MGH10 s0 stays missed
    but BoxBOD/misra far starts hold). Eckerle4 s0 (a former dogleg
    wrong-basin miss) is closed by symmetry canonicalization — the fit
    was landing on the model-identical (-b1, -b2) representative.
    Any regression on a single dataset fails loudly."""
    from leastsquaresoptim_jl_tpu.models.nist import DATASETS, NIST_SEPARABLE

    opt = {
        "dogleg": lso.Dogleg(lso.QR()),
        "lm": lso.LevenbergMarquardt(lso.QR()),
    }[opt_name]
    allowed_misses = {
        "dogleg": {("MGH09", 0)},
        "lm": {("MGH10", 0)},
    }[opt_name]
    n, total, misses = 0, 0, []
    for name, sm in NIST_SEPARABLE.items():
        d = DATASETS[name]
        sol = np.asarray(d["solution"])
        for si, start in enumerate(d["starts"]):
            total += 1
            try:
                r = curve_fit(
                    sm, np.asarray(d["x"]), np.asarray(d["y"]),
                    np.asarray(start, np.float64), separable=True,
                    optimizer=opt, iterations=3000,
                    x_tol=1e-50, f_tol=1e-36, g_tol=1e-50,
                )
                hit = np.linalg.norm(np.asarray(r.minimizer) - sol) <= 1e-3
            except lso.IsFiniteError:
                hit = False
            n += hit
            if not hit:
                misses.append((name, si))
    assert total == 28
    assert set(misses) <= allowed_misses, f"score {n}/{total}, misses={misses}"
    # the rescue the joint dogleg cannot do from the certified far start
    if opt_name == "dogleg":
        assert ("MGH10", 0) not in misses


def test_separable_full_covariance_recipe():
    """Full-beta covariance for a VarPro fit: the result's own jacobian
    refers to the REDUCED problem, but covariance(result, problem=) with
    the joint model problem re-linearizes at the assembled minimizer —
    error bars for ALL parameters including the eliminated amplitudes.
    Cross-check against the plain joint fit's covariance."""
    from leastsquaresoptim_jl_tpu.models.curves import curve_fit
    from leastsquaresoptim_jl_tpu.utils import covariance

    m = 50
    xd = jnp.linspace(0.0, 4.0, m)
    rng = np.random.default_rng(11)
    true = np.array([2.5, 1.3])
    y = jnp.asarray(
        true[0] * (1 - np.exp(-true[1] * np.asarray(xd)))
        + 0.05 * rng.normal(size=m)
    )

    def joint_f(b):
        return b[0] * (1 - jnp.exp(-b[1] * xd)) - y

    rv = curve_fit("exp_saturation", xd, y, np.array([1.0, 0.5]),
                   separable=True)
    p = lso.least_squares_problem(f=joint_f, x=jnp.asarray(rv.minimizer))
    cov_v = covariance(rv, problem=p)

    rj = lso.optimize(joint_f, jnp.array([1.0, 0.5]))
    cov_j = covariance(rj, problem=p)
    assert cov_v.shape == (2, 2)
    assert np.all(np.isfinite(cov_v))
    assert np.allclose(cov_v, cov_j, rtol=1e-6)


def test_exp_sum_separable_factory():
    """exp_sum_separable(k): the generic k-term exponential-sum VarPro
    structure. k=3 reproduces the Lanczos3 NIST_SEPARABLE fit exactly;
    the gridded variant (t0/dt/m) matches the naive basis on a uniform
    grid; contract errors are loud."""
    from leastsquaresoptim_jl_tpu.models.curves import curve_fit
    from leastsquaresoptim_jl_tpu.models.nist import DATASETS
    from leastsquaresoptim_jl_tpu.models.separable import exp_sum_separable

    d = DATASETS["Lanczos3"]
    sol = np.asarray(d["solution"])
    sm = exp_sum_separable(3)
    r = curve_fit(
        sm, np.asarray(d["x"]), np.asarray(d["y"]),
        np.asarray(d["starts"][1], np.float64), separable=True,
        optimizer=lso.LevenbergMarquardt(lso.QR()), iterations=3000,
        x_tol=1e-50, f_tol=1e-36, g_tol=1e-50,
    )
    assert np.linalg.norm(np.asarray(r.minimizer) - sol) <= 1e-3

    # gridded variant on a uniform grid: same fit as the naive basis
    m = 48
    t0, dt = 0.0, 0.125
    xd = t0 + dt * np.arange(m)
    true = np.array([2.0, 0.3, 1.0, 1.7])
    y = true[0] * np.exp(-true[1] * xd) + true[2] * np.exp(-true[3] * xd)
    for sm2 in (exp_sum_separable(2),
                exp_sum_separable(2, t0=t0, dt=dt, m=m)):
        r2 = curve_fit(sm2, xd, y, np.array([1.0, 0.2, 1.0, 2.0]),
                       separable=True)
        assert np.allclose(np.asarray(r2.minimizer), true, rtol=1e-6)

    with pytest.raises(ValueError, match="k >= 1"):
        exp_sum_separable(0)
    with pytest.raises(ValueError, match="t0, dt, m"):
        exp_sum_separable(2, t0=0.0)


def test_separable_robust_loss_irls():
    """Robust separable fits (IRLS around the linear-loss VarPro solve):
    with gross outliers in the data, loss='huber' recovers the planted
    parameters where the plain LS VarPro fit is dragged off; the
    returned ssr is the true robust objective. Batched path matches."""
    from leastsquaresoptim_jl_tpu.models.curves import (
        curve_fit,
        curve_fit_batch,
    )

    m = 60
    xd = np.linspace(0.0, 4.0, m)
    true = np.array([2.5, 1.3])
    rng = np.random.default_rng(7)
    y = true[0] * (1.0 - np.exp(-true[1] * xd)) + 0.01 * rng.normal(size=m)
    y_out = y.copy()
    y_out[[5, 20, 40]] += np.array([8.0, -6.0, 10.0])  # gross outliers

    p0 = np.array([1.0, 0.5])
    plain = curve_fit("exp_saturation", xd, y_out, p0, separable=True)
    robust = curve_fit("exp_saturation", xd, y_out, p0, separable=True,
                       loss="huber", f_scale=0.1)
    err_plain = np.max(np.abs(np.asarray(plain.minimizer) - true) / true)
    err_robust = np.max(np.abs(np.asarray(robust.minimizer) - true) / true)
    assert err_robust < 0.02, err_robust
    assert err_robust < err_plain / 5, (err_robust, err_plain)
    # ssr is the true robust objective (bounded by the outlier count times
    # the linear-region crossover, far below the plain SSR of ~200)
    assert float(robust.ssr) < 10.0

    # batched path: two fits (clean + outliers) in one call
    Y = np.stack([y, y_out])
    p0b = np.stack([p0, p0])
    raw = curve_fit_batch("exp_saturation", xd, Y, p0b, separable=True,
                          loss="huber", f_scale=0.1)
    errs = np.max(
        np.abs(np.asarray(raw["minimizer"]) - true[None, :]) / true[None, :],
        axis=1,
    )
    assert np.all(errs < 0.02), errs
    assert raw["ssr"].shape == (2,)
    single_clean = curve_fit("exp_saturation", xd, y, p0, separable=True,
                             loss="huber", f_scale=0.1)
    assert np.allclose(
        np.asarray(raw["minimizer"][0]),
        np.asarray(single_clean.minimizer), rtol=1e-5,
    )


def test_separable_robust_irls_fraction_stop():
    """Robust batched VarPro composes with the fraction-stop driver:
    min_converged_fraction passes through every IRLS round."""
    from leastsquaresoptim_jl_tpu.models.curves import curve_fit_batch

    m, B = 40, 6
    xd = np.linspace(0.0, 4.0, m)
    rng = np.random.default_rng(3)
    bt = np.stack([rng.uniform(2, 3, B), rng.uniform(1.0, 1.6, B)], 1)
    Y = bt[:, :1] * (1 - np.exp(-bt[:, 1:2] * xd[None, :]))
    Y[:, 9] += 5.0  # one outlier column in every fit
    raw = curve_fit_batch(
        "exp_saturation", xd, Y, bt * 0.8, separable=True,
        loss="huber", f_scale=0.1, min_converged_fraction=1.0,
    )
    errs = np.max(np.abs(np.asarray(raw["minimizer"]) - bt) / bt, axis=1)
    assert np.all(errs < 0.05), errs


def test_separable_bounds_on_nonlinear_parameters():
    """VarPro with box bounds on the NONLINEAR parameters (full-beta
    bound arrays, infinite at the linear indices): an active upper bound
    on the rate pins the reduced solve at the boundary with the
    projected-gradient KKT certificate; bounds touching a linear index
    still raise."""
    from leastsquaresoptim_jl_tpu.models.curves import (
        curve_fit,
        curve_fit_batch,
    )

    m = 40
    xd = np.linspace(0.0, 4.0, m)
    true = np.array([2.5, 1.3])  # exp_saturation: b0 linear, b1 rate
    y = true[0] * (1.0 - np.exp(-true[1] * xd))

    # inactive bound: same fit as unbounded
    up = np.array([np.inf, 5.0])
    r = curve_fit("exp_saturation", xd, y, np.array([1.0, 0.5]),
                  separable=True, upper=up)
    assert r.converged and np.allclose(np.asarray(r.minimizer), true,
                                       rtol=1e-6)

    # active bound: rate pinned at 1.0, g-converged certifies KKT
    up_active = np.array([np.inf, 1.0])
    r2 = curve_fit("exp_saturation", xd, y, np.array([1.0, 0.5]),
                   separable=True, upper=up_active)
    assert np.asarray(r2.minimizer)[1] <= 1.0 + 1e-12
    assert abs(float(np.asarray(r2.minimizer)[1]) - 1.0) < 1e-6
    assert r2.converged

    # bounding a linear coefficient is rejected loudly
    with pytest.raises(ValueError, match="NONLINEAR"):
        curve_fit("exp_saturation", xd, y, np.array([1.0, 0.5]),
                  separable=True, upper=np.array([10.0, np.inf]))

    # batched path accepts the same contract
    Y = np.stack([y, 1.1 * y])
    p0b = np.array([[1.0, 0.5], [1.0, 0.5]])
    raw = curve_fit_batch("exp_saturation", xd, Y, p0b, separable=True,
                          upper=up_active)
    assert np.all(np.asarray(raw["minimizer"])[:, 1] <= 1.0 + 1e-12)


def test_exp_sum_2_varpro_recovers_and_canonicalizes():
    """The 2-term exponential-sum zoo model: VarPro recovers planted
    (amp, rate) pairs from a start with the terms DELIBERATELY swapped
    and wrong amplitudes (VarPro is amplitude-start-immune), and the
    canonicalization returns rates ascending. Composes with
    gridded=True (uniform grid) and curve_fit_batch."""
    from leastsquaresoptim_jl_tpu.models.curves import (
        curve_fit,
        curve_fit_batch,
    )

    m = 48
    xd = np.linspace(0.0, 6.0, m)
    true = np.array([2.5, 0.4, 1.2, 2.1])  # rates 0.4 < 2.1 (canonical)
    y = true[0] * np.exp(-true[1] * xd) + true[2] * np.exp(-true[3] * xd)
    # swapped-term start with garbage amplitudes
    p0 = np.array([100.0, 1.9, -7.0, 0.5])
    r = curve_fit("exp_sum_2", xd, y, p0, separable=True,
                  optimizer=lso.LevenbergMarquardt())
    assert r.converged
    assert np.allclose(np.asarray(r.minimizer), true, rtol=1e-6), r.minimizer

    # batched + gridded path (identical model on the uniform grid)
    B = 8
    rng = np.random.default_rng(5)
    bt = np.stack([
        rng.uniform(1, 4, B), rng.uniform(0.2, 0.5, B),
        rng.uniform(0.5, 2, B), rng.uniform(1.5, 3, B),
    ], 1)
    Y = (bt[:, :1] * np.exp(-bt[:, 1:2] * xd[None, :])
         + bt[:, 2:3] * np.exp(-bt[:, 3:4] * xd[None, :]))
    p0b = bt * rng.uniform(0.9, 1.1, bt.shape)
    raw = curve_fit_batch("exp_sum_2", xd, Y, p0b, separable=True,
                          gridded=True)
    assert bool(jnp.all(raw["converged"]))
    assert np.allclose(np.asarray(raw["minimizer"]), bt, rtol=1e-5)


def test_separable_canonicalization():
    """Exact-symmetry reduction on assembled minimizers: Eckerle4's
    (b1, b2) -> (-b1, -b2) sign pair (the f32 VarPro QR route lands on
    the negative representative from the s0 start — model-identical,
    parameter rel err 2.0 without this), Lanczos3's term permutation,
    Gauss1/2's bump permutation + width signs."""
    from leastsquaresoptim_jl_tpu.models.nist import (
        DATASETS,
        NIST_SEPARABLE,
        _canon_sorted_exp_sum,
        _canon_two_bumps,
    )

    # unit: permutation + sign canonicalizers
    b = jnp.asarray([1.0, 5.0, 2.0, 0.5, 3.0, 2.0])
    assert np.allclose(
        np.asarray(_canon_sorted_exp_sum(b)), [2.0, 0.5, 3.0, 2.0, 1.0, 5.0]
    )
    g = jnp.asarray([9.0, 0.1, 5.0, 150.0, -20.0, 7.0, 100.0, 18.0])
    assert np.allclose(
        np.asarray(_canon_two_bumps(g)),
        [9.0, 0.1, 7.0, 100.0, 18.0, 5.0, 150.0, 20.0],
    )

    # end-to-end: Eckerle4 s0 in f32 (the measured regression case)
    d = DATASETS["Eckerle4"]
    sol = np.asarray(d["solution"])
    r = curve_fit(
        NIST_SEPARABLE["Eckerle4"], np.asarray(d["x"], np.float32),
        np.asarray(d["y"], np.float32),
        np.asarray(d["starts"][0], np.float32), separable=True,
        optimizer=lso.Dogleg(), iterations=3000,
        x_tol=1e-50, f_tol=1e-36, g_tol=1e-50,
    )
    rel = np.max(np.abs(np.asarray(r.minimizer) - sol) / np.abs(sol))
    assert float(np.asarray(r.minimizer)[1]) > 0
    assert rel < 1e-3, rel


def test_separable_coefficient_solve_qr_accuracy():
    """The coefficient solve takes the MGS-QR route on ill-conditioned
    (but surviving) bases: error ~eps*cond(P), not the normal equations'
    ~eps*cond(P)^2. Gate in f32 against an f64 lstsq oracle on a
    Lanczos-class collinear 3-exponential basis (cond ~ 1e4: QR keeps
    ~3 digits where the squared Gram has none)."""
    from leastsquaresoptim_jl_tpu.models.separable import _solve_coefficients

    m = 24
    xd64 = np.linspace(0.0, 1.15, m)
    rates = np.array([2.70, 2.95, 3.20])  # deliberately close decay rates
    P64 = np.exp(-xd64[:, None] * rates[None, :])
    c_true = np.array([0.9, -1.4, 1.1])
    y64 = P64 @ c_true
    cond = np.linalg.cond(P64)
    assert 1e3 < cond < 1e6  # the regime the QR route exists for

    c32 = np.asarray(
        _solve_coefficients(
            jnp.asarray(P64, jnp.float32), jnp.asarray(y64, jnp.float32)
        ),
        np.float64,
    )
    c_oracle = np.linalg.lstsq(P64, y64, rcond=None)[0]
    rel = np.max(np.abs(c32 - c_oracle) / np.abs(c_oracle))
    # eps32*cond ~ 1e-3; eps32*cond^2 ~ 10 (no digits). Gate between.
    assert rel < 3e-2, (rel, cond)

    # batched-safe: vmap over a stack of bases matches per-row solves
    Pb = jnp.stack([jnp.asarray(P64, jnp.float32)] * 3)
    yb = jnp.stack([jnp.asarray(y64, jnp.float32)] * 3)
    cb = jax.vmap(_solve_coefficients)(Pb, yb)
    assert np.allclose(np.asarray(cb), c32, atol=0)


@pytest.mark.parametrize("log_cond", [1, 2, 3, 4, 5])
def test_separable_coefficient_solve_cond_sweep(log_cond):
    """Property test for the MGS-QR coefficient route across a
    conditioning sweep: on a random (m, 4) basis with cond(P) = 10^k,
    the f32 solve error against an f64 lstsq oracle stays ~eps*cond
    (gate at 100*eps32*cond) — the normal-equations route would be
    ~eps*cond^2, failing the gate from cond ~ 1e3 up."""
    from leastsquaresoptim_jl_tpu.models.separable import _solve_coefficients

    rng = np.random.default_rng(100 + log_cond)
    m, p = 32, 4
    # controlled conditioning via SVD synthesis
    U = np.linalg.qr(rng.standard_normal((m, p)))[0]
    V = np.linalg.qr(rng.standard_normal((p, p)))[0]
    svals = np.logspace(0.0, -log_cond, p)
    P64 = U @ np.diag(svals) @ V.T
    c_true = rng.standard_normal(p)
    y64 = P64 @ c_true + 1e-3 * rng.standard_normal(m)  # inconsistent rhs
    c_oracle = np.linalg.lstsq(P64, y64, rcond=None)[0]

    c32 = np.asarray(
        _solve_coefficients(
            jnp.asarray(P64, jnp.float32), jnp.asarray(y64, jnp.float32)
        ),
        np.float64,
    )
    cond = 10.0**log_cond
    err = np.max(np.abs(c32 - c_oracle)) / max(np.max(np.abs(c_oracle)), 1.0)
    assert err <= 100.0 * 1.2e-7 * cond, (log_cond, err)


def test_separable_degenerate_basis_gradient_finite():
    """jacfwd AND jacrev of the reduced residual are finite at an alpha
    where the basis vanishes (the QR route's floored divisions must not
    leak NaN through the unselected jnp.where branch in either mode)."""
    from leastsquaresoptim_jl_tpu.models.separable import reduced_residual

    m = 8
    xd = jnp.linspace(1.0, 4.0, m)
    yd = jnp.linspace(1.0, 2.0, m)
    f = reduced_residual(SEPARABLE["exp_saturation"], weighted=False)
    for jac in (jax.jacfwd, jax.jacrev):
        J = jac(lambda a: f(a, (xd, yd)))(jnp.zeros(1))
        assert bool(jnp.all(jnp.isfinite(J))), jac


def test_separable_degenerate_basis_value_finite():
    """At alpha where the basis vanishes (exp_saturation, a=0: phi == 0)
    the ridge floor keeps the reduced residual finite and equal to y
    (coefficients fade to zero, no 0/0)."""
    from leastsquaresoptim_jl_tpu.models.separable import reduced_residual

    m = 8
    xd = jnp.linspace(1.0, 4.0, m)
    yd = jnp.linspace(1.0, 2.0, m)
    f = reduced_residual(SEPARABLE["exp_saturation"], weighted=False)
    r = f(jnp.zeros(1), (xd, yd))
    assert bool(jnp.all(jnp.isfinite(r)))
    assert np.allclose(np.asarray(r), np.asarray(yd))


def test_separable_fraction_stop_and_dogleg():
    """The fraction-stop batched loop and the Dogleg optimizer both
    compose with the separable path."""
    xd, Y, betas, p0 = _exp_sat_batch(B=32, seed=13)
    r = curve_fit_batch(
        "exp_saturation", xd, Y, p0, separable=True,
        min_converged_fraction=1.0, options=lso.Options(iterations=100),
    )
    assert bool(jnp.all(r["converged"]))
    assert np.allclose(np.asarray(r["minimizer"]), betas, rtol=1e-6)
    rd = curve_fit_batch(
        "exp_saturation", xd, Y, p0,
        optimizer=lso.Dogleg(lso.Cholesky()), separable=True,
        options=lso.Options(iterations=100),
    )
    assert bool(jnp.all(rd["converged"]))
    assert np.allclose(np.asarray(rd["minimizer"]), betas, rtol=1e-6)


def test_separable_fused_matches_unfused():
    """``fused=True`` through curve_fit_batch (the round-4 headline
    schedule: Gram-carry trial evaluation on the reduced problem) returns
    the same minimizers/flags as the unfused schedule, on both the plain
    vmap path and the fraction-stop loop, with and without gridded."""
    xd, Y, betas, p0 = _exp_sat_batch(B=24, seed=21)
    for gridded in (False, True):
        kw = dict(
            separable=True, gridded=gridded,
            optimizer=lso.LevenbergMarquardt(lso.Cholesky()),
            options=lso.Options(iterations=100),
        )
        r0 = curve_fit_batch("exp_saturation", xd, Y, p0, **kw)
        r1 = curve_fit_batch("exp_saturation", xd, Y, p0, fused=True, **kw)
        assert bool(jnp.all(r1["converged"]))
        assert np.allclose(
            np.asarray(r0["minimizer"]), np.asarray(r1["minimizer"]),
            rtol=1e-12, atol=1e-12,
        )
        f0 = curve_fit_batch(
            "exp_saturation", xd, Y, p0,
            min_converged_fraction=1.0, **kw,
        )
        f1 = curve_fit_batch(
            "exp_saturation", xd, Y, p0,
            min_converged_fraction=1.0, fused=True, **kw,
        )
        assert bool(jnp.all(f1["converged"]))
        assert np.allclose(
            np.asarray(f0["minimizer"]), np.asarray(f1["minimizer"]),
            rtol=1e-12, atol=1e-12,
        )
