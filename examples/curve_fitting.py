"""Curve fitting tour: basic, weighted, robust, bounded, multistart, batched.

Run: python examples/curve_fitting.py   (CPU or TPU; ~30 s first compile)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.utils import standard_errors


def main():
    rng = np.random.default_rng(0)
    x = jnp.linspace(1.0, 80.0, 60)
    true = jnp.array([240.0, 5e-2])
    y_clean = true[0] * (1 - jnp.exp(-true[1] * x))
    y = y_clean + jnp.asarray(rng.normal(0, 0.5, 60))

    # 1. basic fit with a named model + standard errors
    r = lso.curve_fit("exp_saturation", x, y, [200.0, 1e-1])
    print("basic:", r.minimizer, "+/-", standard_errors(r))

    # 2. robust fit shrugging off gross outliers
    y_bad = y.at[7].set(5000.0).at[33].set(-3000.0)
    r = lso.curve_fit("exp_saturation", x, y_bad, [200.0, 1e-1],
                      loss="soft_l1", f_scale=1.0)
    print("robust:", r.minimizer)

    # 3. bounded fit: scale pinned at its lower bound, rate still optimal.
    # (KKT g-certification at the bound is exercised in f64 in
    # tests/test_solver_options.py; this f32 run converges via x_tol.)
    r = lso.curve_fit("exp_saturation", x, y, [300.0, 1e-1],
                      optimizer=lso.LevenbergMarquardt(),
                      lower=[260.0, 0.0])
    print("bounded:", r.minimizer, "converged:", r.converged)

    # 4. multistart for a hard basin
    starts = lso.latin_hypercube_starts(
        jax.random.PRNGKey(0), 32, jnp.array([1.0, 1e-3]),
        jnp.array([1000.0, 1.0])
    )
    best, _ = lso.optimize_multistart(
        lambda b, d: d[1] - b[0] * (1 - jnp.exp(-b[1] * d[0])),
        starts, data=(x, y), output_length=60,
    )
    print("multistart:", np.asarray(best["minimizer"]))

    # 5. 10k independent fits in one vmapped kernel
    B = 10_000
    betas = jnp.stack(
        [jnp.linspace(100.0, 400.0, B), jnp.linspace(3e-2, 2e-1, B)], axis=1
    )
    Y = jax.vmap(lambda b: b[0] * (1 - jnp.exp(-b[1] * x)))(betas)
    raw = lso.curve_fit_batch("exp_saturation", x, Y, betas * 1.3)
    ok = np.mean(np.asarray(raw["converged"]))
    print(f"batched: {B} fits, {100 * ok:.1f}% converged")

    # 6. same fits with gridded transcendentals: the uniform sample grid
    # lets the exp-family models run 3 exps + power tables per evaluation
    # instead of m exps (ops/special.py)
    raw_g = lso.curve_fit_batch(
        "exp_saturation", x, Y, betas * 1.3, gridded=True
    )
    # the two routes evaluate the same curve through different exp
    # formulations, so their minimizers agree to the convergence-criteria
    # band of the active dtype (f32 on TPU), not bit-for-bit
    mg, mn = np.asarray(raw_g["minimizer"]), np.asarray(raw["minimizer"])
    diff = np.max(np.abs(mg - mn) / np.maximum(np.abs(mn), 1e-30))
    print(f"gridded: minimizers agree to max rel diff {diff:.1e}")

    # 7. variable projection (VarPro): the amplitude is linear in the
    # model, so it is eliminated in closed form and the outer solve runs
    # on the rate alone — start the amplitude ANYWHERE (here 1000x off)
    p0_bad = betas * jnp.array([1000.0, 1.3])
    raw_s = lso.curve_fit_batch(
        "exp_saturation", x, Y, p0_bad, separable=True
    )
    ok_s = np.mean(np.asarray(raw_s["converged"]))
    agree_s = np.allclose(
        np.asarray(raw_s["minimizer"]), np.asarray(betas), rtol=1e-5
    )
    print(f"varpro: {100 * ok_s:.1f}% converged from 1000x-off amplitude "
          f"starts; minimizers match truth: {agree_s}")

    # 8. robust VarPro (IRLS around the linear-loss VarPro solve) with a
    # bound on the nonlinear rate — outliers down-weighted, amplitude
    # still closed-form, rate boxed
    y_out = np.asarray(y_clean).copy()
    y_out[[5, 40]] += [90.0, -60.0]
    r = lso.curve_fit(
        "exp_saturation", x, jnp.asarray(y_out), [1.0, 1e-1],
        separable=True, loss="huber", f_scale=1.0,
        upper=np.array([np.inf, 1.0]),
    )
    print("robust bounded varpro:", np.asarray(r.minimizer),
          "robust objective:", float(r.ssr))

    # full-parameter error bars for a VarPro fit: re-linearize the JOINT
    # model at the assembled minimizer (the result's own jacobian refers
    # to the reduced problem)
    from leastsquaresoptim_jl_tpu.utils import covariance

    rv = lso.curve_fit("exp_saturation", x, y, [1.0, 1e-1], separable=True)
    pj = lso.least_squares_problem(
        f=lambda b: b[0] * (1 - jnp.exp(-b[1] * x)) - y,
        x=jnp.asarray(rv.minimizer),
    )
    se = np.sqrt(np.diag(covariance(rv, problem=pj)))
    print("varpro full-parameter std errors:", se)

    # 8b. throughput mode for bulk fitting: the fused-ssr schedule (one
    # model evaluation per iteration; the (B, m) residual never rides the
    # loop carry — SSR is carried as a two-float pair). Same fits; the
    # headline bench route (bench.py). Measured 1.61x at m=1024 where the
    # residual carry is real HBM traffic.
    raw_ssr = lso.curve_fit_batch(
        "exp_saturation", x, Y, betas * 1.3,
        optimizer=lso.LevenbergMarquardt(lso.Cholesky()),
        separable=True, gridded=True, fused="ssr",
        min_converged_fraction=0.99,
    )
    ok_ssr = np.mean(np.asarray(raw_ssr["converged"]))
    print(f"fused-ssr throughput route: {100 * ok_ssr:.1f}% converged")

    # 8c. start-free fitting: p0="auto" computes a closed-form start from
    # the data itself (models/init.py; here Jacquelin's integral
    # regression recovers both exponential rates without any user input)
    xs0 = jnp.linspace(0.0, 6.0, 64)
    ys0 = 2.5 * jnp.exp(-0.5 * xs0) + 1.2 * jnp.exp(-2.2 * xs0)
    r_a = lso.curve_fit("exp_sum_2", xs0, ys0, "auto", separable=True)
    print("auto-start exp_sum_2:", np.round(np.asarray(r_a.minimizer), 4),
          "converged:", r_a.converged)

    # 8d. start-free k-term families: exp_sum_separable(k<=3) and
    # gauss_sum_separable(k) carry data-driven guess hooks, so p0="auto"
    # covers multi-exponential decays and multi-peak Gaussian sums too.
    # (In f64, the NIST Lanczos3 sloppy 3-exponential fits to its
    # certified solution with no user start at all —
    # tests/test_init.py::test_lanczos3_start_free_certified; this tour
    # runs in f32, where that valley is below float resolution, so the
    # demo uses a synthetic well-posed 3-term sum.)
    from leastsquaresoptim_jl_tpu.models import (
        exp_sum_separable, gauss_sum_separable,
    )

    x3 = np.linspace(0.0, 6.0, 96)
    bt3 = np.array([3.0, 0.3, 2.0, 1.1, 1.0, 3.5])
    y3 = sum(bt3[2 * j] * np.exp(-bt3[2 * j + 1] * x3) for j in range(3))
    r3 = lso.curve_fit(exp_sum_separable(3), x3, y3, "auto",
                       separable=True)
    rel3 = np.abs(np.asarray(r3.minimizer) - bt3) / np.abs(bt3)
    print(f"start-free 3-exp sum: max rel err {rel3.max():.1e}, "
          f"converged: {r3.converged}")

    xg = np.linspace(0.0, 10.0, 128)
    yg = (3.0 * np.exp(-((xg - 2.5) ** 2) / (2 * 0.6**2))
          + 1.8 * np.exp(-((xg - 6.5) ** 2) / (2 * 0.9**2)))
    rg = lso.curve_fit(gauss_sum_separable(2), xg, yg, "auto",
                       separable=True)
    print("start-free 2-peak Gaussian:", np.round(np.asarray(rg.minimizer), 3))

    # 9. geodesic acceleration: half the second-order correction added to
    # each LM step — ~2x fewer iterations on sloppy exponential sums
    # (here a 2-term sum with close rates; canonicalized rates ascending)
    xs = jnp.linspace(0.0, 6.0, 48)
    ys = 2.5 * jnp.exp(-0.5 * xs) + 1.2 * jnp.exp(-1.1 * xs)
    p0 = jnp.array([1.0, 0.3, 1.0, 2.0])
    r_p = lso.curve_fit("exp_sum_2", xs, ys, p0,
                        optimizer=lso.LevenbergMarquardt())
    r_g = lso.curve_fit("exp_sum_2", xs, ys, p0,
                        optimizer=lso.LevenbergMarquardt(geodesic=True))
    print(f"geodesic: {int(r_g.iterations)} iters vs plain "
          f"{int(r_p.iterations)}; converged: {r_g.converged}")


if __name__ == "__main__":
    main()
