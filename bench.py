"""Benchmark: batched LM curve fits on the real chip.

Measures the flagship workload from BASELINE.json ("100k independent
vmapped curve fits"): full Levenberg-Marquardt solves (Cholesky normal
equations, forward-mode Jacobians) of exponential curve fits, vmapped into
one kernel. The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` compares against a single-threaded NumPy LM implementation
of the same algorithm on this host — a stand-in for the reference's
sequential CPU execution model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def _model_np(x, b):
    return b[0] * (1.0 - np.exp(-b[1] * x))


def _numpy_lm_fit(xd, yd, beta0, iters=30):
    """Plain NumPy LM with Cholesky normal equations (reference-equivalent
    algorithm: damped dtd = colsumabs2, gain-ratio radius control)."""
    beta = beta0.copy()
    f = yd - _model_np(xd, beta)
    ssr = f @ f
    delta = 10.0
    dec = 2.0
    for _ in range(iters):
        e = np.exp(-beta[1] * xd)
        J = np.stack([-(1.0 - e), -beta[0] * xd * e], axis=1)
        dtd = (J * J).sum(0)
        mean = dtd.mean()
        dtd = np.clip(dtd, 1e-6 * mean, 1e32 * mean) / delta
        g = J.T @ f
        try:
            dx = np.linalg.solve(J.T @ J + np.diag(dtd), g)
        except np.linalg.LinAlgError:
            break
        btrial = beta - dx
        ftrial = yd - _model_np(xd, btrial)
        tssr = ftrial @ ftrial
        pred = J @ dx - f
        predr = abs(ssr - pred @ pred)
        rho = (ssr - tssr) / predr if predr > 0 else 0.0
        if rho > 1e-3:
            beta, f, ssr = btrial, ftrial, tssr
            delta = min(delta / max(1 / 3, 1 - (2 * rho - 1) ** 3), 1e16)
            dec = 2.0
        else:
            delta = max(delta / dec, 1e-16)
            dec *= 2.0
        if ssr < 1e-12:
            break
    return beta, ssr


def main():
    import jax
    import jax.numpy as jnp

    import leastsquaresoptim_jl_tpu as lso

    B, m, iters = 100_000, 64, 30
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    xdata = np.linspace(1.0, 80.0, m)
    betas_true = np.stack(
        [rng.uniform(100, 400, B), rng.uniform(3e-4, 2e-3, B)], axis=1
    )
    Y = betas_true[:, :1] * (1.0 - np.exp(-betas_true[:, 1:2] * xdata[None, :]))
    x0s = betas_true * rng.uniform(0.7, 1.4, size=(B, 2))

    def f(beta, data):
        xd, yd = data
        return yd - beta[0] * (1.0 - jnp.exp(-beta[1] * xd))

    data = (
        jnp.broadcast_to(jnp.asarray(xdata, dtype), (B, m)),
        jnp.asarray(Y, dtype),
    )
    x0j = jnp.asarray(x0s, dtype)

    opts = lso.Options(iterations=iters, f_tol=1e-12, x_tol=1e-12, g_tol=1e-12)

    def solve_one_batch(x0, d):
        return lso.solve_batch(
            f, x0, d, lso.LevenbergMarquardt(lso.Cholesky()),
            output_length=m, options=opts,
        )["minimizer"]

    # Chain R full batches inside one dispatch (lax.map over perturbed
    # starts): a single dispatch through the axon tunnel costs ~40 ms of
    # fixed latency, so unchained timing mostly measures the tunnel, not
    # the solver. R*B fits per dispatch measures steady-state throughput.
    R = 5
    perturbs = jnp.linspace(1.0, 1.0 + 1e-4, R, dtype=dtype)

    run = jax.jit(
        lambda x0, d: jax.lax.map(
            lambda c: solve_one_batch(x0 * c, d), perturbs
        )[-1]
    )

    # warmup/compile
    out = run(x0j, data)
    np.asarray(out)
    reps = 4
    times = []
    for i in range(reps):
        # vary inputs and force a host fetch: on the axon runtime,
        # block_until_ready can return before execution completes and
        # identical dispatches may be cached, so device-only timing lies.
        t0 = time.perf_counter()
        out = run(x0j * (1.0 + 1e-5 * i), data)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    # min over reps: the shared-chip tunnel adds multi-ms stalls to some
    # dispatches; min is the stable statistic of solver throughput.
    tpu_time = min(times)
    fits_per_s = R * B / tpu_time

    # NumPy baseline on a subsample, extrapolated
    nb = 50
    t0 = time.perf_counter()
    for i in range(nb):
        _numpy_lm_fit(xdata, Y[i], x0s[i].copy(), iters=iters)
    np_time_per_fit = (time.perf_counter() - t0) / nb
    baseline_fits_per_s = 1.0 / np_time_per_fit

    print(
        json.dumps(
            {
                "metric": "batched_lm_fits_per_second",
                "value": round(fits_per_s, 1),
                "unit": "fits/s (100k exponential curve fits, 30 LM iters, f32)",
                "vs_baseline": round(fits_per_s / baseline_fits_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
