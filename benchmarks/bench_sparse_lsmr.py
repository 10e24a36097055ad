"""BASELINE.json config #4/#5 (single-chip halves): 1M- and 10M-residual
sparse problems, LM(LSMR) matrix-free with Jacobi preconditioner.

The problem is a large nonlinear discrete-boundary-value-style system
(MINPACK family, scaled up): residual i couples x[i-1], x[i], x[i+1] plus a
cubic nonlinearity, with a 10:1 residual:parameter ratio from 10 independent
observation blocks. J is never materialized — the operator path is
jax.linearize JVP/VJP closures (ops/operators.py), the damped LM system is
an operator combinator (solver/lsmr.py), and colnorms come from the
Hutchinson estimator.

Prints one JSON line per config: {"metric", "value", "unit",
"vs_baseline"} where value = outer LM iterations/s and vs_baseline
compares against a SciPy-style single-core CPU estimate of the same
matvec volume. The m=10M config (the north star's stated scale point,
BASELINE.md) additionally reports a solve-to-convergence line
(time-to-g_tol at the f32 dtype-scaled tolerance) and the device memory
headroom — J is never materialized, so the footprint is a handful of
m-vectors (~40 MB each at m=1e7) against ~16 GB HBM. The multi-chip
variant of the same operator path is exercised on the virtual mesh by
tests/test_sharding.py and benchmarks/bench_sharded.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_config(blocks, label, convergence=False):
    import jax
    import jax.numpy as jnp

    import leastsquaresoptim_jl_tpu as lso

    n = 100_000          # parameters
    m = blocks * n
    dtype = jnp.float32
    h = 1.0 / (n + 1)
    t = jnp.arange(1, n + 1, dtype=dtype) * h
    # per-block shift makes blocks independent observations of x
    shifts = jnp.linspace(0.5, 1.5, blocks, dtype=dtype)

    def residual_fn(x):
        xm = jnp.concatenate([jnp.zeros(1, dtype), x[:-1]])
        xp = jnp.concatenate([x[1:], jnp.zeros(1, dtype)])
        core = 2.0 * x - xm - xp
        # (blocks, n): cubic source term per block
        src = (x[None, :] + t[None, :] * shifts[:, None] + 1.0) ** 3
        r = core[None, :] + (h * h / 2.0) * src
        return r.reshape(-1)

    x0 = (t * (t - 1.0)).astype(dtype)
    prob = lso.LeastSquaresProblem(
        residual_fn=residual_fn, x0=x0, m=m, jac_fn=None,
        materialize_jacobian=False,
    )
    iters = 10
    opts = lso.Options(iterations=iters, x_tol=0.0, f_tol=0.0, g_tol=0.0)

    run = jax.jit(
        lambda x: lso.solve(
            prob,
            lso.LevenbergMarquardt(lso.LSMR(maxiter=60)),
            options=opts,
            x0=x,
        )
    )
    out = run(x0)
    jax.block_until_ready(out)
    mul_calls = int(np.asarray(out["mul_calls"]))

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = run(x0 * (1.0 + 1e-6 * i))
        np.asarray(out["ssr"])  # force host fetch (axon async caveat)
    dt = (time.perf_counter() - t0) / reps
    iters_done = int(np.asarray(out["iterations"]))
    iters_per_s = iters_done / dt

    # Baseline: single-core CPU matvec-bound estimate for the same work.
    # Each JVP/VJP touches ~4 nonzeros/row (tridiagonal + cubic diag) in the
    # compressed form; time a numpy equivalent of one matvec pair and scale.
    data = np.random.default_rng(0).standard_normal((m, 4)).astype(np.float32)
    v = np.random.default_rng(1).standard_normal(m).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(3):
        (data * v[:, None]).sum(axis=1)
    cpu_matvec = (time.perf_counter() - t0) / 3
    cpu_per_iter = (mul_calls / max(iters_done, 1)) * cpu_matvec
    vs = iters_per_s / (1.0 / cpu_per_iter) if cpu_per_iter > 0 else float("nan")

    print(
        json.dumps(
            {
                "metric": f"sparse_lm_lsmr_outer_iterations_per_second_{label}",
                "value": round(iters_per_s, 3),
                "unit": (
                    f"LM iters/s (m={label} residuals, n=100k params, "
                    f"matrix-free LSMR, {mul_calls} total matvecs, f32)"
                ),
                "vs_baseline": round(vs, 2),
            }
        )
    )

    if convergence:
        # Solve-to-convergence at the f32 dtype-scaled g_tol: the honest
        # "time-to-g_tol" number for the north-star scale point.
        conv_opts = lso.Options(iterations=100, x_tol=0.0, f_tol=0.0)
        run_conv = jax.jit(
            lambda x: lso.solve(
                prob,
                lso.LevenbergMarquardt(lso.LSMR(maxiter=60)),
                options=conv_opts,
                x0=x,
            )
        )
        out = run_conv(x0)
        np.asarray(out["ssr"])  # compile + fetch
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            out = run_conv(x0 * (1.0 + 1e-6 * (i + 1)))
            conv = bool(np.asarray(out["converged"]))
            its = int(np.asarray(out["iterations"]))
            ts.append(time.perf_counter() - t0)
        mem_line = ""
        try:
            stats = jax.local_devices()[0].memory_stats()
            used = stats.get("bytes_in_use", 0) / 2**30
            lim = stats.get("bytes_limit", 0) / 2**30
            mem_line = f", device mem {used:.2f}/{lim:.1f} GiB"
        except Exception:
            pass
        print(
            json.dumps(
                {
                    "metric": f"sparse_lm_lsmr_time_to_gtol_{label}",
                    "value": round(min(ts), 3),
                    "unit": (
                        f"s to g_tol=1e-5 (f32 default), {its} LM iters, "
                        f"converged={conv}, m={label}{mem_line}"
                    ),
                    "vs_baseline": round(
                        (1.0 / min(ts)) / (1.0 / (its * cpu_per_iter)), 2
                    )
                    if its
                    else float("nan"),
                }
            )
        )


def main():
    run_config(blocks=10, label="1M")
    run_config(blocks=100, label="10M", convergence=True)


if __name__ == "__main__":
    main()
