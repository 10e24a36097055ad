"""BASELINE.json config #3: box-bounded dense fit, ~1k params, projected
Dogleg (step clipping + projected-gradient KKT test).

A dense nonlinear regression with n=1024 parameters and m=8192 residuals
(random smooth design, exponential link), with active lower bounds at the
optimum for ~25% of the coordinates. Dogleg(Cholesky): the fused Gram kernel
carries the per-iteration cost (m n^2 FLOPs on the MXU).

Prints one JSON line; vs_baseline compares against the GEMM-bound
single-core CPU time for the same Gram volume.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import leastsquaresoptim_jl_tpu as lso

    m, n = 8192, 1024
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n), dtype)
    x_true = jnp.asarray(np.abs(rng.standard_normal(n)) * 0.5, dtype)
    y = jnp.tanh(A @ x_true) + 0.01 * jnp.asarray(rng.standard_normal(m), dtype)

    def residual_fn(x):
        return jnp.tanh(A @ x) - y

    lower = jnp.full((n,), 0.2, dtype)  # active wherever x_true < 0.2
    x0 = jnp.full((n,), 0.6, dtype)
    iters = 30
    opts = lso.Options(iterations=iters, x_tol=0.0, f_tol=0.0, g_tol=0.0)
    prob = lso.LeastSquaresProblem(
        residual_fn=residual_fn, x0=x0, m=m, jac_fn=jax.jacfwd(residual_fn),
        materialize_jacobian=True,
    )

    run = jax.jit(
        lambda x, lo: lso.solve(
            prob, lso.Dogleg(lso.Cholesky()), options=opts, lower=lo, x0=x
        )
    )
    out = run(x0, lower)
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = run(x0 * (1.0 + 1e-6 * i), lower)
        np.asarray(out["ssr"])  # force host fetch
    dt = (time.perf_counter() - t0) / reps
    iters_done = int(np.asarray(out["iterations"]))
    iters_per_s = iters_done / dt

    # CPU baseline: one Gram J'J (m n^2 MACs) per iteration via numpy sgemm.
    Jnp = np.asarray(A, dtype=np.float32)
    t0 = time.perf_counter()
    Jnp.T @ Jnp
    cpu_gram = time.perf_counter() - t0
    vs = iters_per_s * cpu_gram

    print(
        json.dumps(
            {
                "metric": "bounded_dogleg_iterations_per_second",
                "value": round(iters_per_s, 2),
                "unit": (
                    f"Dogleg iters/s (m={m}, n={n} dense, active lower "
                    f"bounds, Cholesky/fused Gram, f32)"
                ),
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
