"""BASELINE.json config #5 (pod-scale): residual-row-sharded LM(LSMR) over
a device mesh.

On a pod slice this measures weak scaling of LM iterations/s (shard the
rows axis over all chips; collectives ride ICI — one psum per LSMR matvec
pair, see tests/test_sharding.py's compiled-HLO gate). On this single-chip
environment it runs the identical sharded code path on a 1-device mesh and
reports iterations/s; vs_baseline is the unsharded single-chip solve of
the same problem (sharding overhead factor; ~1.0 means the distributed
path is free at mesh=1).

Run on N chips (or N virtual devices via
XLA_FLAGS=--xla_force_host_platform_device_count=N) to see scaling.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def trend():
    """Virtual-mesh overhead trend (VERDICT round-1 weak #5): run the same
    fixed-size sharded solve on mesh sizes 1/2/4/8 and record the overhead
    factor vs mesh=1. On this box all virtual devices share one CPU core,
    so total compute is constant and the factor isolates the partition +
    collective overhead the GSPMD lowering adds — real weak scaling needs a
    pod. Run with XLA_FLAGS=--xla_force_host_platform_device_count=8 and
    JAX platform cpu (forced in-process below)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import leastsquaresoptim_jl_tpu as lso
    from leastsquaresoptim_jl_tpu.parallel import (
        make_mesh,
        shard_rows,
        sharded_problem,
    )

    ndev = len(jax.devices())
    m, n = 262_144, 512
    dtype = jnp.float32
    rows_per_param = m // n
    xdata = jnp.linspace(0.0, 1.0, m, dtype=dtype)
    ydata = jnp.sin(3.0 * xdata)

    def per_row(beta, row):
        xr, yr, idx = row
        i = jnp.minimum(idx.astype(jnp.int32), n - 4)
        b0 = jnp.take(beta, i)
        b1 = jnp.take(beta, i + 1)
        b2 = jnp.take(beta, i + 2)
        b3 = jnp.take(beta, i + 3)
        return yr - (b0 + b1 * xr + b2 * xr * xr + b3 * jnp.sin(xr))

    idx = (jnp.arange(m) // rows_per_param).astype(dtype)
    x0 = jnp.zeros((n,), dtype)
    opts = lso.Options(iterations=3, x_tol=0.0, f_tol=0.0, g_tol=0.0)
    opt = lso.LevenbergMarquardt(lso.LSMR(maxiter=20))

    table = {}
    sizes = [k for k in (1, 2, 4, 8) if k <= ndev]
    for k in sizes:
        mesh = make_mesh((k,), ("rows",), devices=jax.devices()[:k])
        data = shard_rows((xdata, ydata, idx), mesh)
        prob = sharded_problem(per_row, data, x0, mesh)

        @jax.jit
        def run(x, prob=prob, opt=opt, opts=opts):
            return lso.solve(prob, opt, options=opts, x0=x)

        with mesh:
            out = run(x0)
            np.asarray(out["ssr"])
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                out = run(x0 * (1.0 + 1e-6 * (i + 1)) + 1e-6)
                np.asarray(out["ssr"])
                times.append(time.perf_counter() - t0)
        table[k] = min(times)
        print(f"mesh={k}: {table[k]:.3f}s", file=sys.stderr)

    base = table[sizes[0]]
    factors = {k: round(t / base, 3) for k, t in table.items()}
    print(
        json.dumps(
            {
                "metric": "sharded_virtual_mesh_overhead_factor",
                "value": factors[sizes[-1]],
                "unit": (
                    f"wall-clock vs mesh=1, fixed m={m}, n={n}, f32, "
                    f"virtual CPU devices (shared core): "
                    + ", ".join(f"mesh{k}={v}x" for k, v in factors.items())
                ),
                "vs_baseline": 1.0,
            }
        )
    )


def main():
    if "--trend" in sys.argv:
        trend()
        return
    import jax
    import jax.numpy as jnp

    import leastsquaresoptim_jl_tpu as lso
    from leastsquaresoptim_jl_tpu.parallel import (
        make_mesh,
        shard_rows,
        sharded_problem,
    )

    ndev = len(jax.devices())
    mesh = make_mesh((ndev,), ("rows",))
    m = 1_048_576 * ndev  # weak scaling: 1M residuals per chip
    dtype = jnp.float32
    n = 4096

    # block-structured residual: each row couples a window of 4 params
    rows_per_param = m // n
    xdata = jnp.linspace(0.0, 1.0, m, dtype=dtype)
    ydata = jnp.sin(3.0 * xdata)

    def per_row(beta, row):
        xr, yr, idx = row
        i = jnp.minimum(idx.astype(jnp.int32), n - 4)
        # 4-param window via gathers (vmapped dynamic_slice faults the TPU
        # kernel at this scale; gather lowers cleanly)
        b0 = jnp.take(beta, i)
        b1 = jnp.take(beta, i + 1)
        b2 = jnp.take(beta, i + 2)
        b3 = jnp.take(beta, i + 3)
        pred = b0 + b1 * xr + b2 * xr * xr + b3 * jnp.sin(xr)
        return yr - pred

    idx = (jnp.arange(m) // rows_per_param).astype(dtype)
    data = shard_rows((xdata, ydata, idx), mesh)
    x0 = jnp.zeros((n,), dtype)
    iters = 5
    opts = lso.Options(iterations=iters, x_tol=0.0, f_tol=0.0, g_tol=0.0)
    opt = lso.LevenbergMarquardt(lso.LSMR(maxiter=30))

    prob = sharded_problem(per_row, data, x0, mesh)

    @jax.jit
    def run(x):
        return lso.solve(prob, opt, options=opts, x0=x)

    with mesh:
        out = run(x0)
        np.asarray(out["ssr"])
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = run(x0 * (1.0 + 1e-6 * (i + 1)) + 1e-6)
            np.asarray(out["ssr"])
            times.append(time.perf_counter() - t0)
    t_sharded = min(times)
    iters_done = int(np.asarray(out["iterations"]))
    iters_per_s = iters_done / t_sharded

    # Unsharded single-chip baseline of the same problem (overhead factor).
    # Only meaningful (and only *possible* — non-addressable shards can't be
    # fetched) on a single process.
    if jax.process_count() > 1:
        print(
            json.dumps(
                {
                    "metric": "sharded_lm_lsmr_iterations_per_second",
                    "value": round(iters_per_s, 3),
                    "unit": (
                        f"LM iters/s (rows-sharded over {ndev} devices, "
                        f"{jax.process_count()} hosts, m={m}, n={n}, f32)"
                    ),
                    "vs_baseline": float("nan"),
                }
            )
        )
        return
    xd0, yd0, id0 = (jnp.asarray(np.asarray(l)) for l in data)
    prob0 = lso.LeastSquaresProblem(
        residual_fn=lambda b: jax.vmap(lambda xr, yr, ii: per_row(b, (xr, yr, ii)))(
            xd0, yd0, id0
        ),
        x0=x0, m=m, jac_fn=None, materialize_jacobian=False,
    )

    @jax.jit
    def run0(x):
        return lso.solve(prob0, opt, options=opts, x0=x)

    out0 = run0(x0)
    np.asarray(out0["ssr"])
    times0 = []
    for i in range(3):
        t0 = time.perf_counter()
        out0 = run0(x0 * (1.0 + 1e-6 * (i + 1)) + 1e-6)
        np.asarray(out0["ssr"])
        times0.append(time.perf_counter() - t0)
    t_plain = min(times0)

    print(
        json.dumps(
            {
                "metric": "sharded_lm_lsmr_iterations_per_second",
                "value": round(iters_per_s, 3),
                "unit": (
                    f"LM iters/s (rows-sharded over {ndev} device(s), "
                    f"m={m} residuals, n={n} params, matrix-free LSMR, f32)"
                ),
                "vs_baseline": round(t_plain / t_sharded, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
