"""Fused Pallas VarPro kernel vs the lax (XLA-fused) route — headline shape.

Round-4 finding (measured on the v5e chip, recorded in README.md here):
the Pallas kernel that runs K whole LM iterations per launch with all
state VMEM-resident (`ops/kernel_varpro.py`) is a clear NEGATIVE —
~7.8-10 ms/batch vs the lax route's ~1.3 ms marginal batch at
B=100k/m=64 — because this workload is elementwise VPU chains that XLA
already fuses to the ALU floor, while the hand kernel pays full-width
Mosaic scalar passes, a fixed K (vs the fraction-stop's ~5 needed
iterations), two basis evals per iteration (vs the lax fused schedule's
shared primal) and the naive exp (vs the gridded tables). Same verdict
family as the round-2 Pallas Gram experiment: on TPU, beat XLA only
where fusion is impossible, not where it is routine.

This script keeps the measurement reproducible. Prints one JSON line:
kernel fits/s with `vs_baseline` = kernel/lax throughput ratio (<1 =
the documented negative).
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.models import curve_fit_batch
from leastsquaresoptim_jl_tpu.ops.kernel_varpro import (
    varpro_lm_p1_kernel_solve,
)


def make_problem(B, m, seed=0):
    rng = np.random.default_rng(seed)
    xd = np.linspace(1.0, 80.0, m)
    bt = np.stack(
        [rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], axis=1
    )
    Y = (bt[:, :1] * (1.0 - np.exp(-bt[:, 1:2] * xd[None, :]))).astype(
        np.float32
    )
    p0 = (bt * rng.uniform(0.7, 1.4, bt.shape)).astype(np.float32)
    return xd, jnp.asarray(Y), jnp.asarray(p0), jnp.asarray(
        bt.astype(np.float32)
    )


def time_route(fn, perturb_scales, reps=3):
    """min-of-reps wall time of a jitted chained run; returns (t, aux)."""
    g = jax.jit(fn)
    out = jax.block_until_ready(g(perturb_scales))
    best = float("inf")
    for i in range(reps):
        scales = perturb_scales * (1.0 + 1e-5 * (i + 1))
        t0 = time.perf_counter()
        out = jax.block_until_ready(g(scales))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=100_000)
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--R", type=int, default=40, help="dispatch chain length")
    ap.add_argument("--k-iters", type=int, default=8)
    ap.add_argument("--block-fits", type=int, default=512)
    args = ap.parse_args()

    xd, Y, p0, bt = make_problem(args.B, args.m)
    a0 = p0[:, 1]
    perturbs = jnp.linspace(1.0, 1.0 + 1e-4, args.R, dtype=jnp.float32)

    phi = lambda x, a: 1.0 - jnp.exp(-a * x)
    dphi = lambda x, a: x * jnp.exp(-a * x)

    def kernel_chain(scales):
        def one(c):
            out = varpro_lm_p1_kernel_solve(
                phi, dphi, xd, Y, a0 * c,
                x_tol=1e-6, f_tol=1e-6, g_tol=1e-5, iterations=50,
                min_converged_fraction=0.99, k_iters=args.k_iters,
                block_fits=args.block_fits,
            )
            return out["alpha"][-1], jnp.sum(out["converged"])
        return jax.lax.map(one, scales)

    def lax_chain(scales):
        def one(c):
            raw = curve_fit_batch(
                "exp_saturation", xd, Y, p0 * c[None],
                optimizer=lso.LevenbergMarquardt(lso.Cholesky()),
                options=lso.Options(
                    iterations=50, x_tol=1e-6, f_tol=1e-6, g_tol=1e-5
                ),
                separable=True, gridded=True, fused=True,
                min_converged_fraction=0.99,
            )
            return raw["minimizer"][-1, 1], jnp.sum(raw["converged"])
        return jax.lax.map(one, scales)

    print("compiling + timing kernel route...", file=sys.stderr, flush=True)
    tk, (ak, ck) = time_route(kernel_chain, perturbs)
    nk = int(np.asarray(ck).sum())
    print(
        f"kernel: {tk*1e3:.1f} ms, {tk*1e3/args.R:.3f} ms/batch, "
        f"{nk/tk:,.0f} fits/s (conv {nk}/{args.R*args.B})",
        file=sys.stderr, flush=True,
    )

    print("compiling + timing lax route...", file=sys.stderr, flush=True)
    tl, (al, cl) = time_route(lax_chain, perturbs)
    nl = int(np.asarray(cl).sum())
    print(
        f"lax:    {tl*1e3:.1f} ms, {tl*1e3/args.R:.3f} ms/batch, "
        f"{nl/tl:,.0f} fits/s (conv {nl}/{args.R*args.B})",
        file=sys.stderr, flush=True,
    )

    print(json.dumps({
        "metric": "pallas_varpro_kernel_fits_per_second",
        "value": round(nk / tk),
        "unit": (
            f"converged fits/s (fused Pallas K={args.k_iters} kernel, "
            f"B={args.B}, m={args.m}, R={args.R} chain)"
        ),
        "vs_baseline": round(nk / tk / (nl / tl), 3),
    }))


if __name__ == "__main__":
    main()
