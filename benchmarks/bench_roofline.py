"""Roofline/MFU figure for the headline route (round-3 VERDICT weak #3).

BASELINE.md's north star is "MXU-saturating throughput (measured)". The
headline workload (bench.py: B=100k exponential curve fits, m=64 samples,
VarPro-reduced LM + gridded-exp evaluation) is **HBM-bound, not
MXU-bound**: per lockstep LM iteration the mandatory traffic is the
(B, m) f32 data array Y (25.6 MB) once per model evaluation — the
reduced n=1 parameter vector, basis power tables, and loop flags are
KB-to-MB-scale by comparison, and the largest matmul is a (B, 64, 1)
Gram contraction that the MXU never sees (it lowers to a VPU reduction).
So the honest roofline is bytes/s against the measured HBM copy
bandwidth, not FLOP/s against the 394 bf16-TFLOP MXU — at m=64 the
entire fit does ~2.6 KFLOP/fit/iteration, i.e. ~0.9 TFLOP/s at the
measured iteration rate: <0.5% MXU utilization by construction of the
workload, which is exactly why the optimization story of rounds 2-4 is
traffic elimination (shared grid, dropped carries, VarPro reduction)
rather than matmul tuning.

Measures on the real chip:
  copy_bw      read+write streaming bandwidth of a (B, m) f32 array
               (the practical HBM roofline for this shape)
  varpro_iter  per-lockstep-iteration wall time of the REAL headline
               solve (curve_fit_batch separable+gridded, fraction stop)
  joint_iter   same for the joint route (bench_lm_iteration's solve_full)

and derives bytes/iteration at two accounting levels:
  floor-1x: one Y pass/iteration — the information-theoretic minimum
            (any LM iteration must at least read the data once)
  model-2x: two Y passes/iteration — what the VarPro schedule actually
            does (coefficient-solve products Phi'y inside the reduced
            residual + the trial-point residual evaluation; the
            linearize primal shares the first pass)

Prints one JSON line:
  value = achieved fraction of the copy-bandwidth roofline under the
          model-2x accounting (1.0 = speed of light for this schedule)
  vs_baseline = multiple of the floor-1x bound (how far from the
          information-theoretic minimum a better schedule could go).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import leastsquaresoptim_jl_tpu as lso
    from leastsquaresoptim_jl_tpu.models import curve_fit_batch

    B, m = 100_000, 64
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    xdata = np.linspace(1.0, 80.0, m)
    bt = np.stack([rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], 1)
    Y = bt[:, :1] * (1.0 - np.exp(-bt[:, 1:2] * xdata[None, :]))
    x0 = bt * rng.uniform(0.7, 1.4, (B, 2))

    yd = jnp.asarray(Y, dtype)
    x0j = jnp.asarray(x0, dtype)
    nbytes = B * m * 4
    # XLA TPU pads the minor dim to 128 lanes: a (B, 64) f32 array
    # occupies (B, 128) in HBM (see CLAUDE.md / ops/gram.py), so the
    # PHYSICAL traffic is 2x the logical bytes for this shape. The copy
    # roofline below is measured on the SAME shape, so the fraction is
    # padding-fair; the absolute GB/s figures are logical bytes.

    # Chain enough passes that the ~40 ms axon dispatch latency is noise
    # (R=16 was measured to report 37 GB/s — pure latency pollution).
    R = 1024

    # --- copy bandwidth: R chained read+write passes over (B, m) ---
    @jax.jit
    def copy_chain(y):
        def rep(acc, _):
            return acc + jnp.float32(1e-7), acc[0, 0]
        out, s = jax.lax.scan(rep, y, None, length=R)
        return jnp.sum(out[0]) + jnp.sum(s)

    np.asarray(copy_chain(yd))
    ts = []
    for i in range(4):
        yv = yd * (1.0 + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        float(np.asarray(copy_chain(yv)))
        ts.append((time.perf_counter() - t0) / R)
    t_copy = min(ts)
    copy_bw = 2 * nbytes / t_copy  # read + write per pass (logical bytes)
    print(
        f"copy_bw      : {copy_bw / 1e9:8.1f} GB/s "
        f"({1e3 * t_copy:.3f} ms per read+write pass of {nbytes / 1e6:.1f} MB)",
        file=sys.stderr,
    )

    # --- the real headline solve, per lockstep iteration ---
    opts = lso.Options(iterations=50, x_tol=1e-6, f_tol=1e-6, g_tol=1e-5)
    RS = 48  # ~5 lockstep iters/batch: enough batches to bury the 40 ms

    @jax.jit
    def run_varpro(x0_, yd_):
        def rep(x0r, _):
            raw = curve_fit_batch(
                "exp_saturation", xdata, yd_, x0r,
                optimizer=lso.LevenbergMarquardt(lso.Cholesky()),
                options=opts, min_converged_fraction=0.99,
                separable=True, gridded=True,
            )
            return x0r * (1.0 + 1e-7), jnp.max(raw["iterations"])
        _, mx = jax.lax.scan(rep, x0_, None, length=RS)
        return jnp.max(mx)

    mx = int(np.asarray(run_varpro(x0j, yd)))
    ts = []
    for i in range(4):
        a0 = x0j * (1.0 + 1e-5 * (i + 1))
        t0 = time.perf_counter()
        mx = int(np.asarray(run_varpro(a0, yd)))
        ts.append((time.perf_counter() - t0) / RS)
    t_batch = min(ts)
    t_iter = t_batch / mx
    print(
        f"varpro_iter  : {1e3 * t_iter:8.3f} ms/lockstep-iter "
        f"(~{mx} iters, {1e3 * t_batch:.1f} ms/batch)",
        file=sys.stderr,
    )

    # Bytes accounting (see module docstring). Reads only — the iteration
    # writes no m-sized arrays back to HBM (residual/Gram are reduced on
    # the fly; the carry is O(n)=O(1) per fit).
    floor_1x = nbytes
    model_2x = 2 * nbytes
    # Achieved traffic rate under each accounting:
    bw_1x = floor_1x / t_iter
    bw_2x = model_2x / t_iter
    # Effective roofline for pure reads: streaming read bandwidth is
    # ~copy_bw (read+write symmetric on v5e HBM2e at this size).
    frac_2x = bw_2x / copy_bw
    frac_1x = bw_1x / copy_bw
    flops_per_iter = B * m * 40  # ~40 flop per sample per iteration (exp
    # via 3-table gridded product, basis products, reductions) — generous
    print(
        f"achieved     : {bw_2x / 1e9:8.1f} GB/s under model-2x accounting "
        f"({100 * frac_2x:.0f}% of copy roofline); "
        f"{bw_1x / 1e9:.1f} GB/s / {100 * frac_1x:.0f}% under floor-1x",
        file=sys.stderr,
    )
    print(
        f"mxu_note     : ~{flops_per_iter / t_iter / 1e12:.2f} TFLOP/s "
        f"equivalent — <1% of the MXU peak; this workload is HBM-bound "
        f"by construction (m=64, n=1 reduced)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "headline_roofline_fraction",
                "value": round(frac_2x, 3),
                "unit": (
                    f"fraction of measured HBM copy roofline "
                    f"({copy_bw / 1e9:.0f} GB/s) achieved by the "
                    f"VarPro+gridded headline iteration under 2-pass "
                    f"accounting ({1e3 * t_iter:.3f} ms/iter, B=100k m=64)"
                ),
                "vs_baseline": round(t_iter / (floor_1x / copy_bw), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
