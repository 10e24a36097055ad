"""Geodesic acceleration on a batched sloppy-model workload.

Measures converged fits/s for B independent 2-term exponential-sum fits
(exp_sum_2, close decay rates, far starts — the sloppy-valley regime
geodesic acceleration exists for) with plain LM vs
``LevenbergMarquardt(geodesic=True)``, fraction-stop at 99%.

The trade geodesic makes: ~3x the model evaluations per iteration (the
forward-over-forward f''[v,v] JVP) against ~2x fewer iterations on
sloppy trajectories (measured f64 NIST: Bennet5 348 -> 222, MGH10 s1
175 -> 86). On an eval-bound batched workload the win is therefore NOT
guaranteed — this bench measures the end-to-end outcome honestly on the
chip. Prints one JSON line: value = geodesic converged fits/s,
vs_baseline = speedup over plain LM on the same workload (values < 1
mean plain wins there).

TPU timing per CLAUDE.md: work chained per dispatch is one full
fraction-stop batch; inputs varied between dispatches; scalar-only
fetches; min-of-reps.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_workload(B=50_000, m=64, reps=3, iterations=400):
    import jax
    import jax.numpy as jnp

    import leastsquaresoptim_jl_tpu as lso
    from leastsquaresoptim_jl_tpu.models.curves import curve_fit_batch

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    xd = np.linspace(0.0, 6.0, m)
    # close decay rates => collinear basis, curved valley (sloppy)
    # rate ratio ~1.3-2.2: Lanczos-class sloppiness (CPU pilot at
    # B=2000: plain 51 max iters / geo 34 — ~2x wall-clock; a 3x-6x
    # separation converges too fast to discriminate)
    bt = np.stack(
        [
            rng.uniform(1.0, 4.0, B),
            rng.uniform(0.45, 0.60, B),
            rng.uniform(0.5, 2.5, B),
            rng.uniform(0.75, 1.00, B),
        ],
        1,
    )
    Y = (
        bt[:, :1] * np.exp(-bt[:, 1:2] * xd[None, :])
        + bt[:, 2:3] * np.exp(-bt[:, 3:4] * xd[None, :])
    ).astype(np.float32)
    # far starts: 0.5-2x multiplicative perturbation per component
    p0 = (bt * rng.uniform(0.5, 2.0, bt.shape)).astype(np.float32)
    xdj = jnp.asarray(xd, dtype)
    Yj = jnp.asarray(Y)
    p0j = jnp.asarray(p0)

    results = {}
    for tag, geo in (("plain", False), ("geodesic", True)):
        opt = lso.LevenbergMarquardt(lso.Cholesky(), geodesic=geo)

        def run(P0):
            raw = curve_fit_batch(
                "exp_sum_2", xdj, Yj, P0, optimizer=opt,
                options=lso.Options(iterations=iterations),
                min_converged_fraction=0.99,
            )
            # scalar-only fetch: converged count + accuracy summary
            rel = jnp.max(
                jnp.abs(raw["minimizer"] - jnp.asarray(bt, dtype))
                / jnp.abs(jnp.asarray(bt, dtype)),
                axis=1,
            )
            return (
                jnp.sum(raw["converged"].astype(jnp.int32)),
                jnp.median(rel),
                jnp.max(raw["iterations"]),
            )

        runj = jax.jit(run)
        out = jax.block_until_ready(runj(p0j))  # compile + warm
        best = np.inf
        for i in range(reps):
            P0 = p0j * (1.0 + 1e-4 * (i + 1))
            t0 = time.perf_counter()
            out = jax.block_until_ready(runj(P0))
            best = min(best, time.perf_counter() - t0)
        nconv = int(np.asarray(out[0]))
        results[tag] = dict(
            fits_per_s=nconv / best,
            converged=nconv,
            median_rel=float(np.asarray(out[1])),
            max_iters=int(np.asarray(out[2])),
            seconds=best,
        )
        print(f"# {tag}: {results[tag]}", file=sys.stderr)
    return results, B


def main():
    results, B = run_workload()
    geo = results["geodesic"]
    plain = results["plain"]
    print(
        json.dumps(
            {
                "metric": "geodesic_batched_sloppy_fits_per_second",
                "value": round(geo["fits_per_s"], 1),
                "unit": (
                    f"converged fits/s (B={B} exp_sum_2 close-rate far-start "
                    f"f32 fits, 99% stop; geodesic LM)"
                ),
                "vs_baseline": round(geo["fits_per_s"] / plain["fits_per_s"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
