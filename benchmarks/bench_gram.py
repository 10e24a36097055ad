"""Gram-kernel roofline: fraction of HBM speed-of-light for (J'J, J'y).

The Gram formation is the hot op of the normal-equations path (SURVEY.md
§2 C9). For m >> n it is bandwidth-bound: the roofline minimum HBM traffic
is one read of J (m*n*4 bytes in f32). This bench measures achieved GB/s of
the fused kernel (ops/gram.py auto-selects Pallas on TPU) against the
chip's measured copy bandwidth, reporting the speed-of-light fraction.

Prints one JSON line; vs_baseline = fused-kernel time advantage over the
two-pass XLA form (J.T@J then J.T@y as separate non-fused calls).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _time(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[0]  # host sync
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from leastsquaresoptim_jl_tpu.ops.gram import gram_and_rhs

    m, n = 1_048_576, 256
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.standard_normal((m, n)), dtype)
    y = jnp.asarray(rng.standard_normal(m), dtype)

    fused = jax.jit(lambda J, y: gram_and_rhs(J, y))
    t_fused = _time(fused, J, y)
    bytes_min = m * n * 4  # roofline: single read of J
    gbs = bytes_min / t_fused / 1e9

    # HBM copy bandwidth as measured speed-of-light (read+write, so one copy
    # moves 2x the buffer).
    copy = jax.jit(lambda x: x + 1.0)
    t_copy = _time(copy, J)
    copy_gbs = 2 * bytes_min / t_copy / 1e9
    sol_frac = gbs / copy_gbs if copy_gbs > 0 else float("nan")

    # Two-pass unfused baseline.
    def two_pass(J, y):
        return J.T @ J, J.T @ y

    t_two = _time(jax.jit(two_pass), J, y)

    print(
        json.dumps(
            {
                "metric": "gram_kernel_bandwidth",
                "value": round(gbs, 1),
                "unit": (
                    f"GB/s effective (m={m}, n={n}, f32; "
                    f"{100 * sol_frac:.0f}% of measured copy speed-of-light "
                    f"{copy_gbs:.0f} GB/s)"
                ),
                "vs_baseline": round(t_two / t_fused, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
