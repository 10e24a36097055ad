"""Gram-kernel roofline: fraction of HBM speed-of-light for (J'J, J'y).

The Gram formation is the hot op of the normal-equations path (SURVEY.md
§2 C9). For m >> n it is bandwidth-bound: the roofline minimum HBM traffic
is one read of J (m*n*4 bytes in f32). This bench measures achieved GB/s of
the default XLA path AND the opt-in Pallas kernel (round 2 demoted the
kernel from auto-engage after measuring parity — see ops/gram.py) against
the chip's measured copy bandwidth, reporting the speed-of-light fraction.

Prints one JSON line; vs_baseline = fused-kernel time advantage over the
two-pass XLA form (J.T@J then J.T@y as separate non-fused calls).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _scalar_fetch(out):
    """Host-sync on a single element (the axon tunnel makes full-array
    fetches and unforced block_until_ready unreliable for timing)."""
    leaf = None
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf[(0,) * leaf.ndim]))


def _time(fn, arg_sets, reps=6):
    """Min wall time of fn over reps (the shared-chip tunnel adds multi-ms
    stalls to individual dispatches; min is the stable statistic), cycling
    precomputed argument sets so no two consecutive dispatches are
    identical (dispatch caching)."""
    out = fn(*arg_sets[0])
    _scalar_fetch(out)
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(*arg_sets[(i + 1) % len(arg_sets)])
        _scalar_fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from leastsquaresoptim_jl_tpu.ops.gram import gram_and_rhs

    m, n = 1_048_576, 256
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.standard_normal((m, n)), dtype)
    y = jnp.asarray(rng.standard_normal(m), dtype)

    # Dispatch latency through the axon tunnel is tens of ms — amortize by
    # chaining K kernel applications inside one jitted dispatch. Each step
    # perturbs the (n,)-sized rhs input only (cheap), so the 1 GB J read
    # cannot be CSE'd away but no extra HBM traffic is added.
    K = 16
    scales = jnp.linspace(1.0, 1.0 + 1e-5, K, dtype=dtype)

    def chain(kernel):
        def run(J, y):
            def step(acc, c):
                # optimization_barrier: the Gram work itself is
                # y-independent, so without a barrier XLA's loop-invariant
                # code motion could hoist it out of the scan and the
                # per-step time would under-report by up to K x.
                Jb, yb = jax.lax.optimization_barrier((J, y * c))
                g, r = kernel(Jb, yb)
                return acc + g[0, 0] + r[0], None

            acc, _ = jax.lax.scan(step, jnp.zeros((), dtype), scales)
            return acc

        return jax.jit(run)

    arg_sets = [(J, y), (J, y * np.float32(1.0000001))]
    t_fused = _time(chain(gram_and_rhs), arg_sets) / K
    # The opt-in Pallas kernel (demoted from auto-engage in round 2 after
    # measuring ~parity; keep it exercised and honestly compared here).
    import functools
    t_pallas = _time(
        chain(functools.partial(gram_and_rhs, use_pallas=True)), arg_sets
    ) / K
    bytes_min = m * n * 4  # roofline: single read of J
    gbs = bytes_min / t_fused / 1e9

    # HBM speed-of-light: a pure reduction reading J once per step.
    def read_only(J, y):
        return jnp.sum(J, axis=0, keepdims=True) * y[0], jnp.zeros((1,), dtype)

    t_copy = _time(chain(read_only), arg_sets) / K
    copy_gbs = bytes_min / t_copy / 1e9
    sol_frac = gbs / copy_gbs if copy_gbs > 0 else float("nan")

    # Two-pass unfused baseline (separate J reads for J'J and J'y).
    def two_pass(J, y):
        return J.T @ J, J.T @ y

    t_two = _time(chain(two_pass), arg_sets) / K

    print(
        json.dumps(
            {
                "metric": "gram_kernel_bandwidth",
                "value": round(gbs, 1),
                "unit": (
                    f"GB/s effective (m={m}, n={n}, f32; "
                    f"pallas opt-in {bytes_min / t_pallas / 1e9:.0f} GB/s; "
                    f"{100 * sol_frac:.0f}% of measured copy speed-of-light "
                    f"{copy_gbs:.0f} GB/s)"
                ),
                "vs_baseline": round(t_two / t_fused, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
