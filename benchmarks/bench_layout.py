"""Batch-last (m, B) layout lever: matched eval pair (VERDICT r3 weak #3).

ROADMAP round 3 measured batch-first (B, m) vs batch-last (m, B) at ~10%
on the JOINT route's model evaluation. This re-measures the pair for the
round-4 headline regime in a stripped whole-array formulation (no vmap —
both layouts get identical op graphs, only the axis order differs):

  K chained evaluations of r = y - b0*(1 - exp(-b1*x)) plus the n=1
  reduced-Gram reductions over the sample axis, in (B, m) and (m, B).

Rationale for the lever: a (B, 64) f32 array pads its minor dim to 128
lanes (2x physical bytes and half-empty vector lanes); (m, B) with
B=100k has a fully-packed minor dim. If the headline iteration were
traffic- or lane-bound, batch-last should approach 2x. The measured
round-4 result (see benchmarks/README.md) decides whether the invasive
batch-last refactor of the curve-fit driver is worth it (>1.1x keeps it,
per the VERDICT decision rule).

Prints ms/eval for each layout and the ratio.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    B, m, K, R = 100_000, 64, 12, 32
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    xdata = np.linspace(1.0, 80.0, m)
    bt = np.stack([rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], 1)
    Y = bt[:, :1] * (1.0 - np.exp(-bt[:, 1:2] * xdata[None, :]))

    xg = jnp.asarray(xdata, dtype)                      # (m,)
    yBm = jnp.asarray(Y, dtype)                         # (B, m)
    ymB = jnp.asarray(np.ascontiguousarray(Y.T), dtype) # (m, B)
    b0 = jnp.asarray(bt[:, 0], dtype)                   # (B,)
    b1 = jnp.asarray(bt[:, 1], dtype)

    def eval_batch_first(p, y):
        a, l = p                               # (B,), (B,)
        model = a[:, None] * (1.0 - jnp.exp(-l[:, None] * xg[None, :]))
        r = y - model                          # (B, m)
        # n=1 reduced-Gram reductions over the sample axis
        dmodel = a[:, None] * xg[None, :] * jnp.exp(-l[:, None] * xg[None, :])
        g = jnp.sum(dmodel * r, axis=1)        # (B,)
        h = jnp.sum(dmodel * dmodel, axis=1)
        return g, h

    def eval_batch_last(p, y):
        a, l = p
        model = a[None, :] * (1.0 - jnp.exp(-l[None, :] * xg[:, None]))
        r = y - model                          # (m, B)
        dmodel = a[None, :] * xg[:, None] * jnp.exp(-l[None, :] * xg[:, None])
        g = jnp.sum(dmodel * r, axis=0)        # (B,)
        h = jnp.sum(dmodel * dmodel, axis=0)
        return g, h

    def make_chain(ev, y):
        @jax.jit
        def chain(a0, l0):
            def rep(carry, _):
                a, l = carry
                def one(c, _):
                    aa, ll = c
                    g, h = ev((aa, ll), y)
                    return (aa + 1e-12 * g, ll + 1e-12 * h), g[0]
                c, s = jax.lax.scan(one, (a, l), None, length=K)
                return (c[0] * (1.0 + 1e-7), c[1]), jnp.sum(s)
            _, ss = jax.lax.scan(rep, (a0, l0), None, length=R)
            return jnp.sum(ss)
        return chain

    for label, ev, y in (
        ("batch_first (B,m)", eval_batch_first, yBm),
        ("batch_last  (m,B)", eval_batch_last, ymB),
    ):
        chain = make_chain(ev, y)
        np.asarray(chain(b0, b1))
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            float(np.asarray(chain(b0 * (1.0 + 1e-5 * (i + 1)), b1)))
            ts.append((time.perf_counter() - t0) / (K * R))
        print(f"{label}: {1e3 * min(ts):8.4f} ms/eval")


if __name__ == "__main__":
    main()
