"""Grid-structured transcendental evaluation.

Curve models on a *uniformly sampled* grid x_i = t0 + i*dt evaluate
``exp(s * x_i)`` as a geometric sequence: e_i = exp(s*t0) * r**i with
r = exp(s*dt). A power table built by repeated squaring turns the m
transcendentals into **2 exps + ~m multiplies** — on the TPU VPU, where
``exp`` costs an order of magnitude more than a multiply, this is the
dominant cost of exponential-family batched curve fitting (bench.py's
headline per-iteration bisection: model evaluation is ~70% of the LM
iteration and is exp-bound, benchmarks/bench_lm_iteration.py).

The reference has no analogue (it evaluates user residual closures
elementwise on the CPU, /root/reference/src/types.jl:48-66); this is the
TPU-native counterpart of handing the framework model structure it can
exploit.

Accuracy: each table element is a product of at most ~log2(m) rounded
factors, so relative error is a few ulps times log2(m) (~6e-7 in f32 at
m=64, measured in tests/test_special.py) — below the f32 convergence
tolerances (config.py F32_*_TOL ~ 1e-5).

Derivatives are exact-by-construction: d e/d s = x ⊙ e via a custom JVP
(one extra multiply per sample), rather than AD through the power
ladder. The JVP is linear in the tangent so reverse mode transposes it
automatically.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_exp_grid"]


def _pow_table(r, k: int):
    """[r^0, r^1, ..., r^(2^k - 1)] by k doubling steps (k vector
    multiplies of geometrically growing width plus k squarings)."""
    p = jnp.stack([jnp.ones_like(r), r]) if k >= 1 else jnp.ones_like(r)[None]
    cur = r * r  # r^(2^j) for the next doubling
    for _ in range(k - 1):
        p = jnp.concatenate([p, p * cur])
        cur = cur * cur
    return p


def make_exp_grid(t0: float, dt: float, m: int):
    """Build ``e(s) -> exp(s * (t0 + dt*arange(m)))`` for scalar ``s``.

    ``t0``, ``dt``, ``m`` are static (baked into the compiled program);
    ``s`` is a traced scalar (vmap over a batch of s gives a (B, m)
    evaluation). Returns a function differentiable in ``s`` (forward and
    reverse) with the exact rule d e/d s = x * e.
    """
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    x_np = t0 + dt * np.arange(m, dtype=np.float64)

    # split m = m_hi * m_lo with both table halves ~sqrt(m): the full
    # sequence is the outer product lo ⊗ hi, reshaped and truncated.
    k_lo = max(1, (m - 1).bit_length() // 2) if m > 1 else 0
    m_lo = 1 << k_lo
    m_hi = -(-m // m_lo)  # ceil
    k_hi = max((m_hi - 1).bit_length(), 0)

    @jax.custom_jvp
    def exp_grid(s):
        x = jnp.asarray(x_np, jnp.result_type(s))
        if m <= 4:
            return jnp.exp(s * x)
        r = jnp.exp(s * dt)
        lo = _pow_table(r, k_lo)                       # r^[0 .. m_lo-1]
        # a fresh exp for the hi-table base (not lo[-1]*r): the base's
        # rounding error is amplified by the power it is raised to, and
        # i = j*m_lo + k splits that amplification into j + k ≲ 2*sqrt(m)
        # instead of i ≲ m (measured: halves the worst-case f32 error).
        r_hi = jnp.exp(s * (dt * m_lo))                # r^m_lo
        hi = _pow_table(r_hi, k_hi)[:m_hi]             # r^[0, m_lo, 2m_lo, ..]
        hi = hi * jnp.exp(s * t0)                      # fold the offset in
        return (hi[:, None] * lo[None, :]).reshape(m_hi * m_lo)[:m]

    @exp_grid.defjvp
    def _exp_grid_jvp(primals, tangents):
        (s,), (ds,) = primals, tangents
        e = exp_grid(s)
        x = jnp.asarray(x_np, e.dtype)
        return e, (x * e) * ds

    return exp_grid
