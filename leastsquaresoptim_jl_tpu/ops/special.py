"""Grid-structured transcendental evaluation.

Curve models on a *uniformly sampled* grid x_i = t0 + i*dt evaluate
``exp(s * x_i)`` as a geometric sequence: e_i = exp(s*t0) * r**i with
r = exp(s*dt). A power table built by repeated squaring turns the m
transcendentals into **3 exps + ~m multiplies** — on the TPU VPU, where
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

Overflow semantics: exp(s*x_i) values outside the dtype's range saturate
to inf / 0 exactly like the naive per-sample exp. A grid whose x values
cross zero is split (statically) at the sample nearest zero so that every
table factor's exponent grows one-signed outward from there — the inf*0
pairings that a single factorization exp(s*t0) * r^i produces at extreme
|s| (NaN where the naive form is merely saturated, or even finite) cannot
form. A sign-of-exponent repair backstops the one remaining corner (the
split point itself at |s*x| beyond the dtype range, where saturation IS
the true value).

Derivatives are exact-by-construction: d e/d s = x ⊙ e via a custom JVP
(one extra multiply per sample), rather than AD through the power
ladder. The JVP is linear in the tangent so reverse mode transposes it
automatically.
"""

from __future__ import annotations

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


def _oneside_eval(t0: float, dt: float, m: int):
    """exp(s*(t0 + dt*i)), i < m, via the lo ⊗ hi power-table outer
    product. Used on grids that do NOT cross zero (t0 ~ the grid point
    nearest zero, steps outward), where all table exponents share s's
    outward sign and inf*0 cannot pair up."""
    # split m = m_hi * m_lo with both table halves ~sqrt(m): the full
    # sequence is the outer product lo ⊗ hi, reshaped and truncated.
    k_lo = max(1, (m - 1).bit_length() // 2) if m > 1 else 0
    m_lo = 1 << k_lo
    m_hi = -(-m // m_lo)  # ceil
    k_hi = max((m_hi - 1).bit_length(), 0)

    def eval_side(s):
        if m <= 4:
            x = jnp.asarray(t0 + dt * np.arange(m), jnp.result_type(s))
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

    return eval_side


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
    crosses = bool(x_np[0] * x_np[-1] < 0)
    if not crosses:
        # Base the tables at the endpoint nearest zero and step outward:
        # all table exponents then share s's sign and saturate
        # monotonically. Basing at the far end would pair an
        # out-of-range base exp(s*t0) with opposite-direction powers
        # (inf*0 -> NaN where the naive exp is finite or cleanly 0/inf).
        if abs(float(x_np[0])) <= abs(float(x_np[-1])):
            core = _oneside_eval(t0, dt, m)
        else:
            rev = _oneside_eval(float(x_np[-1]), -dt, m)
            core = lambda s: rev(s)[::-1]
    else:
        # Split at the sample nearest zero: each side's exponents grow
        # one-signed outward, so its products saturate monotonically
        # (inf/0) instead of pairing inf with 0.
        i0 = int(np.argmin(np.abs(x_np)))
        i0 = max(1, min(m - 1, i0))
        left = _oneside_eval(float(x_np[i0 - 1]), -dt, i0)
        right = _oneside_eval(float(x_np[i0]), dt, m - i0)

        def core(s):
            e = jnp.concatenate([left(s)[::-1], right(s)])
            # Backstop for the split points at |s*x| beyond the dtype
            # range (there saturation is the true value): repair any NaN
            # with the exact exponent's sign.
            x = jnp.asarray(x_np, e.dtype)
            return jnp.where(
                jnp.isnan(e),
                jnp.where(s * x >= 0, jnp.inf, 0.0).astype(e.dtype),
                e,
            )

    @jax.custom_jvp
    def exp_grid(s):
        return core(s)

    @exp_grid.defjvp
    def _exp_grid_jvp(primals, tangents):
        (s,), (ds,) = primals, tangents
        e = exp_grid(s)
        x = jnp.asarray(x_np, e.dtype)
        return e, (x * e) * ds

    return exp_grid
