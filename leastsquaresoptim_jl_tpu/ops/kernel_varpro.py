"""Pallas fused batched-LM kernel for p=1 separable (VarPro) curve fits.

The batched VarPro headline route (batch.py fraction-stop loop over the
reduced n=1 problem) measures 0.26 ms per lockstep iteration at
B=100k/m=64 — ~10x the single-HBM-pass floor of the (B, m) data — because
each iteration is a chain of separately-launched XLA ops (launch overhead
on this runtime is ~0.1-0.2 ms per unfused kernel; CLAUDE.md gotchas).
This module runs **K LM iterations per kernel launch** with everything
resident in VMEM: the per-fit observations block (bf, m) is read from HBM
once per launch, the whole trust-region iteration (basis eval, closed-form
coefficient solve, hand-derived exact VarPro Jacobian, gain ratio, radius
update, convergence triple) is fused elementwise VPU work, and the only
outputs are the (B, 8) per-fit state vector. The fraction-stop check runs
between launches, so the stop contract matches batch.py at K-iteration
granularity: fits freeze at their own convergence iteration exactly as in
the lockstep loop; only not-yet-converged stragglers may run up to K-1
extra (productive) iterations before the batch stops.

Semantics replicated from optimizer/levenberg_marquardt.py (reference
src/optimizer/levenberg_marquardt.jl:72-140) specialized to n=1:

  * damping: dtd = clamp(g, MIN_DIAGONAL*mean, MAX_DIAGONAL*mean) is the
    identity at n=1 (the mean of one element is itself), damp = g/delta;
  * step: (g + damp) dx = b;
  * cancellation-free reductions: ared = sum((r - rt)(r + rt)),
    pred = |2 dx b - dx^2 g|;
  * accept rho > MIN_STEP_QUALITY, Ceres radius growth / doubling
    decrease factor on rejection, non-finite-step poisoning
    (x <- x_trial when the step is non-finite, halting via the finite
    check), accepted-step-only f-criterion, then x-, then g-criterion.

The coefficient solve and residual use the SAME floored-projection
formulas as models/separable._coefficients_and_residual's p=1 path, and
the Jacobian is that residual's exact hand derivative — the kernel route
is numerically the same algorithm, not an approximation (equivalence
pinned by tests/test_kernel_varpro.py against the lax route).

The model enters as two elementwise closures ``phi(x, alpha) -> (m,)
basis column`` and ``dphi`` (its alpha-derivative), traced INTO the
kernel — any p=1 separable model whose basis is expressible as jnp
elementwise ops works (the CURVES p=1 entries: exp_saturation, power,
michaelis_menten, gaussian, logistic).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config

# State vector columns (per fit).
_ALPHA, _DELTA, _DEC, _C, _ITERS, _DONE, _CONV, _FLAGS = range(8)
_NS = 8


def _iteration(phi_fn, dphi_fn, x, y, state, tols, max_iters):
    """One LM iteration on a (bf, m) block; state (bf, _NS). Pure jnp —
    shared by the Pallas kernel body and the interpret/CPU fallback."""
    x_tol, f_tol, g_tol = tols
    dt = y.dtype
    eps = jnp.finfo(dt).eps
    tiny = jnp.finfo(dt).tiny

    alpha = state[:, _ALPHA:_ALPHA + 1]      # (bf, 1)
    delta = state[:, _DELTA:_DELTA + 1]
    dec = state[:, _DEC:_DEC + 1]
    done = state[:, _DONE:_DONE + 1]
    active = 1.0 - done

    def coeffs(a):
        """phi eval + p=1 floored projection: same arithmetic as
        models/separable._coefficients_and_residual's fast path."""
        P = phi_fn(x, a)                     # (bf, m)
        n2 = jnp.sum(P * P, axis=-1, keepdims=True)
        floor2 = (eps * n2 + tiny) * eps
        R = jnp.sqrt(n2 + floor2)
        q = P / R
        z = jnp.sum(q * y, axis=-1, keepdims=True)
        c = z / R
        r = y - z * q
        return P, n2, R, q, z, c, r

    P, n2, R, q, z, c, r = coeffs(alpha)
    ssr = jnp.sum(r * r, axis=-1, keepdims=True)

    # Exact VarPro Jacobian of the reduced residual (hand derivative of
    # the floored projection; the lax route gets the same expressions
    # from jacfwd through the identical formulas).
    dP = dphi_fn(x, alpha)                   # (bf, m)
    dn2 = 2.0 * jnp.sum(P * dP, axis=-1, keepdims=True)
    dR = dn2 * (1.0 + eps * eps) / (2.0 * R)
    dz = jnp.sum(dP * y, axis=-1, keepdims=True) / R - z * dR / R
    dc = dz / R - z * dR / (R * R)
    Jr = -(dc * P + c * dP)                  # (bf, m)

    g = jnp.sum(Jr * Jr, axis=-1, keepdims=True)   # J'J (1x1)
    b = jnp.sum(Jr * r, axis=-1, keepdims=True)    # J'r
    maxabs_gr = jnp.abs(b)

    damp = g / delta
    dx = b / (g + damp)
    alpha_t = alpha - dx

    _, _, _, _, _, c_t, r_t = coeffs(alpha_t)
    trial_ssr = jnp.sum(r_t * r_t, axis=-1, keepdims=True)
    ared = jnp.sum((r - r_t) * (r + r_t), axis=-1, keepdims=True)
    pred = jnp.abs(2.0 * dx * b - dx * dx * g)
    rho = jnp.where(pred > 0, ared / pred, jnp.zeros_like(pred))

    accepted = rho > config.MIN_STEP_QUALITY
    step_finite = jnp.isfinite(dx)

    # Priority-gated like optimizer/common.assess_convergence: the three
    # flags are mutually exclusive (f beats x beats g), so the per-fit
    # criterion reported matches the lax route's bit for bit.
    f_conv = accepted & (jnp.abs(ared) <= f_tol * (jnp.abs(ssr) + f_tol))
    x_conv = ~f_conv & (jnp.abs(dx) <= x_tol)
    g_conv = ~f_conv & ~x_conv & (maxabs_gr <= g_tol)
    conv = f_conv | x_conv | g_conv

    grow = jnp.minimum(
        delta / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
        config.MAX_TRUST_REGION_RADIUS,
    )
    shrink = jnp.maximum(delta / dec, config.MIN_TRUST_REGION_RADIUS)

    new_alpha = jnp.where(accepted | ~step_finite, alpha_t, alpha)
    new_delta = jnp.where(accepted, grow, shrink)
    new_dec = jnp.where(accepted, jnp.full_like(dec, 2.0), dec * 2.0)
    new_c = jnp.where(accepted, c_t, c)
    new_done = (
        conv | ~jnp.isfinite(new_alpha)
        | (state[:, _ITERS:_ITERS + 1] + 1.0 >= max_iters)
    ).astype(dt)
    flags = (
        f_conv.astype(dt) * 2.0 + x_conv.astype(dt) * 4.0
        + g_conv.astype(dt) * 8.0
    )

    def upd(col, new_val):
        return jnp.where(active > 0, new_val, state[:, col:col + 1])

    cols = [None] * _NS
    cols[_ALPHA] = upd(_ALPHA, new_alpha)
    cols[_DELTA] = upd(_DELTA, new_delta)
    cols[_DEC] = upd(_DEC, new_dec)
    cols[_C] = upd(_C, new_c)
    cols[_ITERS] = upd(_ITERS, state[:, _ITERS:_ITERS + 1] + 1.0)
    cols[_DONE] = upd(_DONE, jnp.maximum(done, new_done))
    cols[_CONV] = upd(_CONV, conv.astype(dt))
    cols[_FLAGS] = upd(_FLAGS, flags)
    return jnp.concatenate(cols, axis=-1)


def _make_kernel(phi_fn, dphi_fn, k_iters, tols, max_iters, m, dtype):
    def kernel(x_ref, y_ref, state_ref, out_ref):
        x = x_ref[0:1, :]                    # (1, m), broadcasts over fits
        y = y_ref[:, :]
        state0 = state_ref[:, :]

        def body(_, st):
            return _iteration(
                phi_fn, dphi_fn, x, y, st, tols, max_iters
            )

        out_ref[:, :] = jax.lax.fori_loop(0, k_iters, body, state0)

    return kernel


def varpro_lm_p1_kernel_solve(
    phi_fn: Callable,
    dphi_fn: Callable,
    x_grid,
    Y,
    alpha0,
    *,
    x_tol: float,
    f_tol: float,
    g_tol: float,
    iterations: int = 50,
    min_converged_fraction: float = 0.99,
    k_iters: int = 8,
    block_fits: int = 2048,
    radius: float = None,
    interpret: bool = False,
):
    """Solve B independent p=1-separable curve fits with the fused
    Pallas LM kernel. ``phi_fn(x, alpha)``/``dphi_fn`` take a (1, m) grid
    row and a (bf, 1) alpha column and return (bf, m) elementwise.

    Returns a dict: ``alpha`` (B,), ``coefficient`` (B,) (the optimal
    linear coefficient at the final alpha), ``converged``,
    ``x/f/g_converged``, ``iterations``, and ``done``. The driver runs
    ceil-fraction launches of ``k_iters`` LM iterations until
    ``min_converged_fraction`` of the batch is done (converged,
    non-finite, or at the iteration cap) — the batch.py stop contract at
    k-iteration granularity."""
    B, m = Y.shape
    dt = Y.dtype
    if B % block_fits != 0:
        # pad the batch to a block multiple with copies of fit 0; the
        # pad rows converge like real fits and are dropped on return.
        pad = block_fits - B % block_fits
        Y = jnp.concatenate([Y, jnp.broadcast_to(Y[:1], (pad, m))], axis=0)
        alpha0 = jnp.concatenate(
            [alpha0, jnp.broadcast_to(alpha0[:1], (pad,))], axis=0
        )
    Bp = Y.shape[0]
    radius0 = config.DEFAULT_RADIUS_LM if radius is None else radius

    state = jnp.zeros((Bp, _NS), dt)
    state = state.at[:, _ALPHA].set(alpha0.astype(dt))
    state = state.at[:, _DELTA].set(radius0)
    state = state.at[:, _DEC].set(2.0)

    xg = jnp.asarray(x_grid, dt).reshape(1, m)
    # Static python floats: traced/jnp closure constants are rejected by
    # pallas_call ("captures constants"); tolerances are config, not data.
    tols = (float(x_tol), float(f_tol), float(g_tol))
    kernel = _make_kernel(
        phi_fn, dphi_fn, k_iters, tols, float(iterations), m, dt
    )
    grid = (Bp // block_fits,)
    call = partial(
        pl.pallas_call,
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, _NS), dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_fits, m), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_fits, _NS), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_fits, _NS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )

    import math

    # Count done over the TRUE batch only: pad rows are copies of fit 0,
    # so including them would weight fit 0 up to block_fits times and
    # shift the stop point vs batch.py's contract when B % block_fits != 0.
    need_count = int(math.ceil(min_converged_fraction * B - 1e-9))
    # frac <= 0 short-circuits like batch.py: need = 0 makes cond false
    # immediately and the initial state is returned untouched.
    need = jnp.int32(
        min(B, max(1, need_count)) if min_converged_fraction > 0 else 0
    )
    max_launches = -(-int(iterations) // k_iters)

    def cond(carry):
        st, launches = carry
        ndone = jnp.sum(st[:B, _DONE].astype(jnp.int32))
        return (ndone < need) & (launches < max_launches)

    def body(carry):
        st, launches = carry
        return call()(xg, Y, st), launches + 1

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))

    st = state[:B]
    flags = st[:, _FLAGS].astype(jnp.int32)
    return dict(
        alpha=st[:, _ALPHA],
        coefficient=st[:, _C],
        converged=st[:, _CONV] > 0,
        f_converged=(flags & 2) > 0,
        x_converged=(flags & 4) > 0,
        g_converged=(flags & 8) > 0,
        iterations=st[:, _ITERS].astype(jnp.int32),
        done=st[:, _DONE] > 0,
    )
