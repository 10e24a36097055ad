"""Shared optimizer machinery: convergence tests, options, trace-in-carry.

Exceptions cannot cross ``jit``, so the reference's control-flow idioms map
to carry state: non-finite iterates become a status code that halts the loop
(reference throws IsFiniteException, src/utils/utils.jl:63-78), and the trace
is a fixed-size preallocated array written by iteration index (reference
pushes to a vector, src/utils/utils.jl:86-131).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import config

# Status codes surfaced in the raw result.
STATUS_OK = 0
STATUS_NOT_FINITE = 1


@dataclasses.dataclass(frozen=True)
class Options:
    """Convergence and display options (reference: src/types.jl:195-205).

    Static under jit: changing an option recompiles (they are baked into the
    loop as constants, keeping every iteration branch-free and host-sync-free).
    ``radius`` is the initial trust-region radius Δ; None picks the
    optimizer-specific default (10.0 LM / 1.0 Dogleg, rescaled at iter 1).
    ``x_tol``/``f_tol``/``g_tol`` of None pick dtype-scaled defaults at loop
    entry (1e-8 in f64 for reference parity; noise-floor-scaled values in
    f32 — see config.default_tolerances).
    """

    x_tol: Optional[float] = None
    f_tol: Optional[float] = None
    g_tol: Optional[float] = None
    iterations: int = config.DEFAULT_ITERATIONS
    radius: Optional[float] = None
    store_trace: bool = False
    show_trace: bool = False
    show_every: int = 1

    @property
    def tracing(self) -> bool:
        return self.store_trace or self.show_trace


class ConvergenceFlags(NamedTuple):
    x_converged: jnp.ndarray
    f_converged: jnp.ndarray
    g_converged: jnp.ndarray
    converged: jnp.ndarray


def resolve_tolerances(opts: Options, dtype):
    """Concrete (x_tol, f_tol, g_tol): explicit options win, None falls back
    to the dtype-scaled defaults (config.default_tolerances)."""
    dx, df, dg = config.default_tolerances(dtype)
    return (
        dx if opts.x_tol is None else opts.x_tol,
        df if opts.f_tol is None else opts.f_tol,
        dg if opts.g_tol is None else opts.g_tol,
    )


def assess_convergence(
    dx, x, maxabs_gr, ssr, ared, x_tol, f_tol, g_tol, step_accepted
) -> ConvergenceFlags:
    """Priority-ordered convergence triple (reference: src/utils/utils.jl:7-31).

    ``ared`` is the actual objective reduction ssr - trial_ssr, computed
    cancellation-free by the callers as sum((f - ft)(f + ft)) — in f32 the
    subtraction of two O(ssr) sums would drown the signal in rounding noise
    long before the f-criterion could fire. The objective-change (f)
    criterion only fires on accepted steps: on a rejected step ared ≈ 0
    signals a poor local model, not convergence (reference :22). x- and
    g-criteria are fallbacks in that order.
    """
    f_conv = step_accepted & (jnp.abs(ared) <= f_tol * (jnp.abs(ssr) + f_tol))
    x_conv = (~f_conv) & (jnp.max(jnp.abs(dx)) <= x_tol)
    g_conv = (~f_conv) & (~x_conv) & (maxabs_gr <= g_tol)
    return ConvergenceFlags(x_conv, f_conv, g_conv, x_conv | f_conv | g_conv)


def validate_bounds(x0, lower, upper):
    """Eager (host-side) bound checks (reference: levenberg_marquardt.jl:49-51)."""
    n = x0.shape[0]
    if lower is not None:
        lower = jnp.broadcast_to(jnp.asarray(lower, x0.dtype), (n,))
    if upper is not None:
        upper = jnp.broadcast_to(jnp.asarray(upper, x0.dtype), (n,))
    return lower, upper


def init_trace(opts: Options, dtype):
    """Fixed-size trace buffer: rows of (iteration, ssr, maxabs_gr)."""
    if not opts.tracing:
        return jnp.zeros((0, 3), dtype=dtype)
    return jnp.full((opts.iterations + 1, 3), jnp.nan, dtype=dtype)


def update_trace(trace, opts: Options, it, ssr, maxabs_gr):
    """Write one trace row; optionally live-print via debug callback
    (reference: update!, src/utils/utils.jl:97-114)."""
    if not opts.tracing:
        return trace
    row = jnp.stack(
        [it.astype(trace.dtype), ssr.astype(trace.dtype),
         jnp.asarray(maxabs_gr, trace.dtype)]
    )
    trace = jax.lax.dynamic_update_slice(
        trace, row[None, :], (it, jnp.zeros((), it.dtype))
    )
    if opts.show_trace:
        def _print(i, v, g):
            if int(i) % opts.show_every == 0:
                print(f"{int(i):6d}   {float(v):14e}   {float(g):14e}")
        jax.debug.callback(_print, it, ssr, maxabs_gr)
    return trace
