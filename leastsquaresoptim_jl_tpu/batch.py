"""Batched solves: vmap over thousands of independent fits.

The reference solves problems one ``optimize!`` call at a time; here a batch
of independent fits (e.g. NIST-style curve fits, the workload model of
reference test/nonlinearfitting.jl) shares one compiled kernel and saturates
the MXU. Per-problem convergence is handled by vmap's while_loop batching
rule: each problem's carry freezes once its own loop condition goes false,
so results match solving each problem alone.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .api import solve
from .optimizer.common import Options
from .problem import least_squares_problem


def solve_batch(
    f: Callable,
    x0_batch,
    data_batch=None,
    optimizer=None,
    *,
    options: Optional[Options] = None,
    output_length: Optional[int] = None,
    autodiff: str = "forward",
    materialize_jacobian: bool = True,
    lower=None,
    upper=None,
    data_axis: Optional[int] = 0,
    min_converged_fraction: Optional[float] = None,
    fused=None,
    stop_check_every: int = 1,
):
    """Solve a batch of independent fits sharing one residual function.

    ``f`` is either ``f(x) -> r`` (when ``data_batch`` is None) or
    ``f(x, data) -> r`` with ``data_batch`` a pytree whose leaves have a
    leading batch axis matching ``x0_batch.shape[0]``. Residual length must
    be batch-uniform (static shapes).

    ``data_axis=None`` marks ``data_batch`` as *shared* across the batch
    (vmap in_axes=None): the data is passed as a runtime argument instead of
    a closure constant, so large shared datasets are neither baked into the
    HLO nor recompiled per dataset. ``data_axis`` may also be a pytree of
    per-leaf axes (int or None) matching ``data_batch``'s structure —
    mixed sharing, e.g. ``data=(xgrid, Y), data_axis=(None, 0)`` for fits
    that share the sample grid but have per-fit observations. Sharing
    common leaves is a real throughput lever: a broadcast (B, m) copy of a
    shared grid is re-read from HBM on every model evaluation.

    ``min_converged_fraction`` (e.g. 0.99) switches to a fraction-stop
    batched loop: one outer ``lax.while_loop`` steps every fit in lockstep
    (finished fits frozen) and stops as soon as that fraction of the batch
    is done — under plain vmap the last straggler determines the wall-clock
    for the whole batch. "Done" = converged, non-finite, or at the
    iteration cap, so the loop always terminates. Throughput benchmarking
    (bench.py) and production bulk fitting should use this path.

    ``fused`` (default off; see api.solve for the measured rationale)
    selects the fused residual+Jacobian trial evaluation — one model
    evaluation per iteration instead of two. Opt in for expensive models.
    ``fused="ssr"`` (Cholesky) additionally replaces the carried (B, m)
    residual with a two-float SSR pair — the biggest carried leaf of the
    fraction-stop loop disappears (see api.solve).

    ``stop_check_every=k`` (fraction-stop loop only) evaluates the stop
    quorum every k lockstep iterations instead of every iteration. Fits
    still freeze at their OWN convergence iteration (the per-fit freeze
    mask updates every step); only the batch-level stop decision is
    k-granular, so not-yet-done stragglers may run up to k-1 extra
    (productive) iterations before the batch stops — the same contract
    as ops/kernel_varpro's launch granularity. Measured on-chip at the
    headline shape (B=2^17, m=64, VarPro gridded fused-ssr): k=1/2/4
    are at PARITY (1.52/1.50/1.52 ms/batch) — XLA folds the quorum
    reduction into the loop efficiently, so this knob only matters for
    exotic shapes/runtimes; it is kept because the k-granular contract
    is also a semantic choice (coarser stops cost stragglers nothing).

    Returns the raw result pytree with a leading batch axis on every leaf.
    Wrap the call in ``jax.jit`` for repeated use.
    """
    opts = options or Options()
    _validate_stop_check_every(stop_check_every)
    if opts.show_trace:
        raise ValueError(
            "show_trace (live printing) is not supported under batched "
            "solves; store_trace works — each problem gets its own "
            "fixed-size trace buffer in the result"
        )
    if optimizer is None and materialize_jacobian:
        # Batched default diverges from the single-solve default (QR,
        # reference src/types.jl:120): the normal-equations route with the
        # VPU-unrolled small-n solve is the cheapest batched path. QR is
        # also batched-safe at n <= 8 (unrolled MGS, solver/qr.py) and
        # worth choosing explicitly for ill-conditioned f32 fits — its
        # solve error grows ~cond, not the normal equations' cond^2.
        from .optimizer.base import Dogleg
        from .solver.base import Cholesky

        optimizer = Dogleg(Cholesky())
    x0_batch = jnp.asarray(x0_batch)
    if lower is not None or upper is not None:
        # Host-side start feasibility (reference: 'Initial guess must be
        # within bounds', levenberg_marquardt.jl:49-51) — an infeasible
        # start can otherwise be silently certified g_converged at an
        # infeasible point (the projected-gradient test treats x <= lower
        # as an active bound). Value checks need concrete arrays; traced
        # callers (solve_batch under an outer jit) skip them, same as the
        # other jittable paths.
        concrete = not any(
            isinstance(v, jax.core.Tracer)
            for v in (x0_batch, lower, upper)
            if v is not None
        )
        if concrete:
            from .api import _check_initial_bounds

            _check_initial_bounds(x0_batch, lower, upper)

    def problem_for(x0, data):
        residual = f if data is None else (lambda x: f(x, data))
        return least_squares_problem(
            f=residual,
            x=x0,
            output_length=output_length,
            autodiff=autodiff,
            materialize_jacobian=materialize_jacobian,
        )

    def single(x0, data):
        return solve(
            problem_for(x0, data), optimizer, options=opts,
            lower=lower, upper=upper, x0=x0, batched=True, fused=fused,
        )

    if min_converged_fraction is not None:
        return _solve_batch_fraction(
            problem_for, x0_batch, data_batch, data_axis, optimizer, opts,
            lower, upper, float(min_converged_fraction), fused,
            stop_check_every,
        )
    if stop_check_every != 1:
        raise ValueError(
            "stop_check_every applies to the fraction-stop loop only "
            "(pass min_converged_fraction)"
        )
    if data_batch is None:
        return jax.vmap(lambda x0: single(x0, None))(x0_batch)
    return jax.vmap(single, in_axes=(0, data_axis))(x0_batch, data_batch)


def _validate_stop_check_every(k):
    """Early validation (before any tracing): integral, >= 1, and capped —
    the k-unrolled while body inlines k copies of the full per-iteration
    HLO, so compile time/program size grow multiplicatively with k."""
    import numbers

    if not isinstance(k, numbers.Integral):
        raise ValueError(
            f"stop_check_every must be an integer >= 1; got {k!r}"
        )
    if k < 1:
        raise ValueError(f"stop_check_every must be >= 1; got {k}")
    if k > 64:
        raise ValueError(
            f"stop_check_every={k} would inline {k} copies of the loop "
            "body into one while iteration (multiplicative compile "
            "time/HLO size); the cap is 64 — measured parity at the "
            "batched-curve-fit shapes anyway (see docstring)"
        )


def _solve_batch_fraction(
    problem_for, x0_batch, data_batch, data_axis, optimizer, opts,
    lower, upper, frac, fused=None, stop_check_every=1,
):
    """Fraction-stop batched loop: vmapped single-iteration body inside one
    outer while_loop, stopping when >= frac of the batch is done."""
    from .optimizer import dogleg as _dogleg
    from .optimizer import levenberg_marquardt as _lm
    from .optimizer.base import Dogleg, LevenbergMarquardt, resolve

    if x0_batch.shape[0] == 0:
        raise ValueError(
            "solve_batch got an empty batch (x0_batch.shape[0] == 0)"
        )
    probe_x0 = x0_batch[0]
    if data_batch is None or data_axis is None:
        probe_data = data_batch
    elif isinstance(data_axis, int):
        probe_data = jax.tree_util.tree_map(
            lambda l: jnp.take(l, 0, axis=data_axis), data_batch
        )
    else:
        # Per-leaf axes with vmap-style PREFIX trees resolved: each axis
        # leaf applies to its whole data subtree, exactly as vmap's
        # in_axes does on the plain-vmap path (shared leaves, axis None,
        # pass through whole).
        axes_leaves, axes_def = jax.tree_util.tree_flatten(
            data_axis, is_leaf=lambda a: a is None
        )
        subtrees = axes_def.flatten_up_to(data_batch)
        taken = [
            sub
            if ax is None
            else jax.tree_util.tree_map(
                lambda l, _ax=ax: jnp.take(l, 0, axis=_ax), sub
            )
            for ax, sub in zip(axes_leaves, subtrees)
        ]
        probe_data = jax.tree_util.tree_unflatten(axes_def, taken)
    probe_problem = problem_for(probe_x0, probe_data)
    optimizer = resolve(optimizer, probe_problem)
    if isinstance(optimizer, LevenbergMarquardt):
        pieces_mod = _lm
    elif isinstance(optimizer, Dogleg):
        pieces_mod = _dogleg
    else:
        raise TypeError(f"unknown optimizer {optimizer!r}")
    if fused is None:
        fused = False  # same default as api.solve (measured; see there)

    extra = (
        dict(geodesic=optimizer.geodesic)
        if isinstance(optimizer, LevenbergMarquardt)
        else {}
    )

    def pieces(x0, data):
        return pieces_mod.loop_pieces(
            problem_for(x0, data), optimizer.solver, opts,
            lower, upper, x0, batched=True, fused=fused, **extra,
        )

    if data_batch is None:
        carry0 = jax.vmap(lambda x0: pieces(x0, None)[0])(x0_batch)
    else:
        carry0 = jax.vmap(
            lambda x0, d: pieces(x0, d)[0], in_axes=(0, data_axis)
        )(x0_batch, data_batch)

    def vmapped(idx):
        # idx: 1=cond_fn, 2=body_fn, 3=finalize applied elementwise
        if data_batch is None:
            fn = lambda ci, x0: pieces(x0, None)[idx](ci)
            axes = (0, 0)
            return lambda c: jax.vmap(fn, in_axes=axes)(c, x0_batch)
        fn = lambda ci, x0, d: pieces(x0, d)[idx](ci)
        axes = (0, 0, data_axis)
        return lambda c: jax.vmap(fn, in_axes=axes)(c, x0_batch, data_batch)

    elem_active = vmapped(1)   # per-element "still running"
    elem_step = vmapped(2)
    elem_final = vmapped(3)

    # Thread the per-element active mask through the outer carry so each
    # iteration evaluates it once (body) instead of twice (cond + body).
    # Integer-count comparison: an f32 mean of a >2^24-element mask rounds,
    # which can stop a frac=1.0 batch a few fits early (or late).
    import math

    B = x0_batch.shape[0]
    # The 1e-9 slack keeps an exact fraction exact: 0.07 * 100 rounds to
    # 7.000000000000001 in binary, and a bare ceil would demand an 8th
    # converged fit — one extra straggler that can hold the whole batch to
    # the iteration cap.
    # frac <= 0 keeps its degenerate meaning: nothing required, the loop
    # body never runs (need=0 makes cond() false immediately).
    need_count = int(math.ceil(frac * B - 1e-9))
    need = jnp.int32(min(B, max(1, need_count)) if frac > 0 else 0)
    check_every = int(stop_check_every)

    def count_done(active):
        return jnp.sum((~active).astype(jnp.int32))

    # The stop quorum is carried as a SCALAR computed inside the body (it
    # fuses into the body's kernel chain there); the cond computation is a
    # scalar compare. Computing the (B,)-wide reduction in cond instead
    # costs a separately-launched XLA computation per outer iteration
    # (~0.1-0.2 ms on this runtime regardless of size).
    def cond(state):
        _, _, ndone = state
        return ndone < need

    def one_step(c, active):
        new = elem_step(c)

        def freeze(old, new_leaf):
            mask = active.reshape(active.shape + (1,) * (new_leaf.ndim - 1))
            return jnp.where(mask, new_leaf, old)

        merged = jax.tree_util.tree_map(freeze, c, new)
        return merged, elem_active(merged)

    def body(state):
        c, active, _ = state
        # check_every > 1: unrolled lockstep steps between quorum checks.
        # The per-fit freeze mask still updates EVERY step, so individual
        # fits stop at their own convergence iteration regardless of k.
        for _ in range(check_every):
            c, active = one_step(c, active)
        return c, active, count_done(active)

    active0 = elem_active(carry0)
    out, _, _ = jax.lax.while_loop(
        cond, body, (carry0, active0, count_done(active0))
    )
    return elem_final(out)
