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
    """Broadcast bounds to x0's shape/dtype (shape errors surface here).

    This does NOT check start feasibility — that is a host-side value
    check (``api._check_initial_bounds``, the counterpart of the
    reference's eager 'Initial guess must be within bounds',
    levenberg_marquardt.jl:49-51) which the jittable paths can only run
    on concrete inputs."""
    n = x0.shape[0]
    if lower is not None:
        lower = jnp.broadcast_to(jnp.asarray(lower, x0.dtype), (n,))
    if upper is not None:
        upper = jnp.broadcast_to(jnp.asarray(upper, x0.dtype), (n,))
    return lower, upper


def active_set_refinement(dx, x, lower, upper, dtd, dt, damp_free,
                          solve_shifted, combine):
    """Shared bounded-step refinement for both optimizer loops.

    Improvement over the reference, whose pure step clipping stalls on
    *coupled* problems: the clipped step keeps free components computed
    under the assumption that the clipped ones moved the full distance.
    Pin the binding coordinates at their clipped values, shift the
    residual by that partial move, and re-solve the damped system for the
    free components (binding coordinates frozen by a huge damping entry).
    The free components then solve the correct active-set subspace
    problem, so the projected-gradient KKT test can actually reach g_tol
    on coupled problems.

    ``damp_free`` is the damping on non-binding coordinates (LM: its
    regular damp vector; dogleg: a scale-relative epsilon that keeps the
    system full-rank without a column-masked singular factorization).
    ``solve_shifted(dx_a, damp2) -> (dx2, n_mul)`` solves the shifted
    system; ``combine(dx_a, free)`` merges pinned + free parts (dogleg
    rescales the free part into the remaining trust radius first).
    Returns ``(dx_refined, extra_mul_calls)`` via ``lax.cond``.
    """
    from ..ops.linalg import clip_step_to_bounds

    dx_clipped = clip_step_to_bounds(dx, x, lower, upper)
    binds = jnp.abs(dx_clipped - dx) > 0

    def resolve():
        dx_a = jnp.where(binds, dx_clipped, jnp.zeros_like(dx))
        # Freeze factor: large enough that the active columns' coupling
        # into the free solve is ~1e-10 relative, small enough that
        # sqrt(freeze) in the stacked-QR damped form stays finite in f32
        # (MAX_DIAGONAL * mean overflows there).
        freeze = jnp.minimum(
            1e10 * (jnp.mean(dtd) + 1.0),
            jnp.asarray(jnp.finfo(dt).max, dt) / 16,
        )
        damp2 = jnp.where(binds, jnp.asarray(freeze, dt), damp_free)
        dx2, n_mul = solve_shifted(dx_a, damp2)
        free = jnp.where(binds, jnp.zeros_like(dx), dx2)
        return combine(dx_a, free), n_mul + 1  # + the shift matvec

    return jax.lax.cond(
        jnp.any(binds), resolve, lambda: (dx_clipped, jnp.int32(0))
    )


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


class EvalSchedule(NamedTuple):
    """Evaluation-schedule flags + fused evaluators shared by the LM and
    Dogleg loop setups (previously duplicated near-verbatim in both files,
    where a fix to one could silently miss the other).

    ``fused_gram``: Cholesky consumes J only through (J'J, J'r) — the
    fused schedule carries those Gram products instead of J.
    ``fused_flat``: other solvers carry J flattened to (m*n,).
    ``drop_jstate``: batched dense mode recomputes J each iteration
    (recompute == reuse in vmap lockstep) and carries the (n,)
    linearization point instead of the (m, n) J.
    ``drop_fcur``: batched dense mode also drops the (m,) residual from
    the carry — ONLY when res_jac_fn shares one primal evaluation between
    r and J (forward-mode linearize; problem.res_jac_shares_primal): for
    a user Jacobian or reverse mode, res_jac_fn is two independent
    evaluations and recomputing the residual every iteration would cost a
    third model evaluation instead of being free.
    ``ssr_carry`` (``fused="ssr"``): the fused-Gram schedule additionally
    drops the residual from the carry by carrying the SSR as a two-float
    (hi, lo) pair (ops/linalg.sumabs2_dd). The actual-reduction test
    ``ared = ssr - trial_ssr`` is then a dd difference — accurate to
    ~eps^2 * ssr, far below the f-criterion scale f_tol * ssr — instead
    of the cancellation-free elementwise form that needs the previous
    residual vector. On batched fits this removes the largest carried
    leaf entirely: per lockstep iteration the (B, m) residual was written,
    re-read, and freeze-merged through HBM purely to feed ``ared``.
    Trajectories match the plain fused schedule to rounding (the ared
    values agree to ~eps relative), but not bitwise — accept/stop
    decisions can differ on exact-threshold ties.
    """

    res_jac_fn: Optional[object]
    res_gram_fn: Optional[object]
    fused_gram: bool
    fused_flat: bool
    drop_jstate: bool
    drop_fcur: bool
    ssr_carry: bool = False


def build_eval_schedule(problem, solver_tag, fused, batched: bool) -> EvalSchedule:
    from ..ops.gram import gram_and_rhs
    from ..solver.base import Cholesky

    materialize = problem.materialize_jacobian
    ssr_carry = fused == "ssr"
    if isinstance(fused, str) and not ssr_carry:
        raise ValueError(
            f"unknown fused mode {fused!r}; expected False, True, or 'ssr'"
        )
    if fused and (
        not materialize
        or problem.jacobian_is_sparse
        or problem.res_jac_fn is None
    ):
        raise ValueError(
            "fused evaluation requires a dense materialized Jacobian with "
            "a res_jac_fn (least_squares_problem builds one automatically)"
        )
    res_jac_fn = problem.res_jac_fn
    fused_gram = bool(fused) and isinstance(solver_tag, Cholesky)
    fused_flat = bool(fused) and not fused_gram
    if ssr_carry and not fused_gram:
        raise ValueError(
            "fused='ssr' (the dd-SSR carry) applies to the fused-Gram "
            "schedule only — use the Cholesky solver"
        )

    if fused_gram:
        def res_gram_fn(xx):
            r, J = res_jac_fn(xx)
            G, b = gram_and_rhs(J, r)
            return r, G, b
    else:
        res_gram_fn = None

    drop_jstate = (
        batched and materialize and not problem.jacobian_is_sparse
        and not fused
    )
    drop_fcur = (
        drop_jstate
        and res_jac_fn is not None
        and getattr(problem, "res_jac_shares_primal", False)
    )
    return EvalSchedule(
        res_jac_fn, res_gram_fn, fused_gram, fused_flat,
        drop_jstate, drop_fcur, ssr_carry,
    )


def seed_eval(sched: EvalSchedule, problem, x):
    """Initial model evaluation + Jacobian-carry seed for the loop carry.

    Returns ``(fcur, gram0, grhs0, jstate0, jac_seeded)`` — gram0/grhs0
    are None unless ``fused_gram``; ``jac_seeded`` is True when jstate0 is
    a real Jacobian evaluation at x (sparse BCOO carry: a zeros
    placeholder has no pattern, and since the seed IS the Jacobian at x0
    the first iteration reuses it instead of recomputing).
    """
    m, n = problem.m, problem.n
    gram0 = grhs0 = None
    if sched.fused_gram:
        fcur, gram0, grhs0 = sched.res_gram_fn(x)
        jstate0 = x  # linearization point (finalize only)
    elif sched.fused_flat:
        fcur, jfull0 = sched.res_jac_fn(x)
        jstate0 = jnp.reshape(jfull0, (m * n,))
    else:
        fcur = problem.residual_fn(x)
        jstate0 = None
    jac_seeded = False
    if jstate0 is None:
        if not problem.materialize_jacobian or sched.drop_jstate:
            jstate0 = x
        elif problem.jacobian_is_sparse:
            jstate0 = problem.jac_fn(x)
            jac_seeded = True
        else:
            jstate0 = jnp.zeros((m, n), x.dtype)
    return fcur, gram0, grhs0, jstate0, jac_seeded
