"""Powell dogleg trust-region optimizer as a single lax.while_loop.

TPU-native counterpart of reference: src/optimizer/dogleg.jl:41-203. The
expensive sub-block (Jacobian, gradient, Cauchy length, Gauss-Newton solve)
runs under a ``lax.cond`` keyed on the reference's ``reuse`` flag (:59,81):
after a rejected step only the cheap dogleg combination and trial evaluation
re-run, exactly matching the reference's two-cost-branch loop body.

Geometry is measured in the D-metric ``wnorm(v, dtd)`` with the absolute
clamp dtd ∈ [1e-6, 1e32] (reference :85-90) and the first-iteration radius
rescale Δ *= wnorm(x, dtd) (reference :92-97).

Box bounds extend the reference's step clipping (:148-157) with an
active-set refinement (same scheme as LM, see
optimizer/levenberg_marquardt.py): when clipping binds, the binding
coordinates are pinned at their clipped values and the Gauss-Newton system
is re-solved on the column-masked operator, so the projected-gradient KKT
test certifies convergence on coupled bounded problems where pure clipping
stalls.

Fused evaluation schedules (``fused=True``): one model evaluation per
iteration at the trial point; with the Cholesky solver the carry holds the
Gram products (G = J'J, b = J'r) and J never reaches HBM — every quantity
the dogleg geometry needs is algebraic in them (dtd = diag(G), gradient
= b, Cauchy denominator ||J dgr||^2 = dgr'G dgr, Gauss-Newton step from
G dx = b). See the LM module docstring for the TPU layout rationale.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import config
from ..ops import operators
from ..ops.linalg import (
    clip_step_to_bounds,
    dd_diff,
    maxabs_projected_gradient,
    sumabs2,
    sumabs2_dd,
    wdot,
    wnorm,
)
from ..problem import LeastSquaresProblem
from ..solver import solver_fns
from ..solver.cholesky import solve_spd_system
from .common import (
    active_set_refinement,
    build_eval_schedule,
    seed_eval,
    STATUS_NOT_FINITE,
    STATUS_OK,
    Options,
    assess_convergence,
    init_trace,
    resolve_tolerances,
    update_trace,
)
from .levenberg_marquardt import _gmatvec


def loop_pieces(
    problem: LeastSquaresProblem,
    solver_tag,
    opts: Options,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    batched: bool = False,
    fused: bool = False,
):
    """The dogleg loop as ``(carry0, cond_fn, body_fn, finalize)``.

    With ``batched=True`` the expensive/reuse ``lax.cond`` (reference :81)
    becomes an unconditional evaluation of the expensive block: under vmap
    the cond lowers to a select that runs *both* branches anyway, and on a
    rejected step x/fcur are unchanged so recomputation reproduces the
    reused values exactly — same semantics, one branch instead of two. Work
    counters keep the reference accounting (only fresh blocks counted).

    ``fused=True``: one fused model evaluation per iteration at the trial
    point (see module docstring and the LM loop for the per-solver carry
    layouts).
    """
    residual_fn = problem.residual_fn
    jac_fn = problem.jac_fn
    materialize = problem.materialize_jacobian
    m, n = problem.m, problem.n
    solve_gn, solve_damped = solver_fns(solver_tag)

    # Evaluation schedule (fused validation, Gram-carry/flat-J/drop flags)
    # shared with the LM loop — see common.EvalSchedule for semantics.
    sched = build_eval_schedule(problem, solver_tag, fused, batched)
    res_jac_fn, res_gram_fn = sched.res_jac_fn, sched.res_gram_fn
    fused_gram, fused_flat = sched.fused_gram, sched.fused_flat
    drop_jstate, drop_fcur = sched.drop_jstate, sched.drop_fcur
    # fused="ssr": dd-SSR carry replaces the residual carry (see
    # EvalSchedule.ssr_carry and the LM loop for the accuracy argument).
    ssr_carry = sched.ssr_carry

    x = jnp.asarray(problem.x0 if x0 is None else x0)
    dt = x.dtype
    x_tol, f_tol, g_tol = resolve_tolerances(opts, dt)
    radius0 = (
        opts.radius if opts.radius is not None else config.DEFAULT_RADIUS_DOGLEG
    )

    fcur, gram0, grhs0, jstate0, _jac_seeded = seed_eval(sched, problem, x)
    if ssr_carry:
        ssr, ssr_lo0 = sumabs2_dd(fcur)
    else:
        ssr = sumabs2(fcur)
    false = jnp.zeros((), bool)
    zero_x = jnp.zeros((n,), dt)

    trace = init_trace(opts, dt)
    trace = update_trace(trace, opts, jnp.int32(0), ssr, jnp.asarray(jnp.inf, dt))

    carry = dict(
        x=x,
        ssr=ssr,
        delta=jnp.asarray(radius0, dt),
        reuse=false,
        jstate=jstate0,
        dtd=jnp.ones((n,), dt),
        dgr=zero_x,
        dgn=zero_x,
        alpha=jnp.zeros((), dt),
        wnorm_dgn=jnp.zeros((), dt),
        wnorm_dgr=jnp.zeros((), dt),
        maxabs_gr=jnp.asarray(jnp.inf, dt),
        it=jnp.int32(0),
        x_converged=false,
        f_converged=false,
        g_converged=false,
        converged=false,
        f_calls=jnp.int32(1),
        g_calls=jnp.int32(0),
        mul_calls=jnp.int32(0),
        # Stop reason of the most recent inner Gauss-Newton solve (LSMR
        # istop, -1 for direct solvers); surfaced as ``inner_istop``.
        inner_istop=jnp.int32(-1),
        trace=trace,
    )
    if not drop_fcur and not ssr_carry:
        carry["fcur"] = fcur
    if ssr_carry:
        carry["ssr_lo"] = ssr_lo0
    if fused_gram:
        carry["gram"] = gram0
        carry["grhs"] = grhs0

    def cond_fn(c):
        return (
            (~c["converged"])
            & (c["it"] < opts.iterations)
            & jnp.all(jnp.isfinite(c["x"]))
        )

    def body_fn(c):
        it = c["it"] + 1
        x, ssr = c["x"], c["ssr"]
        fcur = None if (drop_fcur or ssr_carry) else c["fcur"]

        # Linearization point reuse across rejected steps (reference :81).
        if fused_gram:
            G, b = c["gram"], c["grhs"]
            jstate = c["jstate"]
            op = None
        elif fused_flat:
            jstate = c["jstate"]
            op = operators.from_matrix(jnp.reshape(jstate, (m, n)))
        elif drop_fcur:
            # batched: recompute == reuse; the linearize primal IS the
            # residual at x — no carried fcur.
            fcur, J = res_jac_fn(x)
            jstate = x
            op = operators.from_matrix(J)
        elif materialize and batched:
            # batched: x unchanged on rejection => recompute == reuse
            J = jac_fn(x)
            jstate = x if drop_jstate else J
            op = operators.from_matrix(J)
        elif materialize:
            keep = c["reuse"]
            if problem.jacobian_is_sparse:
                # The sparse carry was seeded with jac_fn(x0); iteration 1
                # reuses that instead of recomputing it.
                keep = keep | (it == 1)
            jstate = jax.lax.cond(
                keep, lambda: c["jstate"], lambda: jac_fn(x)
            )
            op = operators.from_matrix(jstate)
        elif batched:
            jstate = x
            op = operators.for_problem(problem, jstate)
        else:
            jstate = jnp.where(c["reuse"], c["jstate"], x)
            op = operators.for_problem(problem, jstate)

        def expensive():
            # Reference :85-117: dtd, first-iter Δ rescale, gradient + KKT,
            # scaled steepest descent, Cauchy length, Gauss-Newton step.
            # In Gram space: colnorms = diag(G), J'f = b, ||J v||^2 =
            # v'G v, and the GN system is G dgn = b directly.
            raw_dtd = (
                jnp.diagonal(G, axis1=-2, axis2=-1)
                if fused_gram
                else op.colnorms2()
            )
            dtd = jnp.clip(raw_dtd, config.MIN_DIAGONAL, config.MAX_DIAGONAL)
            wnorm_x = wnorm(x, dtd)
            delta = jnp.where(
                (it == 1) & (wnorm_x > 0), c["delta"] * wnorm_x, c["delta"]
            )
            g = b if fused_gram else op.rmatvec(fcur)
            maxabs_gr = maxabs_projected_gradient(g, x, lower, upper)
            dgr = g / dtd  # steepest descent in the D-metric (reference :105)
            wnorm_dgr = wnorm(dgr, dtd)
            jdgr_sq = (
                jnp.sum(dgr * _gmatvec(G, dgr))
                if fused_gram
                else sumabs2(op.matvec(dgr))
            )
            alpha = wnorm_dgr**2 / jdgr_sq  # Cauchy length (:109-111)
            if fused_gram:
                dgn = solve_spd_system(G, b)
                ls_iter = jnp.int32(1)
                istop_gn = jnp.int32(-1)
            else:
                dgn, ls_iter, istop_gn = solve_gn(op, fcur)
            wnorm_dgn = wnorm(dgn, dtd)
            mul_inc = jnp.int32(2) + ls_iter
            return (
                dtd, delta, dgr, dgn, alpha, wnorm_dgn, wnorm_dgr,
                maxabs_gr, jnp.int32(1), mul_inc, istop_gn,
            )

        def reused():
            return (
                c["dtd"], c["delta"], c["dgr"], c["dgn"], c["alpha"],
                c["wnorm_dgn"], c["wnorm_dgr"], c["maxabs_gr"],
                jnp.int32(0), jnp.int32(0), c["inner_istop"],
            )

        if batched or fused:
            # Unconditional expensive block (recompute == reuse in lockstep
            # — and in the fused schedules the block works from carried
            # G/b or J with no model evaluations, so there is nothing
            # costly left to guard); counters still follow the reference's
            # reuse accounting.
            (
                dtd, delta, dgr, dgn, alpha, wnorm_dgn, wnorm_dgr,
                maxabs_gr, g_inc, mul_inc, inner_istop,
            ) = expensive()
            g_inc = jnp.where(c["reuse"], 0, g_inc)
            mul_inc = jnp.where(c["reuse"], 0, mul_inc)
        else:
            (
                dtd, delta, dgr, dgn, alpha, wnorm_dgn, wnorm_dgr,
                maxabs_gr, g_inc, mul_inc, inner_istop,
            ) = jax.lax.cond(c["reuse"], reused, expensive)
        g_calls = c["g_calls"] + g_inc
        mul_calls = c["mul_calls"] + mul_inc

        # Classic 3-case dogleg combination in the D-metric (reference :120-145).
        case_gn = wnorm_dgn <= delta
        case_cauchy = wnorm_dgr * alpha >= delta

        b_dot_a = alpha * wdot(dgr, dgn, dtd)
        a_sq = (alpha * wnorm_dgr) ** 2
        b_minus_a_sq = a_sq - 2.0 * b_dot_a + wnorm_dgn**2
        cc = b_dot_a - a_sq
        disc = cc**2 + b_minus_a_sq * (delta**2 - a_sq)
        dd = jnp.sqrt(jnp.maximum(disc, 0.0))
        safe = lambda num, den: num / jnp.where(den == 0, jnp.ones((), dt), den)
        beta = jnp.where(
            cc <= 0, safe(dd - cc, b_minus_a_sq), safe(delta**2 - a_sq, dd + cc)
        )
        dx_interp = beta * dgn + alpha * (1.0 - beta) * dgr
        dx_cauchy = dgr * safe(delta, wnorm_dgr)

        dx = jnp.where(
            case_gn, dgn, jnp.where(case_cauchy, dx_cauchy, dx_interp)
        )
        wnorm_dx = jnp.where(
            case_gn,
            wnorm_dgn,
            jnp.where(case_cauchy, delta, wnorm(dx_interp, dtd)),
        )

        # Box clip (reference :148-157), trial point, gain ratio (:159-177).
        if lower is not None or upper is not None:
            # Active-set refinement (shared scheme:
            # common.active_set_refinement). Dogleg's free coordinates get
            # a scale-relative epsilon damping — full-rank without a
            # column-masked (singular-by-construction) factorization — and
            # the free part is rescaled into the trust region.
            def solve_shifted(dx_a, damp2):
                if fused_gram:
                    # J'(f - J dx_a) = b - G dx_a (Gram space)
                    return (
                        solve_spd_system(G, b - _gmatvec(G, dx_a), damp2),
                        jnp.int32(1),
                    )
                dgn2, it2, _ = solve_damped(op, fcur - op.matvec(dx_a), damp2)
                return dgn2, it2

            def combine(dx_a, free):
                # Scale the free part against the *remaining* radius after
                # the pinned part: scaling by delta/wnorm(dx_a + free) would
                # leave the combined step up to ~2*delta (the pinned dx_a is
                # not scaled). Triangle inequality then guarantees
                # wnorm(dx_a + scale*free) <= wnorm(dx_a) + remaining <= delta
                # whenever dx_a itself fits in the trust region.
                remaining = jnp.maximum(delta - wnorm(dx_a, dtd), 0.0)
                scale = jnp.minimum(
                    jnp.ones((), dt),
                    remaining / jnp.maximum(wnorm(free, dtd), 1e-30),
                )
                return clip_step_to_bounds(
                    dx_a + scale * free, x, lower, upper
                )

            dx, extra_mul = active_set_refinement(
                dx, x, lower, upper, dtd, dt, jnp.finfo(dt).eps * dtd,
                solve_shifted, combine,
            )
            mul_calls = mul_calls + extra_mul
        # Cancellation-free reductions (see levenberg_marquardt.py): the
        # naive ssr - trial_ssr loses all significant digits in f32 once the
        # per-step reduction drops below eps * ssr.
        x_trial = x - dx
        if fused_gram:
            # ONE fused model evaluation per iteration (see LM loop).
            ftrial, gtrial, btrial = res_gram_fn(x_trial)
        elif fused:
            ftrial, jtrial = res_jac_fn(x_trial)
        else:
            ftrial = residual_fn(x_trial)
        f_calls = c["f_calls"] + 1
        if ssr_carry:
            trial_ssr, trial_lo = sumabs2_dd(ftrial)
            ared = dd_diff(ssr, c["ssr_lo"], trial_ssr, trial_lo)
        else:
            trial_ssr = sumabs2(ftrial)
            ared = jnp.sum((fcur - ftrial) * (fcur + ftrial))
        if fused_gram:
            # sum(Jdx (2f - Jdx)) = 2 dx.b - dx'G dx (Gram form; b = J'f
            # at the current linearization point)
            predicted_reduction = jnp.abs(
                2.0 * jnp.sum(dx * b) - jnp.sum(dx * _gmatvec(G, dx))
            )
        else:
            jdx = op.matvec(dx)
            predicted_reduction = jnp.abs(jnp.sum(jdx * (2.0 * fcur - jdx)))
        mul_calls = mul_calls + 1
        rho = jnp.where(
            predicted_reduction > 0,
            ared / predicted_reduction,
            jnp.zeros((), dt),
        )

        accepted = rho >= config.MIN_STEP_QUALITY
        flags = assess_convergence(
            dx, x_trial, maxabs_gr, ssr, ared,
            x_tol, f_tol, g_tol, accepted,
        )

        # Trust-region update (reference :193-197) applies on accept or reject.
        delta = jnp.where(
            rho < config.DECREASE_THRESHOLD,
            jnp.maximum(config.MIN_TRUST_REGION_RADIUS, delta * 0.5),
            jnp.where(
                rho > config.INCREASE_THRESHOLD,
                jnp.maximum(delta, 3.0 * wnorm_dx),
                delta,
            ),
        )

        # A non-finite step poisons x in the reference (dogleg.jl:160,190);
        # reproduce that so the loop halts and surfaces STATUS_NOT_FINITE.
        step_finite = jnp.all(jnp.isfinite(dx))
        if fused_gram:
            new_jstate = jnp.where(accepted, x_trial, jstate)
        elif fused_flat:
            new_jstate = jnp.where(
                accepted, jnp.reshape(jtrial, (m * n,)), jstate
            )
        else:
            new_jstate = jstate
        new = dict(
            x=jnp.where(accepted | ~step_finite, x_trial, x),
            ssr=jnp.where(accepted, trial_ssr, ssr),
            delta=delta,
            reuse=~accepted,
            jstate=new_jstate,
            dtd=dtd,
            dgr=dgr,
            dgn=dgn,
            alpha=alpha,
            wnorm_dgn=wnorm_dgn,
            wnorm_dgr=wnorm_dgr,
            maxabs_gr=maxabs_gr,
            it=it,
            x_converged=flags.x_converged,
            f_converged=flags.f_converged,
            g_converged=flags.g_converged,
            converged=flags.converged,
            f_calls=f_calls,
            g_calls=g_calls,
            mul_calls=mul_calls,
            inner_istop=inner_istop,
            trace=c["trace"],
        )
        if not drop_fcur and not ssr_carry:
            new["fcur"] = jnp.where(accepted, ftrial, fcur)
        if ssr_carry:
            new["ssr_lo"] = jnp.where(accepted, trial_lo, c["ssr_lo"])
        if fused_gram:
            new["gram"] = jnp.where(accepted, gtrial, G)
            new["grhs"] = jnp.where(accepted, btrial, b)
        new["trace"] = update_trace(c["trace"], opts, it, new["ssr"], maxabs_gr)
        return new

    def finalize(out):
        status = jnp.where(
            jnp.all(jnp.isfinite(out["x"])), STATUS_OK, STATUS_NOT_FINITE
        )
        if drop_jstate or fused_gram:
            out = dict(out, jstate=jac_fn(out["jstate"]))
        elif fused_flat:
            out = dict(out, jstate=jnp.reshape(out["jstate"], (m, n)))
        return dict(
            minimizer=out["x"],
            ssr=out["ssr"],
            iterations=out["it"],
            x_converged=out["x_converged"],
            f_converged=out["f_converged"],
            g_converged=out["g_converged"],
            converged=out["converged"],
            f_calls=out["f_calls"],
            g_calls=out["g_calls"],
            mul_calls=out["mul_calls"],
            inner_istop=out["inner_istop"],
            maxabs_gr=out["maxabs_gr"],
            trace=out["trace"],
            status=status,
            jacobian=out["jstate"] if materialize else None,
        )

    return carry, cond_fn, body_fn, finalize


def optimize_loop(
    problem: LeastSquaresProblem,
    solver_tag,
    opts: Options,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    batched: bool = False,
    fused: bool = False,
):
    """Run dogleg from ``x0``; returns the same raw result pytree as LM."""
    carry, cond_fn, body_fn, finalize = loop_pieces(
        problem, solver_tag, opts, lower, upper, x0, batched, fused
    )
    return finalize(jax.lax.while_loop(cond_fn, body_fn, carry))
