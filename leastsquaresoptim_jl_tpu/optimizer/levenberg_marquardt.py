"""Levenberg-Marquardt trust-region optimizer as a single lax.while_loop.

TPU-native counterpart of reference: src/optimizer/levenberg_marquardt.jl:39-144.
The entire outer loop — damping, inner solve, box clipping, gain ratio,
Ceres-style radius update, convergence triple, work counters, trace — runs
on-device with no host sync per iteration. The reference's
``need_jacobian`` reuse flag (:62,77-81,132) becomes a ``lax.cond`` over the
Jacobian evaluation (materialized mode) or a select of the linearization
point (matrix-free mode).

Fused evaluation schedules (``fused=True``; the batched-throughput change
of round 3): the residual and the Jacobian information are evaluated
*together at the trial point* — one shared primal via problem.res_jac_fn —
so each iteration runs ONE model evaluation instead of two (jac at x +
residual at trial). What rides the carry depends on the solver:

  * Cholesky ("fused-gram"): the carry holds the Gram products
    ``G = J'J`` (n, n) and ``b = J'r`` (n,) — J itself is a fused
    intermediate that NEVER reaches HBM. This matters on TPU: a carried
    (B, m, n) Jacobian with tiny n pads its minor dimension to 128 lanes
    (a (B, 64, 2) f32 carry occupies 64x its logical bytes; measured
    0.75x *slowdown* on the headline bench), while G/b are n^2+n floats.
    Every quantity the loop needs is algebraic in (G, b): damping diagonal
    = diag(G), gradient J'f = b, predicted reduction
    sum(Jdx (2f - Jdx)) = 2 dx.b - dx'G dx, and the bounds refinement rhs
    J'(f - J dx_a) = b - G dx_a.
  * other direct solvers (QR): the carry holds J *flattened to (m*n,)* —
    flat vectors dodge the minor-dim padding ((B, 128) tiles exactly for
    the n=2, m=64 headline shape) and reshape back inside the body where
    the value lives in registers/VMEM.

Semantics are identical to the unfused path (same trajectory, counters
kept to the reference accounting); tests/test_fused.py pins it. One
reporting difference: ``result["jacobian"]`` is recomputed at the FINAL
iterate in fused mode (the carry holds Gram products, not J), whereas the
unfused path — like the reference — returns J at the last linearization
point, one accepted step behind. The fused value is the fresher of the
two for post-fit statistics (utils/stats.covariance documents the same
staleness and takes ``problem=`` to re-linearize at the minimizer).
"""

from __future__ import annotations

import dataclasses
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
)
from ..problem import LeastSquaresProblem
from ..solver import solver_fns
from ..solver.cholesky import solve_spd_system
from .common import (
    STATUS_NOT_FINITE,
    active_set_refinement,
    STATUS_OK,
    Options,
    assess_convergence,
    build_eval_schedule,
    init_trace,
    resolve_tolerances,
    seed_eval,
    update_trace,
)


def _gmatvec(G, v):
    """(n, n) x (n,) product in broadcast form (MXU-starving tiny dots
    under vmap; same rationale as operators._BROADCAST_MATVEC_MAX_N)."""
    return jnp.sum(G * v[..., None, :], axis=-1)


def loop_pieces(
    problem: LeastSquaresProblem,
    solver_tag,
    opts: Options,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    batched: bool = False,
    fused: bool = False,
    geodesic: bool = False,
):
    """The LM loop decomposed as ``(carry0, cond_fn, body_fn, finalize)``.

    ``optimize_loop`` runs them through one ``lax.while_loop``; the batched
    fraction-stop driver (batch.py) vmaps body/cond around its own outer
    loop instead. With ``batched=True`` the Jacobian-reuse ``lax.cond``
    becomes an unconditional evaluation: under vmap cond lowers to a select
    that computes *both* branches anyway, and on a rejected step x is
    unchanged so recomputing J(x) is bitwise the reuse — same semantics,
    minus the select. Work counters keep the reference accounting (g_calls
    counts only fresh linearization points) either way.

    ``fused=True`` selects the fused trial-point evaluation schedule (one
    model evaluation per iteration; see the module docstring for the
    per-solver carry layouts).
    """
    residual_fn = problem.residual_fn
    jac_fn = problem.jac_fn
    materialize = problem.materialize_jacobian
    m, n = problem.m, problem.n
    solve_gn, solve_damped = solver_fns(solver_tag)

    # Evaluation schedule (fused validation, Gram-carry/flat-J/drop flags)
    # shared with the dogleg loop — see common.EvalSchedule for semantics.
    sched = build_eval_schedule(problem, solver_tag, fused, batched)
    res_jac_fn, res_gram_fn = sched.res_jac_fn, sched.res_gram_fn
    fused_gram, fused_flat = sched.fused_gram, sched.fused_flat
    drop_jstate, drop_fcur = sched.drop_jstate, sched.drop_fcur
    # fused="ssr": the SSR rides the carry as a dd (hi, lo) pair and the
    # residual vector is dropped from the carry entirely — ared becomes a
    # dd difference instead of the elementwise cancellation-free form
    # (see EvalSchedule.ssr_carry for the accuracy argument).
    ssr_carry = sched.ssr_carry

    x = jnp.asarray(problem.x0 if x0 is None else x0)
    dt = x.dtype
    x_tol, f_tol, g_tol = resolve_tolerances(opts, dt)
    radius0 = opts.radius if opts.radius is not None else config.DEFAULT_RADIUS_LM

    fcur, gram0, grhs0, jstate0, jac_seeded = seed_eval(sched, problem, x)
    need_jacobian0 = not jac_seeded
    if ssr_carry:
        ssr, ssr_lo0 = sumabs2_dd(fcur)
    else:
        ssr = sumabs2(fcur)
    false = jnp.zeros((), bool)

    trace = init_trace(opts, dt)
    trace = update_trace(trace, opts, jnp.int32(0), ssr, jnp.asarray(jnp.inf, dt))

    # Column norms ride the carry so rejected steps reuse them: the
    # linearization point is unchanged there, and in matrix-free mode a
    # fresh colnorms2() costs 32 Hutchinson rmatvec probes per iteration
    # (the reference recomputes colsumabs2! each iteration, :82, but its J
    # is materialized so that is one cheap column reduction).
    carry = dict(
        x=x,
        ssr=ssr,
        delta=jnp.asarray(radius0, dt),
        decrease_factor=jnp.asarray(2.0, dt),
        need_jacobian=jnp.asarray(need_jacobian0, bool),
        jstate=jstate0,
        maxabs_gr=jnp.asarray(jnp.inf, dt),
        it=jnp.int32(0),
        x_converged=false,
        f_converged=false,
        g_converged=false,
        converged=false,
        f_calls=jnp.int32(1),
        g_calls=jnp.int32(0 if need_jacobian0 else 1),  # seed eval counts
        mul_calls=jnp.int32(0),
        # Stop reason of the most recent inner solve (LSMR istop, -1 for
        # direct solvers) — the reference returns a ConvergenceHistory per
        # inner solve (src/utils/lsmr.jl:9-14,234-237); here the last one
        # rides the carry into the result as ``inner_istop``.
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
    if not batched and not fused:
        # Batched lockstep recomputes colnorms every iteration (both cond
        # branches would run anyway), so the carry leaf exists only in the
        # sequential trace — a dead (B, n) leaf would still be masked and
        # rewritten per iteration by the fraction-stop freeze. (Fused mode
        # likewise recomputes: colnorms from the carried J/G is one cheap
        # reduction, and on rejection the carry is unchanged so recompute
        # == reuse.)
        # need_jacobian0=False (sparse seeded carry) reuses the carried
        # colnorms at iteration 1, so seed them from the seeded Jacobian.
        carry["dtd_raw"] = (
            jnp.zeros((n,), dt)
            if need_jacobian0
            else operators.from_matrix(jstate0).colnorms2()
        )

    def cond_fn(c):
        # Non-finite iterates halt the loop: the jit-safe analogue of the
        # reference's check_isfinite throw at the top of each iteration
        # (levenberg_marquardt.jl:74).
        return (
            (~c["converged"])
            & (c["it"] < opts.iterations)
            & jnp.all(jnp.isfinite(c["x"]))
        )

    def body_fn(c):
        it = c["it"] + 1
        x, ssr = c["x"], c["ssr"]
        fcur = None if (drop_fcur or ssr_carry) else c["fcur"]
        delta = c["delta"]

        # Jacobian reuse across rejected steps (reference :77-81). In the
        # fused schedules the information arrived with the accepted trial
        # evaluation and rides the carry — zero model evaluations here.
        with jax.named_scope("lm/jacobian"):
            if fused_gram:
                G, b = c["gram"], c["grhs"]
                jstate = c["jstate"]  # linearization point (finalize only)
                op = None
            elif fused_flat:
                jstate = c["jstate"]
                op = operators.from_matrix(jnp.reshape(jstate, (m, n)))
            elif materialize and not batched:
                jstate = jax.lax.cond(
                    c["need_jacobian"], lambda: jac_fn(x), lambda: c["jstate"]
                )
                op = operators.from_matrix(jstate)
            elif drop_fcur:
                # batched: x unchanged on rejection => recompute == reuse,
                # and the linearize primal IS the residual at x — no
                # carried fcur (see drop_fcur above).
                fcur, J = res_jac_fn(x)
                jstate = x
                op = operators.from_matrix(J)
            elif materialize:
                # batched: x unchanged on rejection => recompute == reuse
                J = jac_fn(x)
                jstate = x if drop_jstate else J
                op = operators.from_matrix(J)
            elif batched:
                jstate = x
                op = operators.for_problem(problem, jstate)
            else:
                jstate = jnp.where(c["need_jacobian"], x, c["jstate"])
                op = operators.for_problem(problem, jstate)
        g_calls = c["g_calls"] + c["need_jacobian"].astype(jnp.int32)

        # Scale-invariant damping diagonal (reference :82-86). Fresh only at
        # a fresh linearization point; on rejected steps the carried value
        # is bitwise-identical and (matrix-free) 32 probes cheaper. Batched
        # mode recomputes — in lockstep both cond branches would run anyway.
        if fused_gram:
            dtd_raw = jnp.diagonal(G, axis1=-2, axis2=-1)
        elif batched or fused:
            dtd_raw = op.colnorms2()
        else:
            fresh = (
                (lambda: op.colnorms2_update(c["dtd_raw"]))
                if op.colnorms2_update is not None
                else op.colnorms2
            )
            dtd_raw = jax.lax.cond(
                c["need_jacobian"], fresh, lambda: c["dtd_raw"]
            )
            # Inject the carried/EMA estimate into the operator so every
            # downstream consumer (the LSMR Jacobi preconditioner calls
            # op.colnorms2() inside solve_damped) reuses it instead of
            # recomputing a fresh probe set — before this, the
            # preconditioner paid 32 rmatvec probes EVERY iteration even
            # when dtd rode the carry (the cond boundary blocks CSE).
            op = dataclasses.replace(op, colnorms2=lambda: dtd_raw)
        dtd = dtd_raw
        dtd_mean = jnp.mean(dtd)
        dtd = jnp.clip(
            dtd, config.MIN_DIAGONAL * dtd_mean, config.MAX_DIAGONAL * dtd_mean
        )
        damp = dtd / delta

        # Damped inner solve (reference :87) + box clip (:89-98).
        with jax.named_scope("lm/inner_solve"):
            if fused_gram:
                dx = solve_spd_system(G, b, damp)
                lmiter = jnp.int32(1)
                inner_istop = jnp.int32(-1)
            else:
                dx, lmiter, inner_istop = solve_damped(op, fcur, damp)
        mul_calls = c["mul_calls"] + lmiter

        if geodesic:
            # Geodesic acceleration (Transtrum & Sethna 2012; see the
            # LevenbergMarquardt tag docstring). f''[dx, dx] by exact
            # forward-over-forward JVP, then the SAME damped system with
            # it as rhs. Sign: with x_trial = x - dx the velocity is
            # v = -dx; f''[v,v] = f''[dx,dx] and the Transtrum update
            # x + v + a/2 becomes x - (dx + acc/2) with acc the solve
            # below. A non-finite dx propagates NaN into acc, the guard
            # comparison is then False, and the plain step is kept.
            with jax.named_scope("lm/geodesic"):
                def _jv(z):
                    return jax.jvp(residual_fn, (z,), (dx,))[1]

                fvv = jax.jvp(_jv, (x,), (dx,))[1]
                if fused_gram:
                    # Gram-carry mode has no operator: J'fvv via one VJP,
                    # then the carried (G, damp) system.
                    _, vjp_fn = jax.vjp(residual_fn, x)
                    acc = solve_spd_system(G, vjp_fn(fvv)[0], damp)
                    acc_iters = jnp.int32(2)  # one J' apply + one solve
                else:
                    acc, acc_iters, _ = solve_damped(op, fvv, damp)
                use_acc = sumabs2(acc) <= (
                    config.GEODESIC_ALPHA**2
                ) * sumabs2(dx)
                dx = jnp.where(use_acc, dx + 0.5 * acc, dx)
            mul_calls = mul_calls + acc_iters
        if lower is not None or upper is not None:
            # Active-set refinement (shared scheme:
            # common.active_set_refinement). LM keeps its regular damping
            # on the free coordinates.
            def solve_shifted(dx_a, damp2):
                if fused_gram:
                    # J'(f - J dx_a) = b - G dx_a: the residual shift stays
                    # in Gram space.
                    return (
                        solve_spd_system(G, b - _gmatvec(G, dx_a), damp2),
                        jnp.int32(1),
                    )
                dx2, it2, _ = solve_damped(op, fcur - op.matvec(dx_a), damp2)
                return dx2, it2

            dx, lmiter2 = active_set_refinement(
                dx, x, lower, upper, dtd, dt, damp, solve_shifted,
                lambda dx_a, free: clip_step_to_bounds(
                    dx_a + free, x, lower, upper
                ),
            )
            mul_calls = mul_calls + lmiter2

        # Projected gradient for the KKT g_tol test, evaluated at the
        # pre-update x (reference :100-104). In Gram space J'f IS the
        # carried rhs b.
        g = b if fused_gram else op.rmatvec(fcur)
        mul_calls = mul_calls + 1
        maxabs_gr = maxabs_projected_gradient(g, x, lower, upper)

        # Trial point and gain ratio (reference :106-119). Both reductions
        # are computed in cancellation-free diff-of-squares form: the naive
        # ssr - trial_ssr subtracts two O(ssr) sums and loses every
        # significant digit once the per-step reduction drops below
        # eps * ssr — in f32 that poisons rho near the optimum (random
        # accept/reject churn to the iteration cap). Identities:
        #   ssr - ||ft||^2        = sum((f - ft)(f + ft))
        #   ssr - ||J dx - f||^2  = sum((J dx)(2f - J dx))
        #                         = 2 dx.b - dx'G dx   (Gram form)
        x_trial = x - dx
        if fused_gram:
            # ONE fused model evaluation per iteration: residual and Gram
            # products at the trial point share their primal; J never
            # reaches HBM. Carried forward on acceptance, discarded on
            # rejection (the carried G/b at the unchanged x are kept).
            ftrial, gtrial, btrial = res_gram_fn(x_trial)
        elif fused:
            ftrial, jtrial = res_jac_fn(x_trial)
        else:
            ftrial = residual_fn(x_trial)
        # Geodesic charges the two nested-JVP model evaluations of f''vv.
        f_calls = c["f_calls"] + (3 if geodesic else 1)
        if ssr_carry:
            trial_ssr, trial_lo = sumabs2_dd(ftrial)
            ared = dd_diff(ssr, c["ssr_lo"], trial_ssr, trial_lo)
        else:
            trial_ssr = sumabs2(ftrial)
            ared = jnp.sum((fcur - ftrial) * (fcur + ftrial))
        if fused_gram:
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

        accepted = rho > config.MIN_STEP_QUALITY
        flags = assess_convergence(
            dx, x_trial, maxabs_gr, ssr, ared,
            x_tol, f_tol, g_tol, accepted,
        )

        # Accept: Ceres-style radius growth (reference :126-132).
        # Reject: halve with doubling decrease factor (reference :133-138).
        grow = jnp.minimum(
            delta / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            config.MAX_TRUST_REGION_RADIUS,
        )
        shrink = jnp.maximum(
            delta / c["decrease_factor"], config.MIN_TRUST_REGION_RADIUS
        )
        # A non-finite step poisons x in the reference (x is updated before
        # acceptance and the revert re-adds dx, levenberg_marquardt.jl:106,135);
        # reproduce that so the loop halts and surfaces STATUS_NOT_FINITE.
        step_finite = jnp.all(jnp.isfinite(dx))
        if fused_gram:
            # jstate tracks the linearization point of the carried G/b —
            # the last *finite* accepted x (poisoned steps are rejected:
            # non-finite ftrial makes rho NaN, accepted False).
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
            delta=jnp.where(accepted, grow, shrink),
            decrease_factor=jnp.where(
                accepted, jnp.asarray(2.0, dt), c["decrease_factor"] * 2.0
            ),
            need_jacobian=accepted,
            jstate=new_jstate,
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
        if not batched and not fused:
            new["dtd_raw"] = dtd_raw
        new["trace"] = update_trace(c["trace"], opts, it, new["ssr"], maxabs_gr)
        return new

    def finalize(out):
        status = jnp.where(
            jnp.all(jnp.isfinite(out["x"])), STATUS_OK, STATUS_NOT_FINITE
        )
        if drop_jstate or fused_gram:
            # jstate is the linearization point: recompute J there for the
            # result (identical to a carried J even on a poisoned exit).
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
    geodesic: bool = False,
):
    """Run LM from ``x0`` (default ``problem.x0``); returns a raw result pytree.

    Pure and jittable; `vmap` over ``x0`` (and data closed over in
    ``problem.residual_fn``) batches independent fits.
    """
    carry, cond_fn, body_fn, finalize = loop_pieces(
        problem, solver_tag, opts, lower, upper, x0, batched, fused, geodesic
    )
    return finalize(jax.lax.while_loop(cond_fn, body_fn, carry))
