"""Public entry points: solve (jittable core) and optimize (host verbs).

Counterpart of the reference's Optim-like API layer
(reference: src/types.jl:161-209):

  * ``solve(problem, optimizer, ...)`` — pure, jit/vmap/pjit-friendly;
    returns the raw on-device result pytree. This replaces
    ``optimize!(nls::LeastSquaresProblemAllocated)``.
  * ``optimize(f, x0, optimizer, ...)`` — the out-of-place convenience verb
    (reference: optimize, src/types.jl:182-184); jit-compiles and caches the
    solve, returns a host-side LeastSquaresResult.
  * ``optimize_problem(problem, optimizer, ...)`` — counterpart of
    ``optimize!(nls, optimizer)`` (reference: src/types.jl:207-209); the
    functional API has no in-place mutation, so it returns the result instead
    of mutating ``problem.x0``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .optimizer import dogleg as _dogleg
from .optimizer import levenberg_marquardt as _lm
from .optimizer.base import AbstractOptimizer, Dogleg, LevenbergMarquardt, resolve
from .optimizer.common import Options, validate_bounds
from .problem import LeastSquaresProblem, least_squares_problem
from .result import LeastSquaresResult, result_from_raw

__all__ = ["solve", "optimize", "optimize_problem", "polish"]


def solve(
    problem: LeastSquaresProblem,
    optimizer: Optional[AbstractOptimizer] = None,
    *,
    options: Optional[Options] = None,
    lower=None,
    upper=None,
    x0=None,
    batched: bool = False,
    fused=None,
):
    """Pure jittable solve; returns the raw result pytree.

    ``lower``/``upper``/``x0`` may be traced arrays; everything else is
    static. Vmap over ``x0`` (and any batch dimensions closed over in the
    problem's residual function) to batch independent fits — and pass
    ``batched=True`` when doing so: the reuse ``lax.cond``s become
    unconditional evaluations (identical semantics in vmap lockstep, where
    cond lowers to a both-branches select anyway; see optimizer docstrings).

    ``fused`` selects the fused residual+Jacobian evaluation schedule (one
    model evaluation per iteration; Gram products carried for Cholesky,
    flat J for QR — see the optimizer loop docstrings). Default off:
    measured on the headline TPU workload (100k exponential fits, m=64,
    n=2, shared sample grid) the schedule is 0.95-0.99x of the unfused
    path — the eval there is data-bound, not transcendental-bound, and
    once the shared-x path removed the duplicated grid reads the saved
    exp() no longer pays for the extra carry boundary
    (benchmarks/README.md round 3). Opt in for models whose residual is
    genuinely expensive to evaluate (the trajectory is identical either
    way; tests/test_fused.py).

    ``fused="ssr"`` (Cholesky only) additionally drops the residual
    vector from the loop carry by carrying the SSR as a two-float
    (hi, lo) pair — the actual-reduction ``ared`` becomes a dd
    difference, accurate to ~eps^2 * ssr (ops/linalg.sumabs2_dd). On
    batched fits the (B, m) residual was the largest carried leaf
    (written + re-read + freeze-merged through HBM every lockstep
    iteration solely to feed ared). Trajectories match ``fused=True`` to
    rounding, not bitwise (accept/stop ties can flip within ~eps).

    ``result["jacobian"]`` (materialized modes) is J at the last
    linearization point — the reference's semantics — except in fused
    mode, which recomputes it at the final iterate (fresher; see the LM
    module docstring). With ``iterations=0`` no linearization ever runs
    and the dense unfused path returns a zeros placeholder there.
    """
    optimizer = resolve(optimizer, problem)
    options = options or Options()
    if fused is None:
        fused = False
    if isinstance(optimizer, LevenbergMarquardt):
        # geodesic acceleration is an LM tag field (optimizer/base.py)
        return _lm.optimize_loop(
            problem, optimizer.solver, options, lower, upper, x0,
            batched, fused, optimizer.geodesic,
        )
    elif isinstance(optimizer, Dogleg):
        loop = _dogleg.optimize_loop
    else:
        raise TypeError(f"unknown optimizer {optimizer!r}")
    return loop(
        problem, optimizer.solver, options, lower, upper, x0, batched, fused
    )


# Problem reuse across ``optimize`` calls. Compiled executables live on
# the problem object itself (``_compiled_solve``), and problems are
# identity-keyed (LeastSquaresProblem is eq=False), so a host verb that
# rebuilt the problem every call would never hit its own jit cache — the
# reference avoids this by letting callers keep a
# LeastSquaresProblemAllocated (src/types.jl:141-160). Here ``optimize``
# recovers that reuse transparently: problems are cached (LRU) on the
# call's *structure* — the user callables by identity, the contents of
# the arrays they capture, plus the x0 pytree structure/shapes/dtypes —
# so a second call with the same spec reuses the problem object and
# therefore its compiled executables.
_PROBLEM_CACHE: "dict" = {}
_PROBLEM_CACHE_MAX = 128


def _captured_arrays(f, depth=3, seen=None, budget=None):
    """Array objects reachable from ``f``'s closure cells, referenced
    globals, functools.partial payloads, bound-method ``__self__``
    attributes, and nested tuple/list/dict containers (depth- and
    budget-limited). Used to fingerprint the data a residual function
    closes over: identity-keying on ``f`` alone would keep serving a
    cached problem (and its compiled executable, which baked the old data
    in as trace constants) after the user rebinds or mutates the captured
    array — a silent wrong-result mode, since the function object is
    unchanged."""
    import functools as _ft

    import numpy as np

    out = []
    seen = set() if seen is None else seen
    budget = [256] if budget is None else budget
    if depth < 0 or id(f) in seen or budget[0] <= 0:
        return out
    seen.add(id(f))

    def collect(o, d=1):
        if budget[0] <= 0 or id(o) in seen:
            return
        budget[0] -= 1
        if isinstance(o, (np.ndarray, jax.Array)):
            out.append(o)
        elif isinstance(o, (bool, int, float, complex, str, bytes)):
            # Captured Python scalars are trace constants too: a rebound
            # module-level `scale = 2.0` must invalidate the cache the
            # same way a rebound array does.
            out.append(("pyval", type(o).__name__, o))
        elif isinstance(o, (tuple, list)):
            seen.add(id(o))
            for x in o:
                collect(x, d - 1) if d > 0 else None
        elif isinstance(o, dict):
            seen.add(id(o))
            for x in o.values():
                collect(x, d - 1) if d > 0 else None
        elif callable(o) and not isinstance(o, type):
            out.extend(_captured_arrays(o, depth - 1, seen, budget))

    if isinstance(f, _ft.partial):
        collect(f.func, 2)
        for o in f.args:
            collect(o, 2)
        for o in f.keywords.values():
            collect(o, 2)
        return out
    # Bound method: the receiver's attributes are part of the closure in
    # every practical sense (f = obj.resid; obj.y = data).
    self_obj = getattr(f, "__self__", None)
    if self_obj is not None and hasattr(self_obj, "__dict__"):
        for v in vars(self_obj).values():
            collect(v, 2)
    code = getattr(f, "__code__", None)
    for cell in getattr(f, "__closure__", None) or ():
        try:
            collect(cell.cell_contents, 2)
        except ValueError:  # empty cell
            continue
    gvars = getattr(f, "__globals__", None)
    if code is not None and gvars is not None:
        for name in code.co_names:
            if name in gvars:
                collect(gvars[name], 2)
    return out


def _array_fingerprint(a):
    """Cache fingerprint of one captured array (or scalar pseudo-capture).

    numpy arrays are mutable in place, so identity is not enough — hash
    the contents (blake2b; ~GB/s, negligible next to the recompile a miss
    triggers, and collision-free in practice where a 32-bit checksum over
    many same-shaped datasets would not be). jax.Arrays are immutable:
    identity + shape/dtype suffices and avoids pulling device buffers to
    the host."""
    import hashlib

    import numpy as np

    if isinstance(a, tuple):  # ("pyval", type, value) from _captured_arrays
        return a
    if isinstance(a, np.ndarray):
        if a.dtype.hasobject:  # not byte-viewable: identity is the best we have
            return ("np-obj", a.shape, id(a))
        digest = hashlib.blake2b(
            np.ascontiguousarray(a).view(np.uint8).reshape(-1),
            digest_size=16,
        ).digest()
        return ("np", a.shape, a.dtype.str, digest)
    return ("jx", getattr(a, "shape", None), str(getattr(a, "dtype", None)), id(a))


def _problem_cache_key(f, g, output_length, autodiff, materialize_jacobian,
                       loss, f_scale, x0):
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(x0)
    # The fingerprint arrays are returned alongside the key: the cache
    # entry must hold strong references to them so a dropped jax.Array's
    # id cannot be recycled by a new allocation and collide back onto a
    # stale entry.
    captured = _captured_arrays(f) + ([] if g is None else _captured_arrays(g))
    try:
        spec = tuple(
            (tuple(np.shape(l)), np.result_type(l).str) for l in leaves
        )
        key = (f, g, output_length, autodiff, materialize_jacobian,
               loss, f_scale, treedef, spec,
               tuple(_array_fingerprint(a) for a in captured))
        hash(key)
    except TypeError:
        return None, captured  # unhashable callable/structure: skip caching
    return key, captured


def _compiled_solve(problem, optimizer, options, has_lower, has_upper):
    """Per-problem jit cache, stored ON the problem object so a compiled
    executable (which bakes closure data in as constants) lives exactly as
    long as the problem that produced it — a global lru_cache would pin
    evicted problems and their datasets until its own slots cycled."""
    cache = problem.__dict__.get("_jit_cache")
    if cache is None:
        cache = {}
        object.__setattr__(problem, "_jit_cache", cache)
    key = (optimizer, options, has_lower, has_upper)
    fn = cache.get(key)
    if fn is not None:
        return fn

    def run(x0, lower, upper):
        return solve(
            problem,
            optimizer,
            options=options,
            lower=lower if has_lower else None,
            upper=upper if has_upper else None,
            x0=x0,
        )

    fn = jax.jit(run)
    if len(cache) >= 32:  # bound per-problem variants (optimizer/options)
        cache.pop(next(iter(cache)))
    cache[key] = fn
    return fn


def _check_initial_bounds(x0, lower, upper):
    """Reference: levenberg_marquardt.jl:49-51 / dogleg.jl:52-54."""
    import numpy as np

    x0 = np.asarray(x0)
    if lower is not None and not np.all(x0 >= np.asarray(lower)):
        raise ValueError("Initial guess must be within bounds.")
    if upper is not None and not np.all(x0 <= np.asarray(upper)):
        raise ValueError("Initial guess must be within bounds.")


def optimize_problem(
    problem: LeastSquaresProblem,
    optimizer: Optional[AbstractOptimizer] = None,
    *,
    x_tol: Optional[float] = None,
    f_tol: Optional[float] = None,
    g_tol: Optional[float] = None,
    iterations: int = 1000,
    radius: Optional[float] = None,
    lower=None,
    upper=None,
    store_trace: bool = False,
    show_trace: bool = False,
    show_every: int = 1,
    x0=None,
    restarts: int = 0,
) -> LeastSquaresResult:
    """Solve ``problem``; counterpart of ``optimize!`` (reference: src/types.jl:207-209).

    ``x0`` overrides the problem's start without rebuilding it — the
    functional analogue of the reference's resume-from-last-iterate
    semantics (``optimize!`` mutates ``nls.x`` in place, src/types.jl:189):
    pass a previous result's minimizer (or ``utils.checkpoint.resume_x0``)
    to continue a solve.

    Tolerances of None pick dtype-scaled defaults: 1e-8 in f64 (reference
    parity, src/types.jl:196-199), noise-floor-scaled values in f32 so
    on-chip solves converge by criterion (config.default_tolerances).

    ``restarts`` (default 0) enables the restart-on-suspect-stop escape
    for low-precision solves: a stop certified only by the f- or
    x-criterion (not the KKT gradient test) in a flat region can be
    premature in f32 — the per-step reduction falls under the dtype noise
    floor while the gradient is still large (docs/ROADMAP.md round-2 #5,
    the BoxBOD-class far-start failure). Each restart re-solves from the
    current minimizer with a fresh trust region (same compiled
    executable — x0 is a runtime argument); a genuine optimum re-stops
    within a couple of iterations with no meaningful ssr drop, ending the
    loop, while a premature stop makes real progress. Work counters
    accumulate across restarts.
    """
    from .optimizer.common import resolve_tolerances

    x_tol, f_tol, g_tol = resolve_tolerances(
        Options(x_tol=x_tol, f_tol=f_tol, g_tol=g_tol), problem.x0.dtype
    )
    opts = Options(
        x_tol=x_tol,
        f_tol=f_tol,
        g_tol=g_tol,
        iterations=iterations,
        radius=radius,
        store_trace=store_trace,
        show_trace=show_trace,
        show_every=show_every,
    )
    if x0 is None:
        start = problem.x0
    elif problem.unravel is not None:
        from jax.flatten_util import ravel_pytree

        start, _ = ravel_pytree(jax.tree_util.tree_map(jnp.asarray, x0))
        start = jnp.asarray(start, problem.x0.dtype)
    else:
        start = jnp.asarray(x0, problem.x0.dtype)
    lower, upper = validate_bounds(start, lower, upper)
    _check_initial_bounds(start, lower, upper)
    optimizer = resolve(optimizer, problem)
    fn = _compiled_solve(
        problem, optimizer, opts, lower is not None, upper is not None
    )
    zeros = jnp.zeros_like(start)

    def run(s):
        return dict(fn(
            s,
            lower if lower is not None else zeros,
            upper if upper is not None else zeros,
        ))

    raw = run(start)
    if restarts:
        import numpy as np

        counters = ("iterations", "f_calls", "g_calls", "mul_calls")
        totals = {k: int(np.asarray(raw[k])) for k in counters}
        for _ in range(int(restarts)):
            # Suspect stop: certified by f/x only (no KKT gradient test)
            # on a finite iterate — the premature-stop signature in low
            # precision. A g-converged or failed stop is final.
            suspect = (
                bool(np.asarray(raw["converged"]))
                and not bool(np.asarray(raw["g_converged"]))
                and int(np.asarray(raw["status"])) == 0
            )
            if not suspect:
                break
            probe = run(jnp.asarray(raw["minimizer"]))
            for k in counters:
                totals[k] += int(np.asarray(probe[k]))
            probe_ssr = float(np.asarray(probe["ssr"]))
            raw_ssr = float(np.asarray(raw["ssr"]))
            probe_ok = int(np.asarray(probe["status"])) == 0
            # Adopt any weakly-better probe (monotone descent means the
            # probe is never worse; its work is charged either way).
            if probe_ok and probe_ssr <= raw_ssr:
                raw = probe
            if not (probe_ok and probe_ssr < raw_ssr * (1.0 - 10.0 * opts.f_tol)):
                break  # genuine optimum: probe re-stopped with no real progress
        for k in counters:
            raw[k] = totals[k]
    raw["optimizer"] = "LevenbergMarquardt" if isinstance(
        optimizer, LevenbergMarquardt
    ) else "Dogleg"
    result = result_from_raw(raw, opts)
    if problem.unravel is not None:
        # Report the minimizer in the user's parameter structure.
        import dataclasses as _dc

        import numpy as _np

        structured = jax.tree_util.tree_map(
            _np.asarray, problem.unravel(jnp.asarray(result.minimizer))
        )
        result = _dc.replace(result, minimizer=structured)
    return result


def optimize(
    f: Callable,
    x0,
    optimizer: Optional[AbstractOptimizer] = None,
    *,
    autodiff: str = "forward",
    g: Optional[Callable] = None,
    output_length: Optional[int] = None,
    materialize_jacobian: bool = True,
    loss="linear",
    f_scale: float = 1.0,
    **kwargs,
) -> LeastSquaresResult:
    """Minimize sum(f(x)^2) from x0 (reference: optimize, src/types.jl:182-184).

    ``x0`` may be a flat vector or any pytree of arrays (structured
    parameters; see least_squares_problem). ``loss``/``f_scale`` select a
    robust loss (see loss.py): the objective becomes
    sum(f_scale^2 rho((f_i/f_scale)^2)) and the reported ssr is that robust
    value. A user ``g`` is the Jacobian of the *raw* residual and cannot be
    combined with a non-linear loss (AD handles the transform exactly).

    Repeated calls with the same spec — same ``f``/``g`` objects, same x0
    structure/shapes/dtypes, same static flags — reuse the cached problem
    and its compiled executable (zero recompilation; the reference's
    LeastSquaresProblemAllocated workspace reuse, src/types.jl:141-160).
    Note this keys on the *identity* of ``f``: a lambda recreated per call
    defeats it — define the residual once, or use ``optimize_problem``.
    """
    key, captured = _problem_cache_key(
        f, g, output_length, autodiff, materialize_jacobian,
        loss, f_scale, x0,
    )
    entry = _PROBLEM_CACHE.get(key) if key is not None else None
    if entry is not None:  # LRU: refresh recency so hot entries survive
        _PROBLEM_CACHE[key] = _PROBLEM_CACHE.pop(key)
    problem = entry[0] if entry is not None else None
    if problem is None:
        base_f = f
        if loss != "linear":
            if g is not None:
                raise ValueError(
                    "a user Jacobian g applies to the raw residual; robust "
                    "losses differentiate through the loss transform — drop "
                    "g or use loss='linear'"
                )
            from .loss import robustify

            base_f = robustify(f, loss, f_scale)
        problem = least_squares_problem(
            f=base_f,
            x=x0,
            g=g,
            output_length=output_length,
            autodiff=autodiff,
            materialize_jacobian=materialize_jacobian,
        )
        if key is not None:
            if len(_PROBLEM_CACHE) >= _PROBLEM_CACHE_MAX:
                _PROBLEM_CACHE.pop(next(iter(_PROBLEM_CACHE)))
            # captured rides along to pin the fingerprinted arrays' ids
            # (see _captured_arrays).
            _PROBLEM_CACHE[key] = (problem, captured)
    return optimize_problem(problem, optimizer, x0=x0, **kwargs)


def polish(f, x, optimizer=None, **kwargs) -> LeastSquaresResult:
    """Refine a minimizer in float64 — the mixed-precision finish.

    The TPU-native precision strategy for certified-accuracy fits: run the
    bulk solve in f32 (MXU speed, dtype-scaled tolerances), then hand the
    f32 minimizer to a short f64 refinement. f64 on TPU is software-emulated
    and slow per FLOP, but the polish starts at an already-converged point
    and runs few iterations on a small system, so it is latency-dominated.
    The reference needs no such stage because it is f64 everywhere
    (/root/reference/src — pure Julia Float64); this is the on-chip
    equivalent of its BigFloat genericity axis (test/nonlinearsolvers.jl:631).

    ``f`` must compute in f64 when given f64 inputs (avoid closing over f32
    data arrays — their casts to f64 carry only f32 information). Requires
    ``jax.config.jax_enable_x64``. Accepts every ``optimize`` kwarg.
    """
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "polish runs in float64: enable it first with "
            "jax.config.update('jax_enable_x64', True)"
        )
    x64 = jax.tree_util.tree_map(
        lambda leaf: jnp.asarray(leaf, jnp.float64), x
    )
    return optimize(f, x64, optimizer, **kwargs)
