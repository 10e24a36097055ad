"""Curve-fitting front end: fit ``model(x, beta)`` to data.

The reference is a raw NLLS solver — users hand-write the residual
``ydata - model(xdata, beta)`` themselves (its NIST test does exactly that,
reference: test/nonlinearfitting.jl:1448-1472). This module packages that
pattern as the framework's regression model family:

  * :func:`curve_fit` — one fit, Optim-style result, optional weights and
    box bounds.
  * :func:`curve_fit_batch` — thousands of independent fits vmapped into a
    single MXU-saturating kernel (each fit gets its own data slice and
    start); this is the flagship TPU workload (bench.py).

Built-in model zoo: :data:`CURVES` (shared shapes) plus the 16 certified
NIST models in models/nist.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..api import optimize
from ..batch import solve_batch
from ..optimizer.common import Options

# Common curve shapes, each a pure model(x, beta) -> y.
CURVES = {
    # saturating exponential: b0 * (1 - exp(-b1 x))   [misra1a / BoxBOD shape]
    "exp_saturation": lambda x, b: b[0] * (1.0 - jnp.exp(-b[1] * x)),
    # exponential decay with offset: b0 * exp(-b1 x) + b2
    "exp_decay": lambda x, b: b[0] * jnp.exp(-b[1] * x) + b[2],
    # power law: b0 * x^b1   [DanWood shape]
    "power": lambda x, b: b[0] * x ** b[1],
    # logistic: b0 / (1 + exp(b1 - b2 x))   [Rat42 shape]
    "logistic": lambda x, b: b[0] / (1.0 + jnp.exp(b[1] - b[2] * x)),
    # Gaussian peak: b0 * exp(-(x - b1)^2 / (2 b2^2))
    "gaussian": lambda x, b: b[0] * jnp.exp(-((x - b[1]) ** 2) / (2.0 * b[2] ** 2)),
    # Michaelis-Menten: b0 x / (b1 + x)
    "michaelis_menten": lambda x, b: b[0] * x / (b[1] + x),
    # two-term exponential sum: b0 exp(-b1 x) + b2 exp(-b3 x)
    # [pharmacokinetics / relaxation; Lanczos shape with 2 terms].
    # The terms permute — the separable structure canonicalizes the
    # fitted vector to rates ascending (models/separable.py).
    "exp_sum_2": lambda x, b: (
        b[0] * jnp.exp(-b[1] * x) + b[2] * jnp.exp(-b[3] * x)
    ),
    # three-term exponential sum [NIST Lanczos shape]
    "exp_sum_3": lambda x, b: (
        b[0] * jnp.exp(-b[1] * x)
        + b[2] * jnp.exp(-b[3] * x)
        + b[4] * jnp.exp(-b[5] * x)
    ),
    # k-peak Gaussian sums, interleaved (amp, center, width) triples
    # [spectroscopy; NIST Gauss1-3 shape minus the exp background].
    # Terms permute / widths appear squared — the separable structure
    # canonicalizes centers ascending, widths positive.
    "gauss_sum_2": lambda x, b: (
        b[0] * jnp.exp(-((x - b[1]) ** 2) / (2.0 * b[2] ** 2))
        + b[3] * jnp.exp(-((x - b[4]) ** 2) / (2.0 * b[5] ** 2))
    ),
    "gauss_sum_3": lambda x, b: (
        b[0] * jnp.exp(-((x - b[1]) ** 2) / (2.0 * b[2] ** 2))
        + b[3] * jnp.exp(-((x - b[4]) ** 2) / (2.0 * b[5] ** 2))
        + b[6] * jnp.exp(-((x - b[7]) ** 2) / (2.0 * b[8] ** 2))
    ),
}


# Gridded variants: for models whose transcendental argument is s*x with
# a *parameter-free offset*, a uniform sample grid turns the per-sample
# exp into a geometric sequence (ops/special.make_exp_grid: 3 exps +
# power tables instead of m exps). Few-ulp·log2(m) rounding vs the naive
# form — below the f32 solve tolerances — with the naive exp's exact
# saturation semantics (inf/0, never NaN).
#
# The logistic is deliberately NOT here: exp(b1 - b2*x) needs a
# parameter-dependent scalar prefactor (exp of the offset) times the
# table, and when the transition is steep (|b2|*dt*m/2 beyond the dtype's
# exp range) the prefactor and the table saturate in opposite directions
# while the per-sample exponent is moderate — the product is then
# unrecoverable (0*inf) without re-doing the per-sample exp, which would
# erase the win. Measured failure: O(1)-wrong model values near the grid
# edge at f32 with b2 ≳ 2.8 on a dt=1, m=64 grid.
_GRIDDED_NAMES = ("exp_saturation", "exp_decay", "exp_sum_2", "exp_sum_3")


def gridded_model(name: str, t0: float, dt: float, m: int) -> Callable:
    """Gridded-exp evaluator for a named CURVES model on the uniform grid
    ``x_i = t0 + i*dt`` (i < m). Supported: exp_saturation, exp_decay
    (models whose exp argument has no parameter-dependent offset — see
    the note above for why the logistic is excluded). The returned
    callable has the usual ``model(x, beta)`` signature but ignores ``x``
    (the grid is static)."""
    if name not in _GRIDDED_NAMES:
        raise ValueError(
            f"no gridded variant for {name!r}; supported: "
            f"{sorted(_GRIDDED_NAMES)}"
        )
    from ..ops.special import make_exp_grid

    e = make_exp_grid(t0, dt, m)
    if name == "exp_saturation":
        return lambda x, b: b[0] * (1.0 - e(-b[1]))
    if name == "exp_sum_2":
        return lambda x, b: b[0] * e(-b[1]) + b[2] * e(-b[3])
    if name == "exp_sum_3":
        return lambda x, b: (
            b[0] * e(-b[1]) + b[2] * e(-b[3]) + b[4] * e(-b[5])
        )
    return lambda x, b: b[0] * e(-b[1]) + b[2]


def _as_model(model) -> Callable:
    if callable(model):
        return model
    try:
        return CURVES[model]
    except KeyError:
        from .nist import MODELS

        if model in MODELS:
            return MODELS[model]
        raise ValueError(
            f"unknown model {model!r}; pass a callable or one of "
            f"{sorted(CURVES) + sorted(MODELS)}"
        ) from None


def curve_fit(
    model,
    xdata,
    ydata,
    p0,
    *,
    weights=None,
    optimizer=None,
    lower=None,
    upper=None,
    separable: bool = False,
    **kwargs,
):
    """Fit ``model(x, beta)`` to (xdata, ydata) by weighted least squares.

    ``model`` is a pure callable or a name from :data:`CURVES` /
    models/nist.py MODELS. ``weights`` (optional, same shape as ydata)
    scales residuals: minimizes sum(w^2 (y - model)^2). ``loss=``/
    ``f_scale=`` select a robust loss (loss.py) for outlier-resistant
    fits. ``separable=True`` runs variable projection (see
    curve_fit_batch and models/separable.py): the outer solve runs on the
    nonlinear parameters only, the returned minimizer is the full vector,
    and the result's convergence criteria/work counters refer to the
    reduced problem. Remaining kwargs (x_tol, f_tol, g_tol, iterations,
    store_trace, ...) go to ``optimize_problem``. Returns a
    LeastSquaresResult.
    """
    from ..api import _array_fingerprint

    if isinstance(p0, str):
        # Data-driven starts (models/init.py; p0="auto").
        p0 = _auto_p0(model, xdata, ydata, p0)
    model_key = model  # name string, or callable keyed by identity
    if separable:
        return _curve_fit_separable(
            model, xdata, ydata, p0,
            weights=weights, optimizer=optimizer,
            lower=lower, upper=upper, **kwargs,
        )
    model = _as_model(model)
    # The residual closure is cached on (model, data fingerprints): a
    # fresh closure per call would defeat optimize's problem cache (keyed
    # on f identity) and recompile the solve on every curve_fit call.
    # Fingerprints are taken on the USER's arrays (numpy by content,
    # jax by identity) before conversion, so repeated calls with the same
    # data hit regardless of input type.
    def _fp(a):
        import jax as _jax
        import numpy as _np

        if not isinstance(a, (_np.ndarray, _jax.Array)):
            # lists/tuples: content-hash via numpy (their id is transient
            # — keying on it could collide after GC reuses it)
            a = _np.asarray(a)
        return _array_fingerprint(a)

    try:
        key = (
            model_key,
            _fp(xdata),
            _fp(ydata),
            None if weights is None else _fp(weights),
        )
        hash(key)
    except (TypeError, ValueError):
        key = None
    residual = _RESIDUAL_CACHE.get(key) if key is not None else None
    if residual is not None:
        _RESIDUAL_CACHE[key] = _RESIDUAL_CACHE.pop(key)  # LRU refresh
    else:
        xj = jnp.asarray(xdata)
        yj = jnp.asarray(ydata)
        w = None if weights is None else jnp.asarray(weights)

        def residual(beta):
            r = yj - model(xj, beta)
            return r if w is None else w * r

        if key is not None:
            if len(_RESIDUAL_CACHE) >= 64:
                _RESIDUAL_CACHE.pop(next(iter(_RESIDUAL_CACHE)))
            _RESIDUAL_CACHE[key] = residual

    return optimize(
        residual, jnp.asarray(p0), optimizer,
        lower=lower, upper=upper, **kwargs,
    )


_RESIDUAL_CACHE: dict = {}


def _auto_p0(model, xdata, ydata, p0):
    """Resolve ``p0="auto"``: a SeparableModel's own ``guess`` hook if it
    carries one (exp_sum_separable wires the k-term Jacquelin integral
    regression), else the named-model initializers (models/init.py)."""
    if p0 != "auto":
        raise ValueError(f"p0 must be an array or 'auto'; got {p0!r}")
    from .separable import SeparableModel

    if isinstance(model, SeparableModel):
        if model.guess is None:
            raise ValueError(
                "p0='auto' needs a SeparableModel with a guess "
                "initializer (exp_sum_separable(k<=3) provides one); "
                "pass an explicit p0"
            )
        return model.guess(xdata, ydata)
    from .init import guess_p0

    return guess_p0(model, xdata, ydata)


def _curve_fit_separable(
    model, xdata, ydata, p0, *, weights, optimizer, lower, upper, **kwargs
):
    """curve_fit with VarPro (separable=True). Same contracts as the
    batched path: named SEPARABLE model or SeparableModel instance,
    bounds on the nonlinear parameters only (full-beta arrays with
    infinite components at the linear indices), linear loss only."""
    import dataclasses

    import numpy as np

    from .separable import (
        SEPARABLE,
        SeparableModel,
        assemble_minimizer,
        reduced_residual,
    )

    if isinstance(model, SeparableModel):
        sep = model
        model_key = model  # instance identity keys the cache
    elif isinstance(model, str) and model in SEPARABLE:
        sep = SEPARABLE[model]
        model_key = model
    else:
        raise ValueError(
            "separable=True needs a SeparableModel or a named model with "
            f"separable structure; supported names: {sorted(SEPARABLE)}"
        )
    from .separable import split_nl_bounds

    lower_nl, upper_nl = split_nl_bounds(sep, lower, upper)
    if kwargs.get("loss", "linear") != "linear":
        # Robust separable fits run IRLS: the exact robustify residual
        # transform cannot pass through the closed-form coefficient
        # solve (the transformed objective is no longer plain LS in c),
        # so the loss is handled by iterative reweighting around the
        # linear-loss VarPro solve.
        return _separable_irls(
            _curve_fit_separable, _full_model_fn(sep, model), model,
            xdata, ydata, p0, weights=weights, optimizer=optimizer,
            lower=lower, upper=upper, **kwargs,
        )
    kwargs.pop("irls_iterations", None)

    from ..api import _array_fingerprint

    def _fp(a):
        import jax as _jax

        if not isinstance(a, (np.ndarray, _jax.Array)):
            a = np.asarray(a)
        return _array_fingerprint(a)

    weighted = weights is not None
    try:
        key = (
            "separable",
            model_key,
            _fp(xdata),
            _fp(ydata),
            None if weights is None else _fp(weights),
        )
        hash(key)
    except (TypeError, ValueError):
        key = None
    residual = _RESIDUAL_CACHE.get(key) if key is not None else None
    data = (
        (jnp.asarray(xdata), jnp.asarray(ydata))
        if not weighted
        else (jnp.asarray(xdata), jnp.asarray(ydata), jnp.asarray(weights))
    )
    if residual is not None:
        _RESIDUAL_CACHE[key] = _RESIDUAL_CACHE.pop(key)  # LRU refresh
    else:
        fred = reduced_residual(sep, weighted=weighted)

        def residual(alpha, _d=data):
            return fred(alpha, _d)

        if key is not None:
            if len(_RESIDUAL_CACHE) >= 64:
                _RESIDUAL_CACHE.pop(next(iter(_RESIDUAL_CACHE)))
            _RESIDUAL_CACHE[key] = residual

    p0j = jnp.asarray(p0)
    n_full = len(sep.lin) + len(sep.nl)
    if p0j.shape != (n_full,):
        raise ValueError(
            f"p0 must be the FULL parameter vector of shape ({n_full},) "
            f"for this separable model; got {p0j.shape}"
        )
    alpha0 = p0j[jnp.asarray(sep.nl)]
    result = optimize(
        residual, alpha0, optimizer, lower=lower_nl, upper=upper_nl, **kwargs
    )
    rec = assemble_minimizer(sep, weighted=weighted)
    full = np.asarray(rec(jnp.asarray(result.minimizer), data))
    return dataclasses.replace(result, minimizer=full)


def _full_model_fn(sep, model):
    """Full ``model(x, beta)`` callable for residual evaluation in the
    IRLS loop: the named model where one exists, otherwise rebuilt from
    the separable structure (``phi(x, beta[nl]) @ beta[lin]``)."""
    if isinstance(model, str):
        return _as_model(model)
    import jax.numpy as _jnp

    lin = _jnp.asarray(sep.lin)
    nl = _jnp.asarray(sep.nl)
    return lambda x, b: sep.phi(x, b[..., nl]) @ b[..., lin]


def _separable_irls(
    fit_fn, model_fn, model, xdata, ydata, p0, *, weights, optimizer,
    lower, upper, loss, f_scale=1.0, irls_iterations=10, **kwargs
):
    """Robust separable fit by iteratively reweighted VarPro.

    Each round solves the *linear-loss* weighted VarPro problem with
    weights ``w_user * sqrt(rho'((w_user r / f_scale)^2))`` from the
    previous iterate's residuals (loss.irls_weights), warm-started at
    that iterate; the first round is the plain weighted fit (weights
    from the start would confound outliers with start misfit). Stops
    when the full parameter vector moves less than the dtype x-tolerance
    (relative) or after ``irls_iterations`` rounds. The returned
    result's ``ssr`` is the TRUE robust objective
    ``sum(f_scale^2 rho((w_user r / f_scale)^2))`` at the final
    parameters; the convergence flags/criteria refer to the last
    weighted subproblem. Fixed points of this scheme satisfy the robust
    objective's stationarity condition; for non-convex losses (cauchy,
    arctan) it is the standard local scheme, not a global method.
    """
    import dataclasses

    from .. import config
    from ..loss import irls_weights, robustify

    w_map = irls_weights(loss, f_scale)
    xj = jnp.asarray(xdata)
    yj = jnp.asarray(ydata)
    w_user = None if weights is None else jnp.asarray(weights)
    if irls_iterations < 1:
        raise ValueError("irls_iterations must be >= 1")

    def weighted_resid(beta):
        r = yj - model_fn(xj, beta)
        return r if w_user is None else w_user * r

    beta = jnp.asarray(p0)
    x_tol = config.default_tolerances(beta.dtype)[0]
    result = None
    for _ in range(irls_iterations):
        if result is None:
            w_tot = w_user  # round 1: plain weighted VarPro
        else:
            w_irls = w_map(weighted_resid(beta))
            w_tot = w_irls if w_user is None else w_user * w_irls
        result = fit_fn(
            model, xdata, ydata, beta, weights=w_tot,
            optimizer=optimizer, lower=lower, upper=upper, **kwargs,
        )
        beta_new = jnp.asarray(result.minimizer)
        done = bool(
            jnp.max(jnp.abs(beta_new - beta))
            <= x_tol * (1.0 + float(jnp.max(jnp.abs(beta_new))))
        )
        beta = beta_new
        if done:
            break
    rr = robustify(weighted_resid, loss, f_scale)(beta)
    return dataclasses.replace(result, ssr=float(jnp.sum(rr * rr)))


def _separable_irls_batch(
    model, xdata, ydata, p0, *, sep, weights, optimizer, options, lower,
    upper, min_converged_fraction, loss, f_scale, gridded,
    irls_iterations, stop_check_every=1,
):
    """Batched robust separable fit: the _separable_irls scheme around
    the vmapped linear-loss VarPro solve. IRLS weights are per-fit
    (B, m); the whole batch stops when every fit's parameter vector has
    settled (or after ``irls_iterations`` rounds). The returned raw
    ``ssr`` is the per-fit TRUE robust objective at the final
    parameters. For string models the residual evaluation uses the naive
    model (the gridded evaluator differs by few-ulp rounding — far below
    the weight map's sensitivity)."""
    import jax

    from .. import config
    from ..loss import irls_weights, robustify

    if irls_iterations < 1:
        raise ValueError("irls_iterations must be >= 1")
    w_map = irls_weights(loss, f_scale)
    model_fn = _full_model_fn(sep, model)
    xj = jnp.asarray(xdata)
    yj = jnp.asarray(ydata)
    x_axis = None if xj.ndim == 1 else 0
    w_user = None if weights is None else jnp.asarray(weights)

    def resid_batch(P):
        r = yj - jax.vmap(model_fn, in_axes=(x_axis, 0))(xj, P)
        return r if w_user is None else w_user * r

    beta = jnp.asarray(p0)
    x_tol = config.default_tolerances(beta.dtype)[0]
    raw = None
    for _ in range(irls_iterations):
        if raw is None:
            w_tot = w_user  # round 1: plain weighted VarPro
        else:
            w_irls = w_map(resid_batch(beta))
            w_tot = w_irls if w_user is None else w_user * w_irls
        raw = curve_fit_batch(
            model, xdata, ydata, beta, weights=w_tot,
            optimizer=optimizer, options=options, lower=lower,
            upper=upper, min_converged_fraction=min_converged_fraction,
            gridded=gridded, separable=True,
            stop_check_every=stop_check_every,
        )
        beta_new = raw["minimizer"]
        done = bool(
            jnp.max(jnp.abs(beta_new - beta))
            <= x_tol * (1.0 + float(jnp.max(jnp.abs(beta_new))))
        )
        beta = beta_new
        if done:
            break
    rt = robustify(lambda r: r, loss, f_scale)
    rr = rt(resid_batch(beta))
    raw = dict(raw)
    raw["ssr"] = jnp.sum(rr * rr, axis=-1)
    return raw


def curve_fit_batch(
    model,
    xdata,
    ydata,
    p0,
    *,
    weights=None,
    optimizer=None,
    options: Optional[Options] = None,
    lower=None,
    upper=None,
    min_converged_fraction: Optional[float] = None,
    loss="linear",
    f_scale: float = 1.0,
    gridded: bool = False,
    separable: bool = False,
    irls_iterations: int = 10,
    fused: Optional[bool] = None,
    stop_check_every: int = 1,
):
    """Fit a batch of independent curves in one vmapped kernel.

    ``xdata``/``ydata`` have shape (B, m) (or (m,) xdata broadcast across
    the batch), ``p0`` is (B, n). Returns the raw result pytree with a
    leading batch axis (jit/pjit-friendly); wrap individual rows with the
    host API if Optim-style reports are wanted. ``min_converged_fraction``
    enables the fraction-stop loop (see solve_batch) — the production bulk
    fitting mode where stragglers don't set the batch wall-clock.

    ``gridded=True`` (opt-in) evaluates a *named* exponential-family model
    via :func:`gridded_model` — valid only when ``xdata`` is a shared 1-d
    uniform grid (raises ValueError otherwise). Cuts the m per-sample
    exps to 3 exps + power tables per evaluation.

    ``separable=True`` (opt-in) runs variable projection (VarPro, see
    models/separable.py): the model's linear coefficients are eliminated
    in closed form each evaluation and the outer NLLS runs on the
    nonlinear parameters only — fewer, better-conditioned parameters and
    immunity to wrong linear starts. ``model`` must be a name with a
    :data:`~.separable.SEPARABLE` structure or a
    :class:`~.separable.SeparableModel`; ``p0`` stays the FULL parameter
    vector (the linear entries seed nothing — they are recomputed), and
    the returned ``minimizer`` is the full vector with the optimal
    coefficients filled in. Bounds apply to the NONLINEAR parameters
    only (full-beta arrays; components at the linear indices must be
    infinite — the closed-form coefficient solve is unconstrained).
    Robust losses run IRLS around the linear-loss VarPro solve (up to
    ``irls_iterations`` reweighted rounds; the returned ``ssr`` is the
    true robust objective per fit).

    ``fused`` forwards to :func:`~.batch.solve_batch`'s fused
    residual+Jacobian trial-evaluation schedule (linear-loss paths;
    IRLS rounds stay unfused). Measured on-chip: **1.15x** on the
    VarPro-reduced headline workload (the reduced n=1 iteration is
    evaluation-dominated, so sharing the trial primal with the next
    linearization pays — unlike the joint route, where the same
    schedule measured 0.82x; see api.solve for that default's
    rationale).
    The per-fit convergence criteria (x/f/g) and the returned
    ``jacobian`` refer to the reduced (nonlinear-parameter) problem.
    Composes with ``gridded=True`` for the exponential family.
    """
    if isinstance(p0, str):
        # Data-driven starts (models/init.py): closed-form per-model
        # estimates, batched over ydata's leading axes.
        p0 = _auto_p0(model, xdata, ydata, p0)
    gridded_name = model if gridded else None
    sep = None
    if separable:
        from .separable import SEPARABLE, SeparableModel

        if isinstance(model, SeparableModel):
            if gridded:
                raise ValueError(
                    "gridded=True with a custom SeparableModel is not "
                    "supported; build the basis with "
                    "ops.special.make_exp_grid directly"
                )
            sep = model
        elif isinstance(model, str) and model in SEPARABLE:
            sep = SEPARABLE[model]
        else:
            raise ValueError(
                "separable=True needs a SeparableModel or a named model "
                f"with separable structure; supported names: "
                f"{sorted(SEPARABLE)}"
            )
        if loss != "linear":
            # Robust separable fits: IRLS around the linear-loss VarPro
            # batch solve (see _separable_irls for the scheme; the exact
            # robustify transform cannot pass through the closed-form
            # coefficient solve).
            return _separable_irls_batch(
                model, xdata, ydata, p0, sep=sep, weights=weights,
                optimizer=optimizer, options=options, lower=lower,
                upper=upper,
                min_converged_fraction=min_converged_fraction,
                loss=loss, f_scale=f_scale, gridded=gridded,
                irls_iterations=irls_iterations,
                stop_check_every=stop_check_every,
            )
    else:
        model = _as_model(model)
    p0 = jnp.asarray(p0)
    x_user = xdata  # pre-conversion: grid validation must see concrete values
    xdata = jnp.asarray(xdata)
    ydata = jnp.asarray(ydata)
    m = ydata.shape[-1]
    if gridded_name is not None:
        if not isinstance(gridded_name, str):
            raise ValueError("gridded=True needs a named CURVES model")
        if xdata.ndim != 1:
            raise ValueError("gridded=True needs a shared 1-d xdata grid")
        import numpy as _np

        # Validate on the USER's array, not the jnp conversion: inside a
        # jit trace jnp.asarray wraps even a concrete numpy grid in a
        # tracer, which cannot be read back — the grid parameters (t0, dt)
        # are static by design (baked into the compiled evaluator).
        try:
            x_np = _np.asarray(x_user, _np.float64)
        except Exception as exc:
            raise ValueError(
                "gridded=True needs a concrete xdata grid (its t0/dt are "
                "compile-time constants); pass the numpy grid itself, not "
                "a traced array"
            ) from exc
        if m < 2 or x_np.shape[0] != m:
            raise ValueError("gridded=True needs xdata of length m >= 2")
        # Best uniform spacing from the endpoints (the first gap alone
        # carries the storage dtype's quantization). The tolerance scales
        # with the dtype the grid is stored in: an exactly-uniform grid
        # quantized to f32 shows per-gap deviations ~ eps32 * max|x|.
        dt = float(x_np[-1] - x_np[0]) / (m - 1)
        # Quantization slack scales with the dtype the user STORED the
        # grid in (the jnp conversion may differ under disabled x64).
        src_dtype = getattr(x_user, "dtype", None)
        eps = (
            _np.finfo(src_dtype).eps
            if src_dtype is not None
            and _np.issubdtype(src_dtype, _np.floating)
            else _np.finfo(_np.float64).eps
        )
        slack = 8.0 * eps * max(float(_np.max(_np.abs(x_np))), abs(dt))
        if dt == 0 or not _np.allclose(
            _np.diff(x_np), dt, rtol=0.0, atol=slack
        ):
            raise ValueError("gridded=True needs a uniformly spaced xdata")
        if sep is not None:
            from .separable import gridded_separable

            sep = gridded_separable(gridded_name, float(x_np[0]), dt, m)
        else:
            model = gridded_model(gridded_name, float(x_np[0]), dt, m)
    # A 1-d xdata (or weights) is *shared* across the batch: passed once
    # with a None vmap axis instead of materializing a broadcast (B, m)
    # copy that every model evaluation would re-read from HBM.
    x_axis = None if xdata.ndim == 1 else 0
    if weights is None:
        data = (xdata, ydata)
        axes = (x_axis, 0)
    else:
        weights = jnp.asarray(weights)
        w_axis = None if weights.ndim == 1 else 0
        data = (xdata, ydata, weights)
        axes = (x_axis, 0, w_axis)

    if sep is not None:
        import jax

        from .separable import (
            assemble_minimizer,
            reduced_residual,
            split_nl_bounds,
        )

        n_full = len(sep.lin) + len(sep.nl)
        if p0.shape[-1] != n_full:
            raise ValueError(
                f"p0 must carry the FULL parameter vector (n={n_full} for "
                f"this separable model); got n={p0.shape[-1]}"
            )
        lower_nl, upper_nl = split_nl_bounds(sep, lower, upper)
        alpha0 = p0[..., jnp.asarray(sep.nl)]
        weighted = weights is not None
        raw = solve_batch(
            reduced_residual(sep, weighted=weighted), alpha0, data,
            optimizer, options=options, output_length=m,
            lower=lower_nl, upper=upper_nl,
            data_axis=axes, min_converged_fraction=min_converged_fraction,
            fused=fused, stop_check_every=stop_check_every,
        )
        rec = assemble_minimizer(sep, weighted=weighted)
        raw = dict(raw)
        raw["minimizer"] = jax.vmap(rec, in_axes=(0, axes))(
            raw["minimizer"], data
        )
        return raw

    def f(beta, d):
        if weights is None:
            xd, yd = d
            return yd - model(xd, beta)
        xd, yd, wd = d
        return wd * (yd - model(xd, beta))

    if loss != "linear":
        # robustify wraps f(beta, d) as-is — its wrapper forwards *args,
        # so the (beta, d) signature passes through (loss.py is exact and
        # AD-differentiated, same as the single-fit path).
        from ..loss import robustify

        f = robustify(f, loss, f_scale)

    return solve_batch(
        f, p0, data, optimizer,
        options=options, output_length=m, lower=lower, upper=upper,
        data_axis=axes,
        min_converged_fraction=min_converged_fraction,
        fused=fused, stop_check_every=stop_check_every,
    )
