"""Robust loss functions: minimize sum(f_scale^2 * rho((r_i/f_scale)^2)).

Not in the reference (plain sum-of-squares only); standard for production
curve fitting with outliers (scipy.optimize.least_squares' loss=/f_scale=
surface). The TPU-native implementation is a pure elementwise residual
transform

    r~_i = f_scale * sign(r_i) * sqrt(rho((r_i / f_scale)^2))

so that sum(r~^2) == the robust objective exactly, and the whole machinery
— forward-mode Jacobians, matrix-free JVP/VJP, trust regions, batching,
sharding — applies unchanged with exact derivatives through the transform
(no IRLS outer loop, no Triggs correction bookkeeping).

Each rho is smooth with rho(z) ~ z as z -> 0, so r~ ~ r near zero and the
transform is differentiable everywhere (the sqrt is guarded by the smooth
ratio form rho(z)/z).
"""

from __future__ import annotations

from typing import Callable, Union

import jax.numpy as jnp
import numpy as np

__all__ = ["LOSSES", "robustify", "irls_weights"]


def _rho_over_z_linear(z):
    return jnp.ones_like(z)


def _rho_over_z_huber(z):
    # rho(z) = z if z <= 1 else 2 sqrt(z) - 1
    sz = jnp.sqrt(jnp.maximum(z, 1.0))
    return jnp.where(z <= 1.0, jnp.ones_like(z), (2.0 * sz - 1.0) / jnp.maximum(z, 1.0))


def _rho_over_z_soft_l1(z):
    # rho(z) = 2 (sqrt(1+z) - 1); rho/z -> 1 as z -> 0
    s = jnp.sqrt(1.0 + z)
    return 2.0 / (s + 1.0)


def _rho_over_z_cauchy(z):
    # rho(z) = ln(1+z); rho/z -> 1 as z -> 0. Double-where so the ratio
    # branch never sees z ~ 0 (its gradient would be NaN there and
    # jnp.where gradients evaluate both branches).
    small = z < 1e-8
    z_big = jnp.where(small, jnp.ones_like(z), z)
    return jnp.where(small, 1.0 - z / 2.0, jnp.log1p(z_big) / z_big)


def _rho_over_z_arctan(z):
    # rho(z) = arctan(z); rho/z -> 1 as z -> 0 (double-where, see cauchy)
    small = z < 1e-8
    z_big = jnp.where(small, jnp.ones_like(z), z)
    return jnp.where(small, 1.0 - z * z / 3.0, jnp.arctan(z_big) / z_big)


LOSSES = {
    "linear": _rho_over_z_linear,
    "huber": _rho_over_z_huber,
    "soft_l1": _rho_over_z_soft_l1,
    "cauchy": _rho_over_z_cauchy,
    "arctan": _rho_over_z_arctan,
}


def _resolve_ratio(loss):
    if callable(loss):
        return loss
    try:
        return LOSSES[loss]
    except KeyError:
        raise ValueError(
            f"unknown loss {loss!r}; expected one of {sorted(LOSSES)} "
            "or a callable rho_over_z"
        ) from None


def _check_f_scale(f_scale):
    f_scale = float(f_scale)
    if not (f_scale > 0.0) or not np.isfinite(f_scale):
        raise ValueError(
            f"f_scale must be a positive finite number, got {f_scale!r} "
            "(0 would collapse every residual to 0/NaN and fake a perfect fit)"
        )
    return f_scale


def robustify(
    residual_fn: Callable,
    loss: Union[str, Callable] = "linear",
    f_scale: float = 1.0,
) -> Callable:
    """Wrap ``residual_fn`` so plain least squares on the result minimizes
    the robust objective sum(f_scale^2 rho((r/f_scale)^2)).

    ``loss`` is a name from :data:`LOSSES` or a callable ``rho_over_z(z)``
    returning rho(z)/z (the smooth ratio form; must tend to 1 as z -> 0).
    """
    ratio = _resolve_ratio(loss)
    f_scale = _check_f_scale(f_scale)
    if ratio is _rho_over_z_linear:
        return residual_fn

    def robust_residual(*args, **kwargs):
        r = residual_fn(*args, **kwargs)
        scaled = r / f_scale
        # Overflow guard: |r| beyond sqrt(floatmax)*f_scale squares to inf,
        # which every rho ratio mishandles (0 or NaN transformed residuals
        # with NaN gradients, f32 threshold ~1.8e19). Clamp *before*
        # squaring so both the primal and its JVP tangent stay finite —
        # gross outliers saturate (zero gradient), which is exactly the
        # robust-loss intent. The returned residual must be built from the
        # *clamped* value too: using raw ``r`` would grow linearly past the
        # cap (constant nonzero gradient) and silently deviate from
        # f_scale^2 rho((r/f_scale)^2).
        cap = jnp.sqrt(jnp.asarray(jnp.finfo(scaled.dtype).max, scaled.dtype)) / 4
        scaled = jnp.clip(scaled, -cap, cap)
        z = scaled * scaled
        return f_scale * scaled * jnp.sqrt(ratio(z))

    return robust_residual


def irls_weights(
    loss: Union[str, Callable] = "linear", f_scale: float = 1.0
) -> Callable:
    """IRLS weight map ``w(r) = sqrt(rho'((r/f_scale)^2))`` for the robust
    objective ``sum(f_scale^2 rho((r/f_scale)^2))``.

    Solving the *weighted* least-squares problem with these weights
    (recomputed from the previous iterate's residuals) is the standard
    iteratively-reweighted scheme: the weighted normal equations at the
    fixed point coincide with the robust objective's stationarity
    condition ``sum(rho'(z_i) r_i dr_i) = 0``. rho' comes from AD of the
    stored smooth-ratio form (``rho(z) = z * ratio(z)``) — exact for the
    built-in losses and any user callable. Used by the separable (VarPro)
    robust path, where the closed-form inner coefficient solve requires a
    genuinely (re)weighted plain LS problem — the exact ``robustify``
    residual transform cannot pass through it.

    The weight for a gross outlier tends to 0 (huber/soft_l1 ~ 1/|r|,
    cauchy ~ 1/r^2), never NaN: the same pre-squaring overflow clamp as
    ``robustify`` applies, and rho' is evaluated at finite z.
    """
    import jax

    ratio = _resolve_ratio(loss)
    f_scale = _check_f_scale(f_scale)
    if ratio is _rho_over_z_linear:
        return lambda r: jnp.ones_like(r)

    def drho(z):
        # elementwise rho'(z) via AD of z*ratio(z) (sum-trick: rho is
        # elementwise, so grad of the sum is the elementwise derivative)
        return jax.grad(lambda zz: jnp.sum(zz * ratio(zz)))(z)

    def weights(r):
        scaled = r / f_scale
        cap = (
            jnp.sqrt(jnp.asarray(jnp.finfo(scaled.dtype).max, scaled.dtype))
            / 4
        )
        scaled = jnp.clip(scaled, -cap, cap)
        z = scaled * scaled
        return jnp.sqrt(jnp.maximum(drho(z), 0.0))

    return weights
