"""Variable projection (VarPro) for separable curve models.

Many regression models are *separable*: ``model(x, beta) = sum_j c_j *
phi_j(x, alpha)`` with the parameter vector split into linear
coefficients ``c`` and nonlinear parameters ``alpha`` (exponential sums,
Gaussian peaks, rational saturation curves — most of the CURVES zoo and
half the NIST suite). Variable projection (Golub & Pereyra 1973)
eliminates ``c`` in closed form at every evaluation — given ``alpha``,
the optimal coefficients solve the tiny ``p x p`` linear least-squares
system — and runs the outer NLLS on ``alpha`` alone. The payoff is the
classic one: fewer, better-conditioned nonlinear parameters, immunity to
arbitrarily wrong linear-coefficient starts, and faster convergence on
sloppy exponential sums.

TPU-native design notes:

  * The reduced residual is a pure function of ``alpha`` — ``jax.jacfwd``
    through the closed-form solve yields the **exact** VarPro Jacobian
    (not the Kaufman approximation), with XLA CSE sharing the basis
    evaluation between the primal and the tangents.
  * The ``p x p`` coefficient solve reuses the batched-safe unrolled
    Cholesky (ops/linalg.py): under ``vmap`` it is pure VPU scalar-vector
    work, no batched-linalg kernels. A spectrally-scaled ridge
    (``eps * trace(G)/p``) keeps a degenerate basis (e.g. ``phi -> 0`` at
    pathological ``alpha``) finite: coefficients fade to zero instead of
    NaN-poisoning the solve.
  * Composes with the gridded-exp evaluator (ops/special.py) for
    exponential bases on uniform sample grids.

This is a beyond-reference capability: the reference
(/root/reference, LeastSquaresOptim.jl) has no VarPro analogue — its
users hand-optimize all parameters jointly (test/nonlinearfitting.jl).
Entry points: ``curve_fit(..., separable=True)`` and
``curve_fit_batch(..., separable=True)`` in models/curves.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax.numpy as jnp

from ..ops.linalg import spd_chol_solve

__all__ = ["SeparableModel", "SEPARABLE", "gridded_separable"]


@dataclasses.dataclass(frozen=True)
class SeparableModel:
    """Separable structure ``model(x, beta) = phi(x, alpha) @ c``.

    ``lin``/``nl`` are the positions of the linear coefficients ``c`` and
    the nonlinear parameters ``alpha`` inside the full ``beta`` vector
    (together they must partition ``range(len(beta))``). ``phi(x, alpha)``
    returns the ``(m, p)`` basis-column matrix, differentiable in
    ``alpha``. Users declare custom separable models by passing an
    instance as the ``model`` argument of curve_fit / curve_fit_batch
    with ``separable=True``.
    """

    lin: Tuple[int, ...]
    nl: Tuple[int, ...]
    phi: Callable

    def __post_init__(self):
        lin, nl = tuple(self.lin), tuple(self.nl)
        object.__setattr__(self, "lin", lin)
        object.__setattr__(self, "nl", nl)
        n = len(lin) + len(nl)
        if sorted(lin + nl) != list(range(n)):
            raise ValueError(
                "SeparableModel.lin + .nl must partition range(n); got "
                f"lin={lin}, nl={nl}"
            )
        if not callable(self.phi):
            raise ValueError("SeparableModel.phi must be callable")


def _col(v):
    return v[..., None]


# Separable structure of the CURVES zoo (models/curves.py). Each phi takes
# the sample vector x (m,) and the nonlinear sub-vector alpha and returns
# (m, p) basis columns; model(x, beta) == phi(x, beta[nl]) @ beta[lin].
SEPARABLE = {
    # b0 * (1 - exp(-b1 x)): linear b0, nonlinear b1
    "exp_saturation": SeparableModel(
        (0,), (1,), lambda x, a: _col(1.0 - jnp.exp(-a[0] * x))
    ),
    # b0 * exp(-b1 x) + b2: linear (b0, b2), nonlinear b1
    "exp_decay": SeparableModel(
        (0, 2),
        (1,),
        lambda x, a: jnp.stack(
            [jnp.exp(-a[0] * x), jnp.ones_like(x)], axis=-1
        ),
    ),
    # b0 * x^b1: linear b0, nonlinear b1
    "power": SeparableModel((0,), (1,), lambda x, a: _col(x ** a[0])),
    # b0 / (1 + exp(b1 - b2 x)): linear b0, nonlinear (b1, b2)
    "logistic": SeparableModel(
        (0,), (1, 2), lambda x, a: _col(1.0 / (1.0 + jnp.exp(a[0] - a[1] * x)))
    ),
    # b0 * exp(-(x - b1)^2 / (2 b2^2)): linear b0, nonlinear (b1, b2)
    "gaussian": SeparableModel(
        (0,),
        (1, 2),
        lambda x, a: _col(jnp.exp(-((x - a[0]) ** 2) / (2.0 * a[1] ** 2))),
    ),
    # b0 * x / (b1 + x): linear b0, nonlinear b1
    "michaelis_menten": SeparableModel(
        (0,), (1,), lambda x, a: _col(x / (a[0] + x))
    ),
}

# Gridded-exp bases (uniform sample grid; see models/curves.py for the
# grid contract and ops/special.py for the evaluator).
_GRIDDED_SEPARABLE = ("exp_saturation", "exp_decay")


def gridded_separable(name: str, t0: float, dt: float, m: int) -> SeparableModel:
    """SEPARABLE entry with the basis evaluated via the gridded-exp op
    (3 exps + power tables instead of m) on the uniform grid
    ``x_i = t0 + i*dt``. Supported: exp_saturation, exp_decay."""
    if name not in _GRIDDED_SEPARABLE:
        raise ValueError(
            f"no gridded separable variant for {name!r}; supported: "
            f"{sorted(_GRIDDED_SEPARABLE)}"
        )
    from ..ops.special import make_exp_grid

    e = make_exp_grid(t0, dt, m)
    base = SEPARABLE[name]
    if name == "exp_saturation":
        phi = lambda x, a: _col(1.0 - e(-a[0]))
    else:  # exp_decay

        def phi(x, a):
            col = e(-a[0])
            return jnp.stack([col, jnp.ones_like(col)], axis=-1)

    return SeparableModel(base.lin, base.nl, phi)


def _solve_coefficients(P, y):
    """Optimal linear coefficients ``argmin_c ||P c - y||`` for a small
    (m, p) basis: normal equations + the batched-safe unrolled Cholesky.
    A spectrally-scaled ridge (eps * mean diagonal of G, plus the dtype
    tiny) keeps a degenerate basis finite — coefficients fade to zero
    where the columns vanish, instead of 0/0 NaN. The eps-relative bias
    on c is below the dtype's own dot-product rounding (~sqrt(m)*eps)."""
    p = P.shape[-1]
    G = P.T @ P
    b = P.T @ y
    eps = jnp.finfo(P.dtype).eps
    ridge = eps * (jnp.trace(G) / p) + jnp.finfo(P.dtype).tiny
    return spd_chol_solve(G + ridge * jnp.eye(p, dtype=P.dtype), b)


def reduced_residual(sm: SeparableModel, *, weighted: bool) -> Callable:
    """The VarPro reduced residual ``f(alpha, d) -> y - phi @ c*(alpha)``
    for the curve_fit_batch data layout ``d = (x, y)`` or ``(x, y, w)``
    (weights scale both the basis and the data: the eliminated ``c`` is
    the *weighted* least-squares coefficient, matching the naive weighted
    residual ``w * (y - model)``)."""

    def f(alpha, d):
        if weighted:
            xd, yd, wd = d
            P = sm.phi(xd, alpha) * wd[..., None]
            y = wd * yd
        else:
            xd, yd = d
            P = sm.phi(xd, alpha)
            y = yd
        c = _solve_coefficients(P, y)
        return y - P @ c

    return f


def assemble_minimizer(sm: SeparableModel, *, weighted: bool) -> Callable:
    """``(alpha, d) -> full beta``: recompute the optimal coefficients at
    the solved ``alpha`` and scatter (c, alpha) back into the full
    parameter vector (pure jnp — jit/vmap composable)."""
    n = len(sm.lin) + len(sm.nl)
    lin = jnp.asarray(sm.lin)
    nl = jnp.asarray(sm.nl)

    def rec(alpha, d):
        if weighted:
            xd, yd, wd = d
            P = sm.phi(xd, alpha) * wd[..., None]
            y = wd * yd
        else:
            xd, yd = d
            P = sm.phi(xd, alpha)
            y = yd
        c = _solve_coefficients(P, y)
        beta = jnp.zeros((n,), alpha.dtype)
        return beta.at[lin].set(c.astype(alpha.dtype)).at[nl].set(alpha)

    return rec
