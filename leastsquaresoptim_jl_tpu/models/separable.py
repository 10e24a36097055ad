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
  * The coefficient solve is batched-safe VPU scalar-vector work (no
    batched-linalg kernels under ``vmap``): an unrolled MGS QR when the
    basis survives a scale-invariant conditioning test (error
    ~eps*cond(P) — decisive in f32 on the collinear exponential-sum
    bases VarPro exists for), falling back to ridged normal equations +
    the unrolled Cholesky (ops/linalg.py) whose spectrally-scaled ridge
    keeps a degenerate basis (``phi -> 0`` at pathological ``alpha``)
    finite: coefficients fade to zero instead of NaN-poisoning the
    solve. The route test runs on a stop_gradient pass and the
    differentiated QR on a sanitized basis, so the select is safe
    under both jacfwd and jacrev even at a vanishing basis.
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
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.linalg import spd_chol_solve

__all__ = [
    "SeparableModel",
    "SEPARABLE",
    "gridded_separable",
    "exp_sum_separable",
    "gauss_sum_separable",
    "canonical_sorted_exp_pairs",
    "canonical_sorted_gauss_triples",
]


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

    ``canonical`` (optional) maps an assembled full ``beta`` to the
    canonical representative of the model's *exact* symmetry group —
    e.g. a basis odd in some alpha component (``phi(-w) = -phi(w)``,
    absorbed by the linear coefficient's sign) or permutable basis terms
    (exponential sums, multi-Gaussian bumps). VarPro is free to land on
    any representative (the reduced residual is symmetry-invariant), so
    without canonicalization a model-identical fit can sit arbitrarily
    far from the certified parameter vector. Must be a pure jnp function
    of a 1-D beta (vmapped for batches); applied to the minimizer by
    curve_fit / curve_fit_batch after assembly.

    ``guess`` (optional) is a data-driven initializer ``guess(x, y) ->
    full beta start`` (batched over y's leading axes, jit/vmap-safe);
    when present, curve_fit / curve_fit_batch accept ``p0="auto"`` for
    this model the same way they do for the named CURVES entries
    (models/init.py). :func:`exp_sum_separable` wires the k-term
    Jacquelin integral regression here.
    """

    lin: Tuple[int, ...]
    nl: Tuple[int, ...]
    phi: Callable
    canonical: Optional[Callable] = None
    guess: Optional[Callable] = None

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


def canonical_sorted_exp_pairs(b):
    """Canonical representative for ``sum_j amp_j exp(-rate_j x)`` models
    with interleaved ``(amp, rate)`` pairs at indices (0,1), (2,3), ...:
    the terms permute freely; canonical = rates ascending."""
    amps, rates = b[0::2], b[1::2]
    order = jnp.argsort(rates)
    return jnp.stack([amps[order], rates[order]], axis=-1).reshape(-1)


def canonical_sorted_gauss_triples(b):
    """Canonical representative for sums of Gaussians with interleaved
    ``(amp, center, width)`` triples: widths appear squared (sign
    absorbed -> positive) and the terms permute freely (canonical =
    centers ascending)."""
    t = b.reshape(-1, 3)
    t = t.at[:, 2].set(jnp.abs(t[:, 2]))
    order = jnp.argsort(t[:, 1])
    return t[order].reshape(-1)


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
    # (width appears squared: canonical representative has b2 > 0)
    "gaussian": SeparableModel(
        (0,),
        (1, 2),
        lambda x, a: _col(jnp.exp(-((x - a[0]) ** 2) / (2.0 * a[1] ** 2))),
        canonical=lambda b: b.at[2].set(jnp.abs(b[2])),
    ),
    # b0 * x / (b1 + x): linear b0, nonlinear b1
    "michaelis_menten": SeparableModel(
        (0,), (1,), lambda x, a: _col(x / (a[0] + x))
    ),
}

def exp_sum_separable(k: int, *, t0=None, dt=None, m=None) -> SeparableModel:
    """Separable structure for the k-term exponential sum
    ``sum_j beta[2j] * exp(-beta[2j+1] * x)`` — the classic VarPro
    workload (multi-exponential decays: NMR relaxation, fluorescence
    lifetimes, pharmacokinetics; NIST Lanczos is k=3).

    Interleaved ``(amp, rate)`` parameter layout; the fitted vector is
    canonicalized to rates ascending (the terms permute freely). The
    linear dimension is p = k; the batched-safe MGS-QR coefficient
    route covers k <= 8 — ample, since beyond k ~ 4 the basis
    collinearity makes the *statistical* problem ill-posed long before
    the solver's limits.

    With ``t0``/``dt``/``m`` the basis is evaluated via the gridded-exp
    op (3 exps + power tables instead of m*k) on the uniform grid
    ``x_i = t0 + i*dt``; usable with curve_fit(_batch)(separable=True)
    like any other SeparableModel."""
    if k < 1:
        raise ValueError(f"exp_sum_separable needs k >= 1, got {k}")
    lin = tuple(range(0, 2 * k, 2))
    nl = tuple(range(1, 2 * k, 2))
    gridded = t0 is not None or dt is not None or m is not None
    if gridded:
        if t0 is None or dt is None or m is None:
            raise ValueError(
                "gridded exp_sum_separable needs all of t0, dt, m"
            )
        from ..ops.special import make_exp_grid

        e = make_exp_grid(float(t0), float(dt), int(m))
        phi = lambda x, a: jnp.stack([e(-a[j]) for j in range(k)], axis=-1)
    else:
        phi = lambda x, a: jnp.stack(
            [jnp.exp(-a[j] * x) for j in range(k)], axis=-1
        )
    guess = None
    if k <= 3:
        from .init import guess_exp_sum

        guess = lambda x, y: guess_exp_sum(x, y, k)
    return SeparableModel(lin, nl, phi, canonical_sorted_exp_pairs, guess)


def gauss_sum_separable(k: int) -> SeparableModel:
    """Separable structure for the k-peak Gaussian sum
    ``sum_j beta[3j] * exp(-(x - beta[3j+1])^2 / (2 beta[3j+2]^2))`` —
    the classic spectroscopy/peak-fitting workload (NIST Gauss1-3 are
    this shape plus an exponential background).

    Interleaved ``(amp, center, width)`` triples; the amplitudes are the
    VarPro-eliminated linear coefficients (p = k basis columns), the
    centers/widths the nonlinear parameters. The fitted vector is
    canonicalized to widths positive and centers ascending (the terms
    permute freely). Carries a ``guess`` hook (greedy peak extraction,
    models/init.guess_gauss_sum) so ``p0="auto"`` works in
    curve_fit / curve_fit_batch."""
    if k < 1:
        raise ValueError(f"gauss_sum_separable needs k >= 1, got {k}")
    lin = tuple(range(0, 3 * k, 3))
    nl = tuple(i for i in range(3 * k) if i % 3 != 0)

    def phi(x, a):
        mu, sig = a[0::2], a[1::2]
        d = x[..., :, None] - mu
        return jnp.exp(-(d * d) / (2.0 * sig * sig))

    from .init import guess_gauss_sum

    return SeparableModel(
        lin, nl, phi, canonical_sorted_gauss_triples,
        lambda x, y: guess_gauss_sum(x, y, k),
    )


# Named k-term entries so string-keyed curve_fit("exp_sum_3"/"gauss_sum_2"
# /"gauss_sum_3", ...) reaches the builders without importing them.
# exp_sum_2 is registered via the builder too (not a hand literal) so the
# SeparableModel OBJECT carries the guess hook — p0="auto" must work the
# same whether the user passes the name or SEPARABLE["exp_sum_2"] itself.
SEPARABLE["exp_sum_2"] = exp_sum_separable(2)
SEPARABLE["exp_sum_3"] = exp_sum_separable(3)
SEPARABLE["gauss_sum_2"] = gauss_sum_separable(2)
SEPARABLE["gauss_sum_3"] = gauss_sum_separable(3)


# Gridded-exp bases (uniform sample grid; see models/curves.py for the
# grid contract and ops/special.py for the evaluator).
_GRIDDED_SEPARABLE = (
    "exp_saturation", "exp_decay", "exp_sum_2", "exp_sum_3",
)


def gridded_separable(name: str, t0: float, dt: float, m: int) -> SeparableModel:
    """SEPARABLE entry with the basis evaluated via the gridded-exp op
    (3 exps + power tables instead of m) on the uniform grid
    ``x_i = t0 + i*dt``. Supported: exp_saturation, exp_decay,
    exp_sum_2."""
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
    elif name == "exp_sum_2":
        phi = lambda x, a: jnp.stack([e(-a[0]), e(-a[1])], axis=-1)
    elif name == "exp_sum_3":
        phi = lambda x, a: jnp.stack(
            [e(-a[0]), e(-a[1]), e(-a[2])], axis=-1
        )
    else:  # exp_decay

        def phi(x, a):
            col = e(-a[0])
            return jnp.stack([col, jnp.ones_like(col)], axis=-1)

    return SeparableModel(base.lin, base.nl, phi, base.canonical, base.guess)


def split_nl_bounds(sm: SeparableModel, lower, upper):
    """Validate full-``beta`` box bounds for a VarPro solve and slice
    them to the nonlinear subspace.

    The eliminated linear coefficients are solved in closed form,
    unconstrained — their bound components must be infinite (bounds on
    ``c`` would need an NNLS/BVLS inner solve, which defeats the
    closed-form elimination). Returns ``(lower_nl, upper_nl)`` with
    ``None`` for a side that is absent or fully infinite. Bounds must be
    concrete (they select the reduced problem's box at trace time)."""
    import numpy as np

    n = len(sm.lin) + len(sm.nl)

    def side(bound, name, fill):
        if bound is None:
            return None
        b = np.asarray(bound, np.float64)
        if b.shape != (n,):
            raise ValueError(
                f"{name} must be the FULL parameter vector of shape "
                f"({n},) for this separable model; got {b.shape}"
            )
        if not np.all(b[list(sm.lin)] == fill):
            raise ValueError(
                "separable=True supports bounds on the NONLINEAR "
                f"parameters only; {name} components at the linear "
                f"indices {sm.lin} must be {fill} (the closed-form "
                "coefficient solve is unconstrained)"
            )
        sub = b[list(sm.nl)]
        return None if np.all(sub == fill) else jnp.asarray(sub)

    return side(lower, "lower", -np.inf), side(upper, "upper", np.inf)


def _mgs_solve_clamped(P, y, floor2):
    """Least-squares ``argmin_c ||P c - y||`` via unrolled MGS QR with
    every R-diagonal division floored: ``R_jj = sqrt(||v||^2 + floor2)``.

    A VarPro-local variant of ``ops.linalg.unrolled_mgs_solve``. There, a
    degenerate column surfaces as NaN by design (solver/qr.py treats it
    as a signal); here the solve sits INSIDE the reduced residual that
    the outer optimizer differentiates, so a degenerate basis must stay
    finite all the way through — an inf/NaN primal or partial would
    poison the ``jnp.where`` fallback's reverse-mode cotangents
    (0 * inf = NaN through the unselected branch). The smooth floor also
    bounds d(sqrt)/dv at v = 0. Returns ``(c, rdiag2)`` with the
    *unfloored* squared R-diagonal for the caller's survival test."""
    n = P.shape[-1]
    q = []
    R = [[None] * n for _ in range(n)]
    rdiag2 = []
    for j in range(n):
        v = P[..., :, j]
        for i in range(j):
            R[i][j] = jnp.sum(q[i] * v, axis=-1)
            v = v - R[i][j][..., None] * q[i]
        for i in range(j):  # reorthogonalization ("twice is enough")
            c = jnp.sum(q[i] * v, axis=-1)
            R[i][j] = R[i][j] + c
            v = v - c[..., None] * q[i]
        s2 = jnp.sum(v * v, axis=-1)
        rdiag2.append(s2)
        R[j][j] = jnp.sqrt(s2 + floor2)
        q.append(v / R[j][j][..., None])
    bb = y
    z = []
    for j in range(n):  # progressive rhs deflation
        zj = jnp.sum(q[j] * bb, axis=-1)
        z.append(zj)
        bb = bb - zj[..., None] * q[j]
    x = [None] * n
    for j in reversed(range(n)):
        s = z[j]
        for k in range(j + 1, n):
            s = s - R[j][k] * x[k]
        x[j] = s / R[j][j]
    # bb is the deflated rhs y - Q Q'y == the least-squares residual,
    # computed WITHOUT the y - P@c cancellation (see reduced_residual).
    return jnp.stack(x, axis=-1), jnp.stack(rdiag2, axis=-1), bb


def _coefficients_and_residual(P, y):
    """Optimal linear coefficients ``c = argmin_c ||P c - y||`` AND the
    least-squares residual ``y - P c`` for a small (m, p) basis.

    Two routes, chosen per evaluation point by a scale-invariant
    survival test (cf. solver/qr.py):

      * **MGS QR** (error ~eps*cond(P)) when every orthogonalized column
        keeps at least ~10*p*eps of its original norm. On the collinear
        bases VarPro exists for (Lanczos-class exponential sums, rational
        denominators) the normal equations square the conditioning —
        forming G = P'P costs the very digits the reduced
        parameterization was supposed to save in f32. On this route the
        residual is the progressively-deflated rhs ``y - Q Q'y`` itself:
        no ``y - P @ c`` cancellation (which re-loses ~eps*cond digits
        even when c is accurate).
      * **Ridged normal equations** + the batched-safe unrolled Cholesky
        otherwise: a spectrally-scaled ridge (eps * mean diagonal of G,
        plus the dtype tiny) keeps a fully degenerate basis finite —
        coefficients fade to zero where the columns vanish, instead of
        0/0 NaN. The eps-relative bias on c is below the dtype's own
        dot-product rounding (~sqrt(m)*eps).

    The route test runs on a ``stop_gradient`` primal-only pass, and the
    differentiated QR runs on a *sanitized* input (``P`` replaced by an
    orthonormal basis wherever the QR route is not selected). Without
    that, a vanishing basis makes the floored ``R_jj`` denormal
    (~``sqrt(tiny*eps)``) and the tangents ``dv/R_jj`` overflow —
    ``inf - inf = NaN`` poisons jacfwd through the *unselected* branch
    even though the primal select is clean.

    A third, outermost select handles the *numerically dead* basis
    (mean squared column norm below ``tiny/eps^2``): there the ridge is
    dominated by ``tiny`` and even the safe route's derivative
    ``dc ~ db/ridge`` overflows (then ``P @ dc = 0 * inf = NaN``). The
    dead region returns ``c = 0, r = y`` with zero derivative — the
    exact limit of the ridged solve as the basis scale goes to 0 — and
    every differentiated solve runs on a sanitized (orthonormal)
    basis."""
    p = P.shape[-1]
    eps = jnp.finfo(P.dtype).eps
    tiny = jnp.finfo(P.dtype).tiny
    if p == 1:
        # Single-column fast path: at p = 1 the generic route below
        # simplifies exactly — the survival test is vacuous (one column
        # cannot lose norm to prior columns: rdiag2 == colnorm2, so
        # ``survive`` is always true when finite) and the probe pass is
        # bitwise the differentiated pass — so the whole machinery
        # (ridged-Cholesky arm + stop_gradient MGS probe + sanitized
        # differentiated MGS, ~16 m-length vector passes) collapses to
        # the 4-pass normalized projection below, with arithmetic
        # IDENTICAL to the MGS route's (same floored R, same deflated
        # residual — bitwise, so f32/f64 trajectories are unchanged).
        # The degenerate-basis contract is kept: a numerically dead
        # basis (phi -> 0) returns c = 0, r = y with finite derivatives;
        # the computing branch runs on a sanitized unit column wherever
        # dead, so no tangent can overflow through the unselected arm.
        phi = P[..., 0]
        n2_raw = jnp.sum(phi * phi, axis=-1)
        alive = jax.lax.stop_gradient(n2_raw) > tiny / (eps * eps)
        e0 = jnp.zeros(P.shape[-2], P.dtype).at[0].set(1.0)
        phi_s = jnp.where(alive[..., None], phi, e0)
        n2 = jnp.sum(phi_s * phi_s, axis=-1)
        floor2 = (eps * n2 + tiny) * eps
        R = jnp.sqrt(n2 + floor2)
        q = phi_s / R[..., None]
        z = jnp.sum(q * y, axis=-1)
        c1 = z / R
        r1 = y - z[..., None] * q
        c = jnp.where(alive, c1, jnp.zeros_like(c1))[..., None]
        r = jnp.where(alive[..., None], r1, y)
        return c, r
    eye = jnp.eye(P.shape[-2], p, dtype=P.dtype)
    scale2_raw = jnp.mean(jnp.sum(P * P, axis=-2), axis=-1)
    # Dead test: below this, ridge ~ tiny and 1/sqrt(ridge) overflows
    # downstream products; above it, eps*scale2 dominates and every
    # derivative stays finite (1/sqrt(tiny/eps) is comfortably inside
    # the dtype range).
    alive = jax.lax.stop_gradient(scale2_raw) > tiny / (eps * eps)
    P = jnp.where(alive[..., None, None], P, eye)
    G = P.T @ P
    b = P.T @ y
    ridge = eps * (jnp.trace(G) / p) + tiny
    c_safe = spd_chol_solve(G + ridge * jnp.eye(p, dtype=P.dtype), b)
    r_safe = y - jnp.einsum("...mp,...p->...m", P, c_safe)
    if p > 8:  # no unrolled QR past the VPU-unroll regime; curve-model
        zero = jnp.zeros_like(c_safe)  # bases are p <= 4 today
        return (jnp.where(alive[..., None], c_safe, zero),
                jnp.where(alive[..., None], r_safe, y))
    scale2 = jnp.trace(G) / p  # mean squared column norm
    floor2 = (eps * scale2 + tiny) * eps  # ~ (eps * colnorm)^2
    # Pass 1 (stop_gradient): route test on the true basis. No tangents
    # flow, so a degenerate basis cannot overflow any derivative here.
    Pg = jax.lax.stop_gradient(P)
    c_probe, rdiag2, r_probe = _mgs_solve_clamped(
        Pg, jax.lax.stop_gradient(y), jax.lax.stop_gradient(floor2))
    # Survival in squared form (no sqrt-at-zero in the backward pass):
    # column j survives if ||v_j||^2 > (10 p eps)^2 * ||P_j||^2.
    thr2 = (10.0 * p * eps) ** 2
    colnorm2 = jnp.sum(Pg * Pg, axis=-2)
    survive = jnp.all(rdiag2 > thr2 * colnorm2, axis=-1)
    ok = (survive
          & jnp.all(jnp.isfinite(c_probe), axis=-1)
          & jnp.all(jnp.isfinite(r_probe), axis=-1))
    # Pass 2 (differentiated): QR on the sanitized basis — orthonormal
    # columns wherever the QR route is not selected, so every primal AND
    # partial in the unselected branch is finite and moderate.
    P_in = jnp.where(ok[..., None, None], P, eye)
    f2_in = jnp.where(ok, floor2, eps * eps)
    c_qr, _, r_qr = _mgs_solve_clamped(P_in, y, f2_in)
    c = jnp.where(ok[..., None], c_qr, c_safe)
    r = jnp.where(ok[..., None], r_qr, r_safe)
    return (jnp.where(alive[..., None], c, jnp.zeros_like(c)),
            jnp.where(alive[..., None], r, y))


def _solve_coefficients(P, y):
    return _coefficients_and_residual(P, y)[0]


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
        return _coefficients_and_residual(P, y)[1]

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
        beta = beta.at[lin].set(c.astype(alpha.dtype)).at[nl].set(alpha)
        if sm.canonical is not None:
            beta = sm.canonical(beta)
        return beta

    return rec
