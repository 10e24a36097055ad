"""LSMR core: Golub-Kahan bidiagonalization for min ||Ax - b||^2 + lam^2||x||^2.

TPU-native counterpart of reference: src/utils/lsmr.jl:53-238 (itself a port
of the Stanford SOL MATLAB code, Fong & Saunders 2011). Implemented as a
single ``lax.while_loop`` whose carry holds the bidiagonalization vectors and
the scalar rotation cascade; per iteration there are exactly two operator
applications (matvec / rmatvec) and two norms — under residual-row sharding
these become the only collective points (see parallel/sharded.py).

Genericity: the operator's *range* space ("u-space") may be any pytree, not
just a flat vector. The damped LM system [J; diag(d)] x = [y; 0] is then just
an operator returning a ``(residual_part, damp_part)`` tuple — the TPU-native
analogue of the reference's DampenedMatrix/DampenedVector wrappers
(reference: src/solver/iterative_lsmr.jl:61-109), with no materialized stack.

The seven stopping rules istop ∈ 1..7 mirror Paige-Saunders exactly
(reference: src/utils/lsmr.jl:224-231); "converged" means istop ∉ {3, 6, 7}
(reference: lsmr.jl:234).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import tree_util as jtu


def _t_scale(a, x):
    return jtu.tree_map(lambda xi: a * xi, x)


def _t_axpy(a, x, y):
    """a * x + y, leafwise."""
    return jtu.tree_map(lambda xi, yi: a * xi + yi, x, y)


def _t_normsq(x):
    return jtu.tree_reduce(
        lambda acc, leaf: acc + jnp.sum(leaf * leaf),
        x,
        jnp.zeros((), dtype=jnp.result_type(*jtu.tree_leaves(x))),
    )


def _t_norm(x):
    return jnp.sqrt(_t_normsq(x))


class LSMRStats(NamedTuple):
    """Counterpart of the reference ConvergenceHistory (lsmr.jl:9-14)."""

    converged: jnp.ndarray  # bool: istop not in (3, 6, 7)
    istop: jnp.ndarray      # int32 stopping rule index (0 = never entered loop)
    iterations: jnp.ndarray # int32
    mvps: jnp.ndarray       # int32, = 2 * iterations (lsmr.jl:236)
    normr: jnp.ndarray      # final ||r|| estimate
    normar: jnp.ndarray     # final ||A'r|| estimate


def lsmr(
    matvec: Callable[[jnp.ndarray], Any],
    rmatvec: Callable[[Any], jnp.ndarray],
    b: Any,
    x0: jnp.ndarray,
    *,
    maxiter: int,
    atol: float = 1e-6,
    btol: float = 1e-6,
    conlim: float = 1e8,
    lam: float = 0.0,
):
    """Solve min ||A x - b||^2 + lam^2 ||x||^2 iteratively.

    ``matvec(v)`` maps a flat (n,) vector into u-space (any pytree);
    ``rmatvec(u)`` maps u-space back to a flat (n,) vector. ``maxiter`` must
    be static (reference default: max(m, n), lsmr.jl:55).

    Returns ``(x, LSMRStats)``.
    """
    x0 = jnp.asarray(x0)
    dt = x0.dtype
    lam = jnp.asarray(lam, dt)
    atol = jnp.asarray(atol, dt)
    btol = jnp.asarray(btol, dt)
    ctol = jnp.where(conlim > 0, 1.0 / jnp.asarray(conlim, dt), jnp.zeros((), dt))

    # First bidiagonalization vectors: beta*u = b - A x0, alpha*v = A'u
    # (reference: lsmr.jl:73-78).
    u = _t_axpy(jnp.asarray(-1.0, dt), matvec(x0), b)
    beta = _t_norm(u)
    u = _t_scale(jnp.where(beta > 0, 1.0 / beta, 0.0), u)
    v = rmatvec(u)
    alpha = _t_norm(v)
    v = v * jnp.where(alpha > 0, 1.0 / alpha, 0.0)

    zetabar = alpha * beta
    normb = beta
    normar0 = zetabar

    one = jnp.ones((), dt)
    zero = jnp.zeros((), dt)

    carry = dict(
        it=jnp.int32(0),
        istop=jnp.int32(0),
        x=x0,
        u=u,
        v=v,
        h=v,
        hbar=jnp.zeros_like(x0),
        alpha=alpha,
        alphabar=alpha,
        beta=beta,
        rho=one,
        rhobar=one,
        cbar=one,
        sbar=zero,
        zeta=zero,
        zetabar=zetabar,
        # ||r|| estimation cascade (lsmr.jl:92-99)
        betadd=beta,
        betad=zero,
        rhodold=one,
        tautildeold=zero,
        thetatilde=zero,
        dd=zero,
        # ||A||, cond(A) estimation (lsmr.jl:101-105)
        norma2=alpha * alpha,
        maxrbar=zero,
        # reference initializes minrbar = 1e100 (lsmr.jl:105); clamp to the
        # dtype's max so f32 runs don't overflow to inf in the cast
        minrbar=jnp.asarray(min(1e100, float(jnp.finfo(dt).max) / 16), dt),
        normr=beta,
        normar=zetabar,
    )

    def cond_fn(c):
        return (c["istop"] == 0) & (normar0 != 0) & (c["it"] < maxiter)

    def body_fn(c):
        it = c["it"] + 1
        # --- bidiagonalization step (lsmr.jl:118-125) ---
        u_new = _t_axpy(-c["alpha"], c["u"], matvec(c["v"]))
        beta = _t_norm(u_new)
        has_beta = beta > 0
        u = _t_scale(jnp.where(has_beta, 1.0 / beta, 0.0), u_new)
        v_new = rmatvec(u) - beta * c["v"]
        alpha_new = jnp.linalg.norm(v_new)
        v_cand = v_new * jnp.where(alpha_new > 0, 1.0 / alpha_new, 0.0)
        v = jnp.where(has_beta, v_cand, c["v"])
        alpha = jnp.where(has_beta, alpha_new, c["alpha"])

        # --- rotation Qhat (regularization lam) (lsmr.jl:127-130) ---
        alphahat = jnp.sqrt(c["alphabar"] ** 2 + lam**2)
        chat = c["alphabar"] / alphahat
        shat = lam / alphahat

        # --- rotation Q_i: B_i -> R_i (lsmr.jl:132-138) ---
        rhoold = c["rho"]
        rho = jnp.sqrt(alphahat**2 + beta**2)
        cr = alphahat / rho
        sr = beta / rho
        thetanew = sr * alpha
        alphabar = cr * alpha

        # --- rotation Qbar_i: R_i -> Rbar_i (lsmr.jl:140-149) ---
        rhobarold = c["rhobar"]
        zetaold = c["zeta"]
        thetabar = c["sbar"] * rho
        rhotemp = c["cbar"] * rho
        rhobar = jnp.sqrt((c["cbar"] * rho) ** 2 + thetanew**2)
        cbar = c["cbar"] * rho / rhobar
        sbar = thetanew / rhobar
        zeta = cbar * c["zetabar"]
        zetabar = -sbar * c["zetabar"]

        # --- update h, hbar, x (lsmr.jl:151-156) ---
        hbar = c["h"] + (-thetabar * rho / (rhoold * rhobarold)) * c["hbar"]
        x = c["x"] + (zeta / (rho * rhobar)) * hbar
        h = v + (-thetanew / rho) * c["h"]

        # --- ||r|| estimate (lsmr.jl:158-184) ---
        betaacute = chat * c["betadd"]
        betacheck = -shat * c["betadd"]
        betahat = cr * betaacute
        betadd = -sr * betaacute
        thetatildeold = c["thetatilde"]
        rhotildeold = jnp.sqrt(c["rhodold"] ** 2 + thetabar**2)
        ctildeold = c["rhodold"] / rhotildeold
        stildeold = thetabar / rhotildeold
        thetatilde = stildeold * rhobar
        rhodold = ctildeold * rhobar
        betad = -stildeold * c["betad"] + ctildeold * betahat
        tautildeold = (zetaold - thetatildeold * c["tautildeold"]) / rhotildeold
        taud = (zeta - thetatilde * tautildeold) / rhodold
        dd = c["dd"] + betacheck**2
        normr = jnp.sqrt(dd + (betad - taud) ** 2 + betadd**2)

        # --- ||A|| and cond(A) estimates (lsmr.jl:186-196) ---
        norma2 = c["norma2"] + beta**2
        norma = jnp.sqrt(norma2)
        norma2 = norma2 + alpha**2
        maxrbar = jnp.maximum(c["maxrbar"], rhobarold)
        minrbar = jnp.where(it > 1, jnp.minimum(c["minrbar"], rhobarold), c["minrbar"])
        conda = jnp.maximum(maxrbar, rhotemp) / jnp.minimum(minrbar, rhotemp)

        # --- stopping rules (lsmr.jl:204-231) ---
        normar = jnp.abs(zetabar)
        normx = jnp.linalg.norm(x)
        test1 = normr / normb
        test2 = normar / (norma * normr)
        test3 = 1.0 / conda
        t1 = test1 / (1.0 + norma * normx / normb)
        rtol = btol + atol * norma * normx / normb
        # Priority follows the reference's break order: 7 strongest, 1 weakest.
        istop = jnp.int32(0)
        istop = jnp.where(test1 <= rtol, jnp.int32(1), istop)
        istop = jnp.where(test2 <= atol, jnp.int32(2), istop)
        istop = jnp.where(test3 <= ctol, jnp.int32(3), istop)
        istop = jnp.where(1.0 + t1 <= 1.0, jnp.int32(4), istop)
        istop = jnp.where(1.0 + test2 <= 1.0, jnp.int32(5), istop)
        istop = jnp.where(1.0 + test3 <= 1.0, jnp.int32(6), istop)
        istop = jnp.where(it >= maxiter, jnp.int32(7), istop)

        return dict(
            it=it, istop=istop, x=x, u=u, v=v, h=h, hbar=hbar,
            alpha=alpha, alphabar=alphabar, beta=beta, rho=rho, rhobar=rhobar,
            cbar=cbar, sbar=sbar, zeta=zeta, zetabar=zetabar,
            betadd=betadd, betad=betad, rhodold=rhodold,
            tautildeold=tautildeold, thetatilde=thetatilde, dd=dd,
            norma2=norma2, maxrbar=maxrbar, minrbar=minrbar,
            normr=normr, normar=normar,
        )

    out = jax.lax.while_loop(cond_fn, body_fn, carry)
    istop = out["istop"]
    converged = (istop != 3) & (istop != 6) & (istop != 7)
    stats = LSMRStats(
        converged=converged,
        istop=istop,
        iterations=out["it"],
        mvps=2 * out["it"],
        normr=out["normr"],
        normar=out["normar"],
    )
    return out["x"], stats
