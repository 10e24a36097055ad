"""Post-fit statistics: parameter covariance and standard errors.

Not in the reference (it reports only the minimizer/ssr); standard
regression output (scipy.optimize.curve_fit's pcov). Gauss-Newton
covariance at the minimizer:

    cov = s^2 (J'J)^{-1},   s^2 = ssr / (m - n)

computed from the final Jacobian the solver already carries in the result.
Singular/rank-deficient J'J yields a pseudo-inverse-based covariance with
infinite variance flagged on the null-space directions.
"""

from __future__ import annotations

import numpy as np

__all__ = ["covariance", "standard_errors"]


def _final_jacobian(result):
    J = result.jacobian
    if J is None:
        raise ValueError(
            "result carries no Jacobian (matrix-free solve); re-run with "
            "materialize_jacobian=True to get covariance estimates"
        )
    if hasattr(J, "todense"):  # BCOO
        J = J.todense()
    return np.asarray(J)


def covariance(result, m: int | None = None, problem=None) -> np.ndarray:
    """Gauss-Newton parameter covariance s^2 (J'J)^{-1} at the minimizer.

    ``m`` overrides the residual count (defaults to the Jacobian's row
    count). ``problem`` (optional LeastSquaresProblem) re-linearizes at
    ``result.minimizer``; without it the solver's carried Jacobian is used,
    which was evaluated at the last *accepted linearization point* — one
    accepted step before the minimizer (negligible at tight tolerances,
    stale when the solve stopped on the iteration cap).

    Rank deficiency is detected via the eigendecomposition (np.linalg.inv
    silently returns garbage on numerically singular grams): unidentifiable
    directions get **infinite variance** rather than a fake finite one.
    """
    if problem is not None:
        import jax
        import jax.numpy as jnp
        from jax.flatten_util import ravel_pytree

        # optimize_problem returns structured (pytree) minimizers for pytree
        # parameters, but jac_fn works in the flat vector space: re-ravel.
        x_flat, _ = ravel_pytree(
            jax.tree_util.tree_map(jnp.asarray, result.minimizer)
        )
        J = problem.jac_fn(x_flat)
        if hasattr(J, "todense"):
            J = J.todense()
        J = np.asarray(J)
    else:
        J = _final_jacobian(result)
    J = J.astype(np.float64)  # f32 solves still get f64-accurate statistics
    rows, n = J.shape
    if m is None:
        m = rows
    if m <= n:
        # No residual degrees of freedom: s^2 = ssr/(m-n) is undefined and
        # any finite covariance would be confidently wrong. Same philosophy
        # as the rank handling below — unidentifiable => infinite variance
        # (scipy.optimize.curve_fit returns inf pcov here too).
        return np.full((n, n), np.inf)
    dof = m - n
    s2 = float(result.ssr) / dof
    gram = J.T @ J
    # Equilibrate before the eigendecomposition: the rank test must see the
    # *correlation* conditioning, not the column scaling (a badly scaled but
    # perfectly identifiable fit would otherwise trip the null threshold).
    d = np.sqrt(np.diag(gram))
    s = 1.0 / np.where(d > 0, d, 1.0)  # zero columns keep unit scale
    gs = gram * s[:, None] * s[None, :]
    w, V = np.linalg.eigh(gs)
    null = w <= np.max(np.abs(w)) * n * np.finfo(np.float64).eps
    # Pseudo-inverse body (null directions contribute 0, not inf — an
    # inf eigenvalue would flood every entry with inf/NaN cross-terms,
    # destroying the identifiable parameters' covariances too).
    inv_w = np.where(null, 0.0, 1.0 / np.where(null, 1.0, w))
    cov = s2 * (s[:, None] * ((V * inv_w[None, :]) @ V.T) * s[None, :])
    if np.any(null):
        # Flag unidentifiable parameters: infinite variance on exactly the
        # coordinates with significant null-space eigenvector mass.
        proj = (V[:, null] ** 2).sum(axis=1)
        idx = np.where(proj > n * np.finfo(np.float64).eps)[0]
        cov[idx, idx] = np.inf
    return cov


def standard_errors(result, m: int | None = None, problem=None) -> np.ndarray:
    """Per-parameter standard errors: sqrt(diag(covariance)).

    Unidentifiable parameters come back as ``inf`` (see covariance)."""
    d = np.diag(covariance(result, m=m, problem=problem))
    return np.sqrt(np.maximum(d, 0.0))
