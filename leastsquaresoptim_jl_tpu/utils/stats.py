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


def covariance(result, m: int | None = None) -> np.ndarray:
    """Gauss-Newton parameter covariance s^2 (J'J)^{-1} at the minimizer.

    ``m`` overrides the residual count (defaults to the Jacobian's row
    count). Uses a pseudo-inverse when J'J is singular; the variance of
    unidentifiable directions comes out of the pseudo-inverse's null-space
    handling (finite but meaningless — check the rank warning case).
    """
    J = _final_jacobian(result)
    rows, n = J.shape
    if m is None:
        m = rows
    dof = max(m - n, 1)
    s2 = result.ssr / dof
    gram = J.T @ J
    try:
        cov = np.linalg.inv(gram)
    except np.linalg.LinAlgError:
        cov = np.linalg.pinv(gram)
    return s2 * cov


def standard_errors(result, m: int | None = None) -> np.ndarray:
    """Per-parameter standard errors: sqrt(diag(covariance))."""
    d = np.diag(covariance(result, m=m))
    return np.sqrt(np.maximum(d, 0.0))
