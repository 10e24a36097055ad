"""Result and trace types with Optim.jl-style reporting.

Counterpart of reference: src/types.jl:220-269 (LeastSquaresResult + show)
and src/utils/utils.jl:86-131 (OptimizationState/OptimizationTrace).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


class IsFiniteError(Exception):
    """Raised when the iterate becomes non-finite.

    Counterpart of the reference IsFiniteException
    (src/utils/utils.jl:63-78); under jit the condition is surfaced as a
    status code instead and only the host-level API raises.
    """

    def __init__(self, indices, kind: str = "equation"):
        self.indices = list(indices)
        self.kind = kind
        noun = "equation(s)" if kind == "equation" else "parameter(s)"
        super().__init__(
            "During the resolution of the non-linear system, the following "
            f"{noun} took a non-finite value: {self.indices}"
        )


@dataclasses.dataclass(frozen=True)
class OptimizationState:
    """One trace row (reference: src/utils/utils.jl:86-90)."""

    iteration: int
    value: float
    g_norm: float

    def __str__(self):
        return f"{self.iteration:6d}   {self.value:14e}   {self.g_norm:14e}\n"


@dataclasses.dataclass(frozen=True)
class OptimizationTrace:
    """Sequence of trace rows (reference: src/utils/utils.jl:92-131)."""

    states: List[OptimizationState]

    def __len__(self):
        return len(self.states)

    def __getitem__(self, i):
        return self.states[i]

    def __str__(self):
        out = [
            "Iter     Function value   Gradient norm \n",
            "------   --------------   --------------\n",
        ]
        out += [str(s) for s in self.states]
        return "".join(out)


def trace_from_array(arr) -> OptimizationTrace:
    """Convert the fixed-size on-device trace buffer into host rows."""
    states = []
    arr = np.asarray(arr)
    for row in arr:
        if np.isnan(row[1]):
            continue
        states.append(
            OptimizationState(int(row[0]), float(row[1]), float(row[2]))
        )
    return OptimizationTrace(states)


@dataclasses.dataclass(frozen=True)
class LeastSquaresResult:
    """Solve report (reference: src/types.jl:220-246)."""

    optimizer: str
    minimizer: np.ndarray
    ssr: float
    iterations: int
    converged: bool
    x_converged: bool
    x_tol: float
    f_converged: bool
    f_tol: float
    g_converged: bool
    g_tol: float
    tr: OptimizationTrace
    f_calls: int
    g_calls: int
    mul_calls: int
    jacobian: Optional[np.ndarray] = None
    # Stop reason (istop, Paige-Saunders taxonomy 1..7) of the last inner
    # LSMR solve; -1 for direct QR/Cholesky solves. istop in {3, 6, 7}
    # means the inner solver hit its conditioning limit or iteration cap —
    # the reference exposes the same via ConvergenceHistory
    # (src/utils/lsmr.jl:9-14,234-237).
    inner_istop: int = -1
    # Projected-gradient max at the last linearization point (the value
    # the g_tol KKT test saw) — the stationarity quality of the stop;
    # NaN when no iteration ran. Useful for telling a converged basin
    # from a flat-valley stop on rounding-level ssr ties (the measured
    # basis of best_of_raw's ssr_rtol tie-break).
    maxabs_gr: float = float("nan")

    def __repr__(self):
        status = (
            "success"
            if self.converged
            else "failure (reached maximum number of iterations)"
        )
        cmp = lambda b: "<=" if b else ">"
        return (
            "Results of Optimization Algorithm\n"
            f" * Status: {status}\n\n"
            " * Candidate solution\n"
            f"    Final objective value:     {self.ssr:.6e}\n\n"
            " * Found with\n"
            f"    Algorithm:     {self.optimizer}\n\n"
            " * Convergence measures\n"
            f"    |x - x'|               {cmp(self.x_converged)} {self.x_tol:.1e}\n"
            f"    |f(x) - f(x')| / |f(x)| {cmp(self.f_converged)} {self.f_tol:.1e}\n"
            f"    |g(x)|                 {cmp(self.g_converged)} {self.g_tol:.1e}\n\n"
            " * Work counters\n"
            f"    Iterations:    {self.iterations}\n"
            f"    f(x) calls:    {self.f_calls}\n"
            f"    J(x) calls:    {self.g_calls}\n"
            f"    mul calls:     {self.mul_calls}\n"
            + (
                f"    inner istop:   {self.inner_istop}"
                f"{' (not converged)' if self.inner_istop in (3, 6, 7) else ''}\n"
                if self.inner_istop >= 0
                else ""
            )
        )


def converged(r: LeastSquaresResult) -> bool:
    """Reference: src/types.jl:243-245."""
    return r.x_converged or r.f_converged or r.g_converged


def _host_jacobian(j):
    """Final Jacobian for the host result: dense arrays come back as numpy;
    sparse BCOO Jacobians are returned as-is (pattern + data)."""
    if j is None:
        return None
    if hasattr(j, "todense"):  # BCOO
        return j
    return np.asarray(j)


def result_from_raw(raw, opts) -> LeastSquaresResult:
    """Materialize a host-side result from the raw on-device pytree."""
    minimizer = np.asarray(raw["minimizer"])
    if int(np.asarray(raw["status"])) != 0:
        # The indices are of the non-finite *parameters* (the jit-safe loop
        # carries only the iterate; the reference's per-equation indices,
        # src/utils/utils.jl:63-78, come from its host-side residual check).
        bad = [int(i) for i in np.flatnonzero(~np.isfinite(minimizer))]
        raise IsFiniteError(bad, kind="parameter")
    return LeastSquaresResult(
        # "optimizer" is injected by the host verbs; raw pytrees straight
        # from solve/solve_batch/best_of_raw don't carry it.
        optimizer=raw.get("optimizer", "unknown"),
        minimizer=minimizer,
        ssr=float(np.asarray(raw["ssr"])),
        iterations=int(np.asarray(raw["iterations"])),
        converged=bool(np.asarray(raw["converged"])),
        x_converged=bool(np.asarray(raw["x_converged"])),
        x_tol=opts.x_tol,
        f_converged=bool(np.asarray(raw["f_converged"])),
        f_tol=opts.f_tol,
        g_converged=bool(np.asarray(raw["g_converged"])),
        g_tol=opts.g_tol,
        tr=trace_from_array(raw["trace"]),
        f_calls=int(np.asarray(raw["f_calls"])),
        g_calls=int(np.asarray(raw["g_calls"])),
        mul_calls=int(np.asarray(raw["mul_calls"])),
        jacobian=_host_jacobian(raw["jacobian"]),
        inner_istop=int(np.asarray(raw.get("inner_istop", -1))),
        maxabs_gr=float(np.asarray(raw.get("maxabs_gr", np.nan))),
    )
