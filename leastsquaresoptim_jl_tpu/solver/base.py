"""Solver tags and default-selection rules.

Mirrors the reference's solver tag types and defaults
(reference: src/types.jl:78-127):

  QR()       — dense QR solve of min ||J dx - y|| (stacked [J; diag(sqrt d)]
               for the damped LM system).
  Cholesky() — normal-equations solve of (J'J [+ diag(d)]) dx = J'y.
  LSMR(...)  — matrix-free Golub-Kahan iteration with a Jacobi
               (column-norm) preconditioner, user-overridable.

Default rules (reference: src/types.jl:113-127):
  * materialized (dense) Jacobian  -> QR
  * matrix-free problem            -> LSMR
  * solver LSMR -> default optimizer LevenbergMarquardt, else Dogleg.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


class AbstractSolver:
    pass


@dataclasses.dataclass(frozen=True)
class QR(AbstractSolver):
    """Dense QR solver tag (reference: src/solver/dense_qr.jl).

    The reference uses LAPACK's *column-pivoted* QR (geqp3); XLA's QR is
    unpivoted, so rank-deficient systems are covered by a fallback taken
    only when the scale-invariant survival test flags (near-)singularity
    (see solver/qr.py). ``rank_policy`` selects the fallback:

    * ``"jitter"`` (default) — scaled-Tikhonov normal equations: fast,
      batched-cheap, bounded step. With non-uniform per-column jitter the
      step can pick up an O(1) component in null(J) that pivoted geqp3
      would have truncated.
    * ``"truncate"`` — SVD pseudoinverse with singular values below
      ``max(m, n) * eps * smax`` cut: the minimum-norm Gauss-Newton step,
      matching the reference's pivoted-QR trailing-block truncation
      semantics (reference: dense_qr.jl:37, LAPACK geqp3 + triangular
      solve on the surviving leading block). Costs an SVD per fallback
      hit; opt-in because the SVD also compiles into the lax.cond branch
      of every solve.
    """

    rank_policy: str = "jitter"

    def __post_init__(self):
        if self.rank_policy not in ("jitter", "truncate"):
            raise ValueError(
                f"rank_policy must be 'jitter' or 'truncate', "
                f"got {self.rank_policy!r}"
            )


@dataclasses.dataclass(frozen=True)
class Cholesky(AbstractSolver):
    """Normal-equations Cholesky solver tag (reference: src/solver/dense_cholesky.jl)."""


@dataclasses.dataclass(frozen=True)
class BlockCholesky(AbstractSolver):
    """Block-tridiagonal normal-equations direct solver (ops/block_tridiag.py).

    For problems whose Gram matrix ``J'J`` is block-tridiagonal with
    square blocks of ``block_size`` — 1-D BVP/chain models where residual
    i couples only neighboring parameter blocks (MINPACK
    broyden_tridiagonal/banded, discrete_boundary_value...). The TPU-native
    replacement for the reference's sparse-CSC direct factorizations
    (reference: test/nonlinearsolvers.jl:539-570 exercises Julia's
    SuiteSparse ``\\`` on such Jacobians): the banded Gram is recovered
    EXACTLY with 3*block_size structured probe matvec-pairs (no
    materialized J needed — works matrix-free at n where LSMR is
    otherwise the only option) and factored by a `lax.scan` of dense
    (s, s) Cholesky steps.

    Per solve: 6*block_size + 2 matvecs + O((n/s) * s^3) factor flops —
    a fixed price vs LSMR's conditioning-dependent iteration count
    (measured crossover: benchmarks/bench_block_cholesky.py).

    Contract: the declared structure must hold (a wider true coupling
    aliases into the recovered blocks silently); ``block_size`` must
    divide n. Semidefinite Grams get the same scale-invariant jittered
    retry as the dense Cholesky route.

    ``method``: "scan" — sequential blocked LBL' Cholesky (banded
    pbtrf shape; lowest flops, nb sequential steps); "cr" — block
    cyclic reduction (ceil(log2 nb) fully batched elimination levels,
    ~2x the flops — the TPU-native shape at large nb, where the scan's
    tiny sequential steps are latency-bound); "auto" (default) — cr
    above 64 block rows.
    """

    block_size: int = 1
    method: str = "auto"

    def __post_init__(self):
        if self.block_size < 1:
            raise ValueError(
                f"block_size must be >= 1, got {self.block_size}"
            )
        if self.method not in ("auto", "scan", "cr"):
            raise ValueError(
                f"method must be 'auto', 'scan' or 'cr', got {self.method!r}"
            )


@dataclasses.dataclass(frozen=True)
class LSMR(AbstractSolver):
    """Matrix-free LSMR solver tag (reference: src/solver/iterative_lsmr.jl).

    ``preconditioner`` — optional callable ``(op, damp) -> p`` (the
    current linear operator and the damping vector, or ``None`` on the
    undamped Gauss-Newton path) returning the *diagonal* of a right
    preconditioner P^{-1} (the solver iterates on A P^{-1}; reference:
    PreconditionedMatrix, iterative_lsmr.jl:12-51). Defaults to the Jacobi preconditioner
    1/sqrt(colsumabs2(J) + damp) (reference: iterative_lsmr.jl:129-141).
    ``maxiter`` — optional cap on inner iterations (default max(m, n),
    reference: src/utils/lsmr.jl:55).
    ``conlim`` — condition-number limit triggering istop=3 (default 1e8,
    reference: src/utils/lsmr.jl:54); the inner stop reason is surfaced in
    the result as ``inner_istop`` (reference ConvergenceHistory,
    src/utils/lsmr.jl:9-14).
    """

    preconditioner: Optional[Callable] = None
    maxiter: Optional[int] = None
    conlim: Optional[float] = None

    def __hash__(self):
        return hash((LSMR, self.preconditioner, self.maxiter, self.conlim))


def default_solver(solver: Optional[AbstractSolver], problem) -> AbstractSolver:
    """Reference: src/types.jl:113-121 — dense Jacobian -> QR, anything else
    (sparse, matrix-free) -> LSMR; QR with a sparse Jacobian is rejected
    (reference: src/types.jl:114-118), and so is Cholesky (the reference has
    no sparse-Cholesky method either, see SURVEY.md C9)."""
    sparse = getattr(problem, "jacobian_is_sparse", False)
    if solver is not None:
        if isinstance(solver, QR) and not problem.materialize_jacobian:
            raise ValueError(
                "solver QR() is not available for matrix-free problems. "
                "Choose LSMR()"
            )
        if isinstance(solver, Cholesky) and not problem.materialize_jacobian:
            raise ValueError(
                "solver Cholesky() is not available for matrix-free problems. "
                "Choose LSMR()"
            )
        if isinstance(solver, (QR, Cholesky)) and sparse:
            raise ValueError(
                f"solver {type(solver).__name__}() is not available for "
                "sparse Jacobians. Choose LSMR()"
            )
        return solver
    if problem.materialize_jacobian and not sparse:
        return QR()
    return LSMR()
