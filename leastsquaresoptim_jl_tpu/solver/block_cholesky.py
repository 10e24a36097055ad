"""Block-tridiagonal normal-equations solver (the BlockCholesky tag).

TPU-native direct route for banded Grams — the structured-sparse
counterpart of solver/cholesky.py, covering the capability the reference
gets from Julia's sparse-CSC ``\\`` factorizations
(reference: test/nonlinearsolvers.jl:539-570) for the banded subclass.
Works on any operator (materialized or matrix-free): the Gram blocks are
recovered exactly with 3s probe matvec-pairs, then factored/solved by
`lax.scan`s of dense (s, s) steps (ops/block_tridiag.py).

Solve protocol (solver/__init__.solver_fns): both arities return
``(dx, mvps)`` with mvps = the reference's matvec accounting — 2 per
probe pair, +1 for the J'y rhs.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.block_tridiag import (
    _CYCLIC_REDUCTION_MIN_NB,
    probe_gram_blocks,
    probe_gram_soa,
    solve_block_tridiag_spd,
    solve_block_tridiag_spd_soa,
)


def _solve(op, y, damp, block_size: int, method: str):
    rhs = op.rmatvec(y)
    n, s = op.n, block_size
    nb = n // s if s > 0 and n % s == 0 else None
    if method == "auto":
        method = (
            "cr" if nb is not None and nb > _CYCLIC_REDUCTION_MIN_NB
            else "scan"
        )
    if method == "cr" and s <= 2:
        # SoA hot path: block components read straight from the probe
        # responses — the (nb, s, s) intermediate's tile padding on the
        # tiny minor dims costs more HBM traffic than the whole solve
        # (ops/block_tridiag.extract_blocks_soa).
        Dv, Lv = probe_gram_soa(
            op.matvec, op.rmatvec, n, s, rhs.dtype, damp=damp
        )
        dx = solve_block_tridiag_spd_soa(Dv, Lv, rhs, n // s, s)
    else:
        D, L = probe_gram_blocks(
            op.matvec, op.rmatvec, n, s, rhs.dtype, damp=damp
        )
        dx = solve_block_tridiag_spd(D, L, rhs, method=method)
    return dx, jnp.int32(6 * block_size + 1)


def solve_gn(op, y, block_size: int, method: str = "auto"):
    """(J'J) dx = J'y via block-tridiagonal probing + blocked solve."""
    return _solve(op, y, None, block_size, method)


def solve_damped(op, y, damp, block_size: int, method: str = "auto"):
    """(J'J + diag(damp)) dx = J'y — the damped LM arity."""
    return _solve(op, y, damp, block_size, method)
