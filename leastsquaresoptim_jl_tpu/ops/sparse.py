"""Sparse (BCOO) Jacobian support.

TPU-native counterpart of the reference's sparse-CSC Jacobian axis:
pattern-preserving in-place updates (reference: src/utils/utils.jl:146-161,
test/nonlinearleastsquares.jl:47-86). CSC does not map to the MXU, so the
representation here is ``jax.experimental.sparse.BCOO`` with a *static*
pattern — the (nse, 2) index array is a compile-time constant and only the
``data`` vector flows through the solve loop, exactly the reference's
"symbolic pattern fixed, write into nonzeros(J)" contract.

Beyond the user-supplied analytic sparse ``g`` the reference requires, this
module adds what ForwardDiff cannot do there: **compressed AD** — greedy
column coloring of the sparsity pattern so the whole Jacobian is recovered
from ``ncolors`` JVPs (vmapped into one batched evaluation) instead of ``n``.
For banded MINPACK problems (broyden_tridiagonal/banded) that is 3-7 JVPs
regardless of n.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse

BCOO = jsparse.BCOO


def is_sparse(J) -> bool:
    return isinstance(J, jsparse.JAXSparse)


def colsumabs2_bcoo(J: BCOO) -> jnp.ndarray:
    """diag(J'J) for a BCOO matrix (reference: colsumabs2! for sparse CSC,
    src/utils/utils.jl:146-151): one segment-sum over the nonzeros."""
    cols = J.indices[:, 1]
    return jax.ops.segment_sum(
        J.data * J.data, cols, num_segments=J.shape[1]
    )


def color_columns(indices: np.ndarray, n: int) -> np.ndarray:
    """Greedy distance-1 column coloring of a sparsity pattern.

    Two columns conflict when they share a residual row (their entries would
    overlap in a compressed JVP). Returns an (n,) int array of colors such
    that every color class can be probed by a single JVP seed.
    """
    indices = np.asarray(indices)
    cols_by_row: dict[int, list[int]] = {}
    for r, c in indices:
        cols_by_row.setdefault(int(r), []).append(int(c))
    neighbors: list[set] = [set() for _ in range(n)]
    for cols in cols_by_row.values():
        for c in cols:
            neighbors[c].update(cols)
    colors = np.full(n, -1, dtype=np.int64)
    for c in range(n):
        used = {colors[o] for o in neighbors[c] if colors[o] >= 0}
        color = 0
        while color in used:
            color += 1
        colors[c] = color
    return colors


def sparse_jacobian(
    residual_fn: Callable,
    indices: Sequence[Sequence[int]],
    m: int,
    n: int,
) -> Callable:
    """Build ``jac_fn(x) -> BCOO`` from a residual and a static pattern.

    Compressed forward-mode AD: columns are greedily colored so that
    ``ncolors`` JVPs (one vmapped batch) recover every stored entry —
    exact derivatives, pattern-preserving, MXU-batched. This replaces the
    reference's requirement that sparse users hand-write ``g!``
    (test/nonlinearleastsquares.jl:47-86) while keeping that option open
    (pass an analytic BCOO-returning ``g`` to the problem instead).
    """
    idx = np.asarray(indices, dtype=np.int64)
    if idx.ndim != 2 or idx.shape[1] != 2:
        raise ValueError(f"indices must be (nse, 2), got {idx.shape}")
    if idx.size and (
        idx.min() < 0 or idx[:, 0].max() >= m or idx[:, 1].max() >= n
    ):
        raise ValueError(f"indices out of bounds for a ({m}, {n}) Jacobian")
    # Sort row-major and reject duplicates so the BCOO flags below are true
    # (sparse kernels exploit them; a false promise is silent corruption).
    order = np.lexsort((idx[:, 1], idx[:, 0]))
    idx = idx[order]
    if idx.shape[0] > 1 and np.any(np.all(np.diff(idx, axis=0) == 0, axis=1)):
        raise ValueError("duplicate (row, col) entries in sparsity pattern")
    colors = color_columns(idx, n)
    ncolors = int(colors.max()) + 1 if len(colors) else 1
    # Seed matrix: seeds[c] = sum of unit vectors of columns with color c.
    seeds_np = np.zeros((ncolors, n))
    seeds_np[colors, np.arange(n)] = 1.0
    # Entry k of the pattern lives in JVP output (color[col_k], row_k).
    gather_color = jnp.asarray(colors[idx[:, 1]])
    gather_row = jnp.asarray(idx[:, 0])
    idx_j = jnp.asarray(idx, dtype=jnp.int32)

    def jac_fn(x):
        seeds = jnp.asarray(seeds_np, dtype=x.dtype)
        _, jvp_fn = jax.linearize(residual_fn, x)
        probes = jax.vmap(jvp_fn)(seeds)  # (ncolors, m)
        data = probes[gather_color, gather_row]
        return BCOO((data, idx_j), shape=(m, n), indices_sorted=True,
                    unique_indices=True)

    return jac_fn
