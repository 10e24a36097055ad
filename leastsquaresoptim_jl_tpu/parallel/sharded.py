"""Residual-row-sharded solves: distributed Gram reduction + distributed LSMR.

Two composable layers:

1. **GSPMD path** (`solve_sharded`): build the problem from a *per-row*
   residual ``f(x, row_data) -> scalar`` over data sharded on the ``rows``
   mesh axis, annotate the row dimension, and run the standard solve loop
   under jit — XLA's SPMD partitioner turns every row reduction (ssr, J'J,
   J'r, column norms, LSMR norms) into a psum over ICI automatically. The
   parameter vector x and the (n, n) normal system stay replicated.

2. **Explicit shard_map kernels** (`sharded_gram_and_rhs`,
   `make_sharded_operator`): collective placement under programmer control
   for the hot paths — each chip computes its local Gram block J_i'J_i /
   J_i'r_i (optionally with the fused Pallas kernel) and one psum reduces
   the replicated normal system; LSMR matvecs run Jv local / J'u psum-ed,
   one all-reduce per matvec pair (SURVEY.md §2 "Distributed LSMR").

The reference is single-process (SURVEY.md §2: no parallelism of any kind);
this module is the TPU-native scale-out the north star requires.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..api import solve
from ..ops.operators import JacobianOperator
from ..problem import LeastSquaresProblem


# ---------------------------------------------------------------------------
# GSPMD path: sharded problem construction + standard solve loop
# ---------------------------------------------------------------------------

def sharded_problem(
    per_row_residual: Callable,
    data,
    x0,
    mesh: Mesh,
    axis: str = "rows",
    weights=None,
) -> LeastSquaresProblem:
    """Build a LeastSquaresProblem whose residual is row-sharded.

    ``per_row_residual(x, row) -> scalar``; ``data`` is a pytree whose leaves
    have leading dimension m, already placed with ``shard_rows``. ``weights``
    (optional, (m,)) scales rows — use 0.0 to mask padding rows.

    The residual function vmaps over rows and constrains the output to stay
    sharded on ``axis``; jacfwd of it yields a row-sharded (m, n) Jacobian,
    so the downstream Gram/colsumabs2/matvec reductions partition into local
    work + psum with no further annotation.
    """
    leaves = jax.tree_util.tree_leaves(data)
    m = int(leaves[0].shape[0])
    spec = NamedSharding(mesh, P(axis))

    def residual_fn(x):
        r = jax.vmap(lambda row: per_row_residual(x, row))(data)
        if weights is not None:
            r = r * weights
        return jax.lax.with_sharding_constraint(r, spec)

    x0 = jnp.asarray(x0)
    return LeastSquaresProblem(
        residual_fn=residual_fn,
        x0=x0,
        m=m,
        jac_fn=jax.jacfwd(residual_fn),
        materialize_jacobian=False,
    )


def solve_sharded(
    per_row_residual: Callable,
    data,
    x0,
    mesh: Mesh,
    optimizer=None,
    *,
    axis: str = "rows",
    weights=None,
    options=None,
    lower=None,
    upper=None,
):
    """Distributed solve over row-sharded data. Returns the raw result pytree.

    Matrix-free by construction (the (m, n) Jacobian is never materialized
    on one chip); the default ``LevenbergMarquardt(LSMR())`` uses distributed
    matvecs. For small n a materialized row-sharded J with
    ``sharded_gram_and_rhs`` (below) is the normal-equations alternative.
    """
    # Data/weights/bounds ride as jit *arguments*, not closure constants:
    # a multi-process (multi-host) array spanning non-addressable devices
    # cannot be closed over at all, and even single-process closures would
    # bake the dataset into the HLO (one recompile per dataset). The
    # jitted core is cached on the static spec (_sharded_run) so repeated
    # solves with the same residual/mesh/optimizer reuse one executable
    # instead of retracing a fresh closure every call.
    run = _sharded_run(per_row_residual, mesh, axis, optimizer, options)
    with mesh:
        return run(jnp.asarray(x0), data, weights, lower, upper)


@functools.lru_cache(maxsize=64)
def _sharded_run(per_row_residual, mesh, axis, optimizer, options):
    @jax.jit
    def run(x0_, data_, weights_, lower_, upper_):
        problem = sharded_problem(
            per_row_residual, data_, x0_, mesh, axis=axis, weights=weights_
        )
        return solve(problem, optimizer, options=options,
                     lower=lower_, upper=upper_, x0=x0_)

    return run


# ---------------------------------------------------------------------------
# Explicit shard_map kernels
# ---------------------------------------------------------------------------

def sharded_gram_and_rhs(J, y, mesh: Mesh, axis: str = "rows",
                         use_pallas: Optional[bool] = None):
    """psum-reduced (J'J, J'y) from a row-sharded J: each chip runs the fused
    Gram kernel on its local rows, one all-reduce produces the replicated
    (n, n) normal system (SURVEY.md §2 residual/data parallelism)."""
    from jax import shard_map

    from ..ops.gram import gram_and_rhs

    def local(Jb, yb):
        g, r = gram_and_rhs(Jb, yb, use_pallas=use_pallas)
        return (
            jax.lax.psum(g, axis_name=axis),
            jax.lax.psum(r, axis_name=axis),
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(None, None), P(None)),
    )(J, y)


def make_sharded_operator(J, mesh: Mesh, axis: str = "rows") -> JacobianOperator:
    """Distributed LSMR operator from a row-sharded materialized J.

    matvec:  J v   — local rows only, output stays row-sharded (no comm).
    rmatvec: J' u  — local partial + one psum (replicated (n,)).
    The LSMR core's u-norms reduce over the sharded row axis, which XLA
    partitions into local sums + psum; one all-reduce per matvec pair total.
    """
    from jax import shard_map

    m, n = J.shape

    def matvec(v):
        def local(Jb, vb):
            return Jb @ vb

        return shard_map(
            local, mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P(axis)
        )(J, v)

    def rmatvec(u):
        def local(Jb, ub):
            return jax.lax.psum(Jb.T @ ub, axis_name=axis)

        return shard_map(
            local, mesh=mesh, in_specs=(P(axis, None), P(axis)), out_specs=P()
        )(J, u)

    def colnorms2():
        def local(Jb):
            return jax.lax.psum(jnp.sum(Jb * Jb, axis=0), axis_name=axis)

        return shard_map(
            local, mesh=mesh, in_specs=(P(axis, None),), out_specs=P()
        )(J)

    return JacobianOperator(
        matvec=matvec, rmatvec=rmatvec, colnorms2=colnorms2,
        m=int(m), n=int(n), J=None,
    )
