"""Batched solves: vmap over thousands of independent fits.

The reference solves problems one ``optimize!`` call at a time; here a batch
of independent fits (e.g. NIST-style curve fits, the workload model of
reference test/nonlinearfitting.jl) shares one compiled kernel and saturates
the MXU. Per-problem convergence is handled by vmap's while_loop batching
rule: each problem's carry freezes once its own loop condition goes false,
so results match solving each problem alone.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .api import solve
from .optimizer.common import Options
from .problem import least_squares_problem


def solve_batch(
    f: Callable,
    x0_batch,
    data_batch=None,
    optimizer=None,
    *,
    options: Optional[Options] = None,
    output_length: Optional[int] = None,
    autodiff: str = "forward",
    materialize_jacobian: bool = True,
    lower=None,
    upper=None,
    data_axis: Optional[int] = 0,
):
    """Solve a batch of independent fits sharing one residual function.

    ``f`` is either ``f(x) -> r`` (when ``data_batch`` is None) or
    ``f(x, data) -> r`` with ``data_batch`` a pytree whose leaves have a
    leading batch axis matching ``x0_batch.shape[0]``. Residual length must
    be batch-uniform (static shapes).

    ``data_axis=None`` marks ``data_batch`` as *shared* across the batch
    (vmap in_axes=None): the data is passed as a runtime argument instead of
    a closure constant, so large shared datasets are neither baked into the
    HLO nor recompiled per dataset.

    Returns the raw result pytree with a leading batch axis on every leaf.
    Wrap the call in ``jax.jit`` for repeated use.
    """
    opts = options or Options()
    if opts.show_trace:
        raise ValueError(
            "show_trace (live printing) is not supported under batched "
            "solves; store_trace works — each problem gets its own "
            "fixed-size trace buffer in the result"
        )
    if optimizer is None and materialize_jacobian:
        # Batched default diverges from the single-solve default (QR,
        # reference src/types.jl:120): XLA's batched QR kernel exhausts
        # scoped VMEM outright at large batch sizes (fails to compile at
        # B=50k, m=64, n=2 on v5e) and batched LAPACK-style kernels are
        # ~20x slower at tiny n regardless; the normal-equations route with
        # the VPU-unrolled small-n solve is the batched-safe path.
        from .optimizer.base import Dogleg
        from .solver.base import Cholesky

        optimizer = Dogleg(Cholesky())
    x0_batch = jnp.asarray(x0_batch)

    def single(x0, data):
        residual = f if data is None else (lambda x: f(x, data))
        prob = least_squares_problem(
            f=residual,
            x=x0,
            output_length=output_length,
            autodiff=autodiff,
            materialize_jacobian=materialize_jacobian,
        )
        return solve(
            prob, optimizer, options=opts, lower=lower, upper=upper, x0=x0
        )

    if data_batch is None:
        return jax.vmap(lambda x0: single(x0, None))(x0_batch)
    return jax.vmap(single, in_axes=(0, data_axis))(x0_batch, data_batch)
