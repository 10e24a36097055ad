"""Fused Gram-matrix kernel: one pass over J producing (J'J, J'y).

This is the hottest dense op of the normal-equations path — the reference
forms it as two BLAS calls ``mul!(cholm, J', J)`` + ``mul!(x, J', y)``
(reference: src/solver/dense_cholesky.jl:29-35,43-59). On TPU we fuse both
into a single Pallas kernel that streams row-blocks of J from HBM once and
accumulates the (n, n) Gram block and the (n,) rhs in VMEM — HBM traffic is
m*n reads total, the roofline minimum, instead of two passes.

A plain-XLA fallback covers CPU, f64, and shapes too large for VMEM. Under
residual-row sharding each chip runs this kernel on its local rows and the
partial results are `psum`-ed (see parallel/sharded.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# Below this parameter count the Gram product uses a broadcast-multiply +
# reduce instead of a matmul: under vmap, a batched (B, m, n) x (B, m, n) ->
# (B, n, n) contraction with tiny n starves the MXU, while the broadcast form
# fuses into a single VPU reduction over m (XLA fuses the multiply into the
# reduce, so the (m, n, n) intermediate never materializes).
_BROADCAST_GRAM_MAX_N = 16


def _gram_xla(J, y):
    n = J.shape[-1]
    if n <= _BROADCAST_GRAM_MAX_N:
        gram = jnp.sum(J[..., :, :, None] * J[..., :, None, :], axis=-3)
        rhs = jnp.sum(J * y[..., :, None], axis=-2)
        return gram, rhs
    gram = J.T @ J
    rhs = J.T @ y
    return gram, rhs


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_m",))
def _gram_pallas(J, y, block_m: int = 1024):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n = J.shape
    # Pad rows to a block multiple; zero rows contribute nothing to J'J / J'y,
    # so padding is exact (no masking needed in-kernel).
    m_pad = _round_up(max(m, 8), block_m)
    n_pad = _round_up(n, 128)
    if m_pad != m or n_pad != n:
        J = jnp.pad(J, ((0, m_pad - m), (0, n_pad - n)))
        y = jnp.pad(y, (0, m_pad - m))
    y2 = y[:, None]
    grid = (m_pad // block_m,)
    acc_dtype = jnp.float32 if J.dtype in (jnp.bfloat16, jnp.float32) else J.dtype

    def kernel(j_ref, y_ref, gram_ref, rhs_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            gram_ref[:] = jnp.zeros_like(gram_ref)
            rhs_ref[:] = jnp.zeros_like(rhs_ref)

        jb = j_ref[:]
        gram_ref[:] += jax.lax.dot_general(
            jb, jb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        rhs_ref[:] += jax.lax.dot_general(
            jb, y_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    gram, rhs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, n_pad), lambda i: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0)),
            pl.BlockSpec((n_pad, 1), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, n_pad), acc_dtype),
            jax.ShapeDtypeStruct((n_pad, 1), acc_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * (n_pad + 1),
            bytes_accessed=m_pad * n_pad * J.dtype.itemsize,
            transcendentals=0,
        ),
    )(J, y2)
    gram = gram[:n, :n].astype(J.dtype)
    rhs = rhs[:n, 0].astype(J.dtype)
    return gram, rhs


def _pallas_eligible(J) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if J.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    m, n = J.shape
    n_pad = _round_up(n, 128)
    # VMEM budget: J block (block_m x n_pad) + gram (n_pad^2) in f32.
    if n_pad > 2048:
        return False
    if m < 4096:  # too small for a kernel launch to beat fused XLA
        return False
    return True


def gram_and_rhs(J, y, use_pallas: bool | None = None):
    """Return (J'J, J'y) in one fused pass.

    ``use_pallas=None`` auto-selects the Pallas kernel on TPU for
    f32/bf16 problems large enough to benefit; False forces the XLA path
    (always used on CPU / f64 parity runs).
    """
    if use_pallas is None:
        use_pallas = _pallas_eligible(J)
    if use_pallas:
        return _gram_pallas(J, y)
    return _gram_xla(J, y)
