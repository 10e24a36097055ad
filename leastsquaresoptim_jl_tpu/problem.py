"""Problem model and Jacobian synthesis.

TPU-native redesign of the reference's problem layer
(reference: src/types.jl:7-68). Instead of mutable buffers and in-place
``f!(out, x)`` / ``g!(J, x)`` callbacks, a problem is an immutable record
holding *pure* functions:

    residual_fn(x) -> r          (shape (m,), static)
    jac_fn(x) -> J               (shape (m, n), synthesized if absent)

Jacobian synthesis replaces FiniteDiff/ForwardDiff closures
(reference: src/types.jl:54-66) with JAX transforms:

    autodiff='forward'  -> jax.jacfwd           (exact, MXU-batched JVPs)
    autodiff='central'  -> central differences  (debug cross-check parity
                                                 with the reference default)

For matrix-free operation (the LSMR path) the Jacobian is never
materialized: JVP/VJP closures are built per linearization point with
``jax.linearize`` / ``jax.linear_transpose`` (see solver/lsmr.py), which
is the TPU-native counterpart of the duck-typed operator protocol in
reference: src/utils/lsmr.jl:24-44 and README.md:37-47.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _central_difference_jacobian(residual_fn: Callable) -> Callable:
    """Central finite-difference Jacobian, column-batched with vmap.

    Mirrors the reference's FiniteDiff ``:central`` default
    (reference: src/types.jl:56-58): relative step per coordinate, two
    residual evaluations per column, vmapped so the 2n evaluations run as
    one batched call on the MXU/VPU instead of a scalar loop.
    """

    def jac_fn(x):
        x = jnp.asarray(x)
        eps = jnp.finfo(x.dtype).eps
        # FiniteDiff-style relative central step: h_j = cbrt(eps) * max(|x_j|, 1)
        h = jnp.cbrt(eps) * jnp.maximum(jnp.abs(x), 1.0)
        eye = jnp.eye(x.shape[0], dtype=x.dtype)
        steps = eye * h  # row j = h_j * e_j

        def col(step):
            return residual_fn(x + step) - residual_fn(x - step)

        cols = jax.vmap(col)(steps)  # (n, m)
        return (cols / (2.0 * h)[:, None]).T

    return jac_fn


def synthesize_jacobian(residual_fn: Callable, autodiff: str = "forward") -> Callable:
    """Build ``jac_fn(x) -> J`` from a pure residual function.

    Replaces the closure synthesis at reference: src/types.jl:54-66.
    ``'forward'`` is the default here (exact derivatives are both faster and
    more accurate under jit than finite differences); ``'central'`` is kept
    for behavioral parity with the reference default.
    """
    if autodiff == "forward":
        return jax.jacfwd(residual_fn)
    if autodiff == "reverse":
        return jax.jacrev(residual_fn)
    if autodiff == "central":
        return _central_difference_jacobian(residual_fn)
    raise ValueError(
        f"Invalid automatic differentiation method {autodiff!r}; "
        "expected 'forward', 'reverse' or 'central'."
    )


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: jit-cache key
class LeastSquaresProblem:
    """An immutable nonlinear least-squares problem: minimize sum(f(x)^2).

    TPU-native counterpart of the reference ``LeastSquaresProblem``
    (reference: src/types.jl:7-68). Construct with :func:`least_squares_problem`
    or the keyword constructor below.

    Attributes:
      residual_fn: pure function x -> residual vector of length ``m``.
      x0: initial parameter vector (n,).
      m: static residual length (``output_length`` in the reference).
      jac_fn: pure function x -> (m, n) Jacobian. Synthesized when absent.
      materialize_jacobian: if False, solvers that can run matrix-free
        (LSMR) use JVP/VJP closures and never form J.
    """

    residual_fn: Callable
    x0: jnp.ndarray
    m: int
    jac_fn: Callable
    materialize_jacobian: bool = True
    # True when jac_fn returns a BCOO sparse matrix (the reference's sparse
    # CSC axis, src/types.jl:114-121): selects LSMR by default and rejects
    # the dense-only QR/Cholesky solvers.
    jacobian_is_sparse: bool = False
    # Set when the user's parameters are a pytree: maps the flat solver
    # vector back to the original structure (jax.flatten_util.ravel_pytree).
    unravel: Optional[Callable] = None
    # User-defined matrix-free operator hooks (the reference's duck-typed
    # mul!/mul!(A',...) extension point, src/utils/lsmr.jl:24-44,
    # README.md:37-47): jvp_fn(x, v) -> J(x) v, vjp_fn(x, u) -> J(x)' u,
    # colnorms_fn(x) -> diag(J(x)'J(x)). When jvp_fn/vjp_fn are set the
    # solvers never call jax.linearize — structure-exploiting Jacobians run
    # exactly the user's code. colnorms_fn alone upgrades the AD matrix-free
    # path from the Hutchinson estimate to user-exact column norms (the
    # reference's colsumabs2! contract, src/utils/utils.jl:139-161).
    jvp_fn: Optional[Callable] = None
    vjp_fn: Optional[Callable] = None
    colnorms_fn: Optional[Callable] = None
    # Fused evaluator res_jac_fn(x) -> (r, J): one primal evaluation shared
    # between the residual and the Jacobian columns (jax.linearize). The
    # optimizers' fused mode evaluates it once per iteration at the *trial*
    # point and carries J, halving the model-evaluation cost of
    # transcendental-bound workloads (the TPU-efficient form of the
    # reference's user-g! analytic-Jacobian path, src/types.jl:54-66).
    res_jac_fn: Optional[Callable] = None
    # True when res_jac_fn evaluates the model ONCE for both r and J (the
    # jax.linearize form built for autodiff='forward'); False when it is
    # two independent evaluations (user g, reverse/central mode). The
    # batched drop-fcur optimization keys on this: recomputing the
    # residual with the Jacobian is only free when the primal is shared.
    res_jac_shares_primal: bool = False

    @property
    def n(self) -> int:
        return int(self.x0.shape[0])

    def residual(self, x):
        return self.residual_fn(x)

    def jacobian(self, x):
        return self.jac_fn(x)


def least_squares_problem(
    f: Optional[Callable] = None,
    x: Optional[jnp.ndarray] = None,
    *,
    output_length: Optional[int] = None,
    g: Optional[Callable] = None,
    autodiff: str = "forward",
    materialize_jacobian: bool = True,
) -> LeastSquaresProblem:
    """Keyword constructor mirroring the reference problem constructor.

    Reference: src/types.jl:40-68. Shape validation happens eagerly (by one
    abstract evaluation of ``f``) so errors surface at problem construction,
    like the reference's DimensionMismatch checks (src/types.jl:14-15).
    """
    if f is None:
        raise ValueError("residual function f is required")
    if x is None:
        raise ValueError("initial x is required")

    # Structured parameters: a pytree of arrays (dict/dataclass/nested — or
    # a plain array of rank > 1) is raveled to the flat vector the solvers
    # work in, and f sees the original structure. The reference is
    # vector-only; pytree params are the JAX-idiomatic extension.
    unravel = None
    try:
        x_arr = jnp.asarray(x)
    except (TypeError, ValueError):
        # dicts raise TypeError; dicts/lists of 1-d arrays raise ValueError
        x_arr = None
    if x_arr is None or x_arr.ndim > 1:
        from jax.flatten_util import ravel_pytree

        x_arr, unravel = ravel_pytree(jax.tree_util.tree_map(jnp.asarray, x))
    x = x_arr
    if x.ndim != 1:
        raise ValueError(f"x must be a vector, got shape {x.shape}")

    # Wrap scalar-valued residuals (reference regression: issue #41,
    # test/runtests.jl:43-46) and ravel multi-dim residual grids — the
    # output_length inference below counts total elements, so the
    # residual surface must match it.
    base_f = f

    def residual_fn(xx):
        r = base_f(xx if unravel is None else unravel(xx))
        r = jnp.asarray(r)
        if r.ndim == 0:
            r = r[None]
        elif r.ndim > 1:
            r = r.reshape(-1)
        return r

    if output_length is None:
        out_shape = jax.eval_shape(residual_fn, x)
        output_length = int(np.prod(out_shape.shape))
    m = int(output_length)

    if g is not None:
        # A user Jacobian sees the same structured parameters as f.
        jac_fn = g if unravel is None else (lambda xf: g(unravel(xf)))
        # Fused form: trace both in one graph — XLA CSE shares any common
        # subexpressions between the user's residual and Jacobian.
        res_jac_fn = lambda xx: (residual_fn(xx), jac_fn(xx))
    else:
        jac_fn = synthesize_jacobian(residual_fn, autodiff)
        if autodiff == "forward":
            # One jax.linearize call evaluates the primal once and yields a
            # linear jvp; vmapping it over the basis gives the Jacobian
            # columns sharing that primal (exp/log/... computed once for
            # both r and J — the measured ~30% headline cut, ROADMAP #3).
            def res_jac_fn(xx):
                r, jvp = jax.linearize(residual_fn, xx)
                J = jax.vmap(jvp, out_axes=1)(
                    jnp.eye(xx.shape[0], dtype=xx.dtype)
                )
                return r, J
        else:
            res_jac_fn = lambda xx: (residual_fn(xx), jac_fn(xx))

    # Validate shapes abstractly (no FLOPs): f must produce (m,) and J (m, n).
    r_shape = jax.eval_shape(residual_fn, x)
    if tuple(r_shape.shape) != (m,):
        raise ValueError(
            f"residual function returns shape {r_shape.shape}, expected ({m},)"
        )
    j_shape = jax.eval_shape(jac_fn, x)
    from jax.experimental import sparse as jsparse

    jacobian_is_sparse = isinstance(j_shape, jsparse.JAXSparse)
    if tuple(j_shape.shape) != (m, x.shape[0]):
        raise ValueError(
            f"jacobian function returns shape {j_shape.shape}, "
            f"expected ({m}, {x.shape[0]})"
        )

    return LeastSquaresProblem(
        residual_fn=residual_fn,
        x0=x,
        m=m,
        jac_fn=jac_fn,
        materialize_jacobian=materialize_jacobian,
        jacobian_is_sparse=jacobian_is_sparse,
        unravel=unravel,
        res_jac_fn=None if jacobian_is_sparse else res_jac_fn,
        res_jac_shares_primal=(
            not jacobian_is_sparse and g is None and autodiff == "forward"
        ),
    )


def matrix_free_problem(
    f: Callable,
    x,
    *,
    output_length: int,
    jvp: Optional[Callable] = None,
    vjp: Optional[Callable] = None,
    colnorms: Optional[Callable] = None,
) -> LeastSquaresProblem:
    """Problem with a user-defined matrix-free Jacobian operator.

    The TPU counterpart of the reference's duck-typed operator protocol —
    any object with ``mul!(y, A, x)`` / ``mul!(x, A', y)`` / ``size`` /
    ``eltype`` is a Jacobian there (reference: src/utils/lsmr.jl:24-44,
    README.md:37-47). Here the user supplies pure closures:

        jvp(x, v) -> J(x) @ v          (shape (m,))
        vjp(x, u) -> J(x).T @ u        (shape (n,))
        colnorms(x) -> diag(J'J)(x)    (shape (n,); optional)

    ``jvp`` and ``vjp`` must both be given or both omitted (LSMR needs the
    pair). When omitted, AD linearization supplies them and ``colnorms``
    alone upgrades the column-norm estimate (LM damping diagonal + Jacobi
    preconditioner) from the Hutchinson default to the user's exact values —
    the reference's colsumabs2! contract (src/utils/utils.jl:139-161).
    Operator problems are matrix-free: solvers default to LSMR, and the
    dense QR/Cholesky routes are rejected as in the reference (custom
    operators exist only on its LSMR path, src/types.jl:121).
    """
    if (jvp is None) != (vjp is None):
        raise ValueError(
            "jvp and vjp must be supplied together (LSMR's Golub-Kahan "
            "recurrence uses one of each per iteration)"
        )
    base = least_squares_problem(
        f=f, x=x, output_length=output_length, materialize_jacobian=False
    )
    if base.unravel is not None and (jvp is not None or colnorms is not None):
        # All hooks are called in the flat solver vector space; a
        # colnorms-only hook written against the user's pytree would be
        # handed the raveled array mid-trace.
        raise ValueError(
            "user operator hooks (jvp/vjp/colnorms) work in the flat "
            "vector space and require flat vector parameters (got a "
            "pytree x)"
        )
    return dataclasses.replace(
        base, jvp_fn=jvp, vjp_fn=vjp, colnorms_fn=colnorms
    )
