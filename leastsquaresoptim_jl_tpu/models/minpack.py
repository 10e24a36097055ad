"""The 14 MINPACK hybrj test problems, written as pure vectorized JAX.

These are the canonical More-Garbow-Hillstrom nonlinear-equation test
functions (the same suite the reference exercises in
test/nonlinearsolvers.jl); implemented here from their mathematical
definitions in vectorized jnp form (no scalar loops), with the same starting
points, so the correctness gate ssr <= 1e-3 is directly comparable.

Each factory returns (name, residual_fn, x0). Residual functions are pure
x -> r and differentiable with jacfwd (the framework's default Jacobian
path); a few also come with analytic Jacobians to exercise the user-supplied
jacobian path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rosenbrock():
    def f(x):
        return jnp.array([1.0 - x[0], 10.0 * (x[1] - x[0] ** 2)])

    def jac(x):
        return jnp.array([[-1.0, 0.0], [-20.0 * x[0], 10.0]])

    return "rosenbrock", f, jnp.array([-1.2, 1.0]), jac


def powell_singular():
    s5, s10 = np.sqrt(5.0), np.sqrt(10.0)

    def f(x):
        return jnp.array(
            [
                x[0] + 10.0 * x[1],
                s5 * (x[2] - x[3]),
                (x[1] - 2.0 * x[2]) ** 2,
                s10 * (x[0] - x[3]) ** 2,
            ]
        )

    return "powell_singular", f, jnp.array([3.0, -1.0, 0.0, 1.0]), None


def powell_badly_scaled():
    def f(x):
        return jnp.array(
            [
                1e4 * x[0] * x[1] - 1.0,
                jnp.exp(-x[0]) + jnp.exp(-x[1]) - 1.0001,
            ]
        )

    return "powell_badly_scaled", f, jnp.array([0.0, 1.0]), None


def wood():
    c3, c4, c5, c6 = 200.0, 20.2, 19.8, 180.0

    def f(x):
        t1 = x[1] - x[0] ** 2
        t2 = x[3] - x[2] ** 2
        return jnp.array(
            [
                -c3 * x[0] * t1 - (1.0 - x[0]),
                c3 * t1 + c4 * (x[1] - 1.0) + c5 * (x[3] - 1.0),
                -c6 * x[2] * t2 - (1.0 - x[2]),
                c6 * t2 + c4 * (x[3] - 1.0) + c5 * (x[1] - 1.0),
            ]
        )

    return "wood", f, jnp.array([-3.0, -1.0, -3.0, -1.0]), None


def helical_valley():
    two_pi = 2.0 * np.pi

    def f(x):
        # Branch structure matches the MINPACK definition: theta uses
        # atan(x2/x1)/2pi, shifted by +1/2 in the left half-plane.
        ratio = jnp.arctan(x[1] / jnp.where(x[0] == 0, 1.0, x[0])) / two_pi
        theta = jnp.where(
            x[0] > 0,
            ratio,
            jnp.where(x[0] < 0, ratio + 0.5, 0.25 * jnp.sign(x[1])),
        )
        rad = jnp.sqrt(x[0] ** 2 + x[1] ** 2)
        return jnp.array(
            [10.0 * (x[2] - 10.0 * theta), 10.0 * (rad - 1.0), x[2]]
        )

    return "helical_valley", f, jnp.array([-1.0, 0.0, 0.0]), None


def watson(n: int):
    i = np.arange(1, 30)
    ti = i / 29.0  # (29,)
    j = np.arange(1, n + 1)
    # A[i,j] = (j-1) ti^(j-2); B[i,j] = ti^(j-1); C[i,k] = ti^(k-2)
    A = (j - 1) * ti[:, None] ** np.clip(j - 2, 0, None)
    A[:, 0] = 0.0
    B = ti[:, None] ** (j - 1)
    C = ti[:, None] ** (j - 2.0)
    k = np.arange(1, n + 1)
    A, B, C = jnp.array(A), jnp.array(B), jnp.array(C)
    kk = jnp.array(k, dtype=jnp.float64)

    def f(x):
        sum1 = A @ x
        sum2 = B @ x
        temp1 = sum1 - sum2**2 - 1.0
        temp2 = 2.0 * jnp.array(ti) * sum2
        # fvec[k] = sum_i C[i,k] * (k-1-temp2_i) * temp1_i
        fv = jnp.einsum("ik,ik->k", C, (kk[None, :] - 1.0 - temp2[:, None]) * temp1[:, None])
        t = x[1] - x[0] ** 2 - 1.0
        fv = fv.at[0].add(x[0] * (1.0 - 2.0 * t))
        fv = fv.at[1].add(t)
        return fv

    return f"watson({n})", f, jnp.zeros(n), None


def chebyquad(n: int):
    def f(x):
        t2 = 2.0 * x - 1.0  # (n,)
        tprev = jnp.ones_like(t2)
        tcur = t2
        rows = []
        for _ in range(n):  # static unroll: n <= 9
            rows.append(tcur)
            tnext = 2.0 * t2 * tcur - tprev
            tprev, tcur = tcur, tnext
        T = jnp.stack(rows)  # T[i, j] = T_i(2 x_j - 1)
        fv = jnp.mean(T, axis=1)
        i = np.arange(1, n + 1)
        shift = np.where(i % 2 == 0, 1.0 / np.maximum(i**2 - 1.0, 1.0), 0.0)
        return fv + jnp.array(shift)

    x0 = jnp.arange(1, n + 1, dtype=jnp.float64) / (n + 1)
    return f"chebyquad({n})", f, x0, None


def brown_almost_linear(n: int):
    def f(x):
        s = jnp.sum(x) - (n + 1)
        head = x[:-1] + s
        tail = jnp.prod(x) - 1.0
        return jnp.concatenate([head, tail[None]])

    return f"brown_almost_linear({n})", f, 0.5 * jnp.ones(n), None


def discrete_boundary_value(n: int):
    h = 1.0 / (n + 1)
    t = jnp.arange(1, n + 1, dtype=jnp.float64) * h

    def f(x):
        xm = jnp.concatenate([jnp.zeros(1), x[:-1]])
        xp = jnp.concatenate([x[1:], jnp.zeros(1)])
        return 2.0 * x - xm - xp + (h**2 / 2.0) * (x + t + 1.0) ** 3

    x0 = t * (t - 1.0)
    return f"discrete_boundary_value({n})", f, x0, None


def discrete_integral_equation(n: int):
    h = 1.0 / (n + 1)
    t = np.arange(1, n + 1) * h
    # K[k, j] = min(t_j (1 - t_k), t_k (1 - t_j))
    K = np.minimum(t[None, :] * (1.0 - t[:, None]), t[:, None] * (1.0 - t[None, :]))
    K = jnp.array(K)
    tj = jnp.array(t)

    def f(x):
        c = (x + tj + 1.0) ** 3
        return x + (h / 2.0) * (K @ c)

    x0 = tj * (tj - 1.0)
    return f"discrete_integral_equation({n})", f, x0, None


def trigonometric(n: int):
    k = jnp.arange(1, n + 1, dtype=jnp.float64)

    def f(x):
        cs = jnp.cos(x)
        return n + k - jnp.sin(x) - jnp.sum(cs) - k * cs

    return f"trigonometric({n})", f, jnp.ones(n) / n, None


def variably_dimensioned(n: int):
    j = jnp.arange(1, n + 1, dtype=jnp.float64)

    def f(x):
        s = jnp.sum(j * (x - 1.0))
        temp = s * (1.0 + 2.0 * s**2)
        return x - 1.0 + j * temp

    x0 = j / n
    return f"variably_dimensioned({n})", f, x0, None


def broyden_tridiagonal(n: int):
    def f(x):
        xm = jnp.concatenate([jnp.zeros(1), x[:-1]])
        xp = jnp.concatenate([x[1:], jnp.zeros(1)])
        return (3.0 - 2.0 * x) * x - xm - 2.0 * xp + 1.0

    return f"broyden_tridiagonal({n})", f, -jnp.ones(n), None


def broyden_banded(n: int):
    ml, mu = 5, 1
    k = np.arange(n)
    band = ((k[None, :] >= k[:, None] - ml) & (k[None, :] <= k[:, None] + mu)
            & (k[None, :] != k[:, None]))
    band = jnp.array(band.astype(np.float64))

    def f(x):
        q = x * (1.0 + x)
        return x * (2.0 + 5.0 * x**2) + 1.0 - band @ q

    return f"broyden_banded({n})", f, -jnp.ones(n), None


def full_suite():
    """The 21 instances of the reference sweep (test/nonlinearsolvers.jl:512-522)."""
    return [
        rosenbrock(),
        powell_singular(),
        powell_badly_scaled(),
        wood(),
        helical_valley(),
        watson(6),
        watson(9),
        chebyquad(5),
        chebyquad(6),
        chebyquad(7),
        chebyquad(9),
        brown_almost_linear(10),
        brown_almost_linear(30),
        brown_almost_linear(40),
        discrete_boundary_value(10),
        discrete_integral_equation(1),
        discrete_integral_equation(10),
        trigonometric(10),
        variably_dimensioned(10),
        broyden_tridiagonal(10),
        broyden_banded(10),
    ]


def cholesky_suite():
    """The reduced set of the reference's dense-Cholesky sweep
    (test/nonlinearsolvers.jl:573-583)."""
    return [
        rosenbrock(),
        powell_singular(),
        powell_badly_scaled(),
        wood(),
        helical_valley(),
        watson(6),
        chebyquad(5),
        chebyquad(6),
        chebyquad(7),
        chebyquad(9),
        brown_almost_linear(10),
        discrete_boundary_value(10),
        discrete_integral_equation(1),
        discrete_integral_equation(10),
        trigonometric(10),
        variably_dimensioned(10),
        broyden_tridiagonal(10),
        broyden_banded(10),
    ]
