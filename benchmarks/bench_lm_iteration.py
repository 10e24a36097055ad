"""Bisect the per-iteration cost of the batched LM loop on the real chip.

The headline bench (bench.py) runs ~12 outer iterations per fraction-stop
batch at ~17 ms/batch for B=100k, m=64, n=2 — ~1.4 ms per outer iteration,
>10x above the HBM-bound floor (~0.13 ms: data + carry traffic at ~800
GB/s). This script times stripped variants of the iteration to localize
the overhead:

  eval        K chained fused model evaluations (res_gram: exp + Gram)
  eval2       K chained unfused pairs (jacfwd at x + residual at trial)
  iter_core   K LM iterations via lax.scan: eval + 2x2 solve + rho +
              radius update, no convergence flags, no freeze masking
  solve_full  the real fraction-stop solve (bench.py path), measured in
              iterations (sum of per-fit iteration counts / time)

Prints one line per variant: ms per iteration-equivalent and the derived
B*m-element throughput. Run on TPU (no args).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import leastsquaresoptim_jl_tpu as lso
    from leastsquaresoptim_jl_tpu.ops.gram import gram_and_rhs
    from leastsquaresoptim_jl_tpu.ops.linalg import unrolled_chol_solve

    B, m, K = 100_000, 64, 12
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    xdata = np.linspace(1.0, 80.0, m)
    bt = np.stack([rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], 1)
    Y = bt[:, :1] * (1.0 - np.exp(-bt[:, 1:2] * xdata[None, :]))
    x0 = bt * rng.uniform(0.7, 1.4, (B, 2))

    xd = jnp.broadcast_to(jnp.asarray(xdata, dtype), (B, m))
    yd = jnp.asarray(Y, dtype)
    x0j = jnp.asarray(x0, dtype)

    def resid(beta, xdd, ydd):
        return ydd - beta[0] * (1.0 - jnp.exp(-beta[1] * xdd))

    def res_gram(beta, xdd, ydd):
        r, jvp = jax.linearize(lambda b: resid(b, xdd, ydd), beta)
        J = jax.vmap(jvp, out_axes=1)(jnp.eye(2, dtype=dtype))
        G, b = gram_and_rhs(J, r)
        return r, G, b

    # Chain R repetitions inside ONE dispatch (axon tunnel: ~40 ms fixed
    # dispatch latency and early-returning block_until_ready — fetch a
    # scalar to force completion; see CLAUDE.md).
    R = 8

    def timeit(fn, *args, reps=4):
        np.asarray(fn(*args))  # compile + warm
        ts = []
        for i in range(reps):
            a0 = args[0] * (1.0 + 1e-5 * (i + 1))
            t0 = time.perf_counter()
            float(np.asarray(fn(a0, *args[1:])))
            ts.append((time.perf_counter() - t0) / R)
        return min(ts)

    # --- eval: K chained fused evaluations ---
    @jax.jit
    def eval_fused(x0_, xd_, yd_):
        def rep(carry, _):
            def one(beta, _):
                r, G, b = jax.vmap(res_gram)(beta, xd_, yd_)
                # feed outputs back so nothing is dead-code-eliminated
                return beta + 1e-12 * b, jnp.sum(r)
            beta, s = jax.lax.scan(one, carry, None, length=K)
            return beta * (1.0 + 1e-7), jnp.sum(s)
        _, ss = jax.lax.scan(rep, x0_, None, length=R)
        return jnp.sum(ss)

    t = timeit(eval_fused, x0j, xd, yd)
    print(f"eval_fused   : {1e3 * t / K:8.3f} ms/iter")

    # --- eval2: K chained unfused pairs ---
    @jax.jit
    def eval_unfused(x0_, xd_, yd_):
        def rep(carry, _):
            def one(beta, _):
                J = jax.vmap(jax.jacfwd(resid), in_axes=(0, 0, 0))(
                    beta, xd_, yd_
                )
                G, b = jax.vmap(gram_and_rhs)(
                    J, jax.vmap(resid)(beta, xd_, yd_)
                )
                r2 = jax.vmap(resid)(beta + 1e-12 * b, xd_, yd_)
                return beta + 1e-12 * b, jnp.sum(r2)
            beta, s = jax.lax.scan(one, carry, None, length=K)
            return beta * (1.0 + 1e-7), jnp.sum(s)
        _, ss = jax.lax.scan(rep, x0_, None, length=R)
        return jnp.sum(ss)

    t = timeit(eval_unfused, x0j, xd, yd)
    print(f"eval_unfused : {1e3 * t / K:8.3f} ms/iter")

    # --- eval_shared vs eval_gridded: matched pair isolating the exp ---
    # Both close over the shared 1-d grid (bench.py's round-3 layout);
    # the only difference is m naive exps vs 3 exps + power tables
    # (ops/special.py). Their delta is the transcendental cost.
    from leastsquaresoptim_jl_tpu.ops.special import make_exp_grid

    xg = jnp.asarray(xdata, dtype)
    eg = make_exp_grid(float(xdata[0]), float(xdata[1] - xdata[0]), m)

    def resid_shared(beta, ydd):
        return ydd - beta[0] * (1.0 - jnp.exp(-beta[1] * xg))

    def resid_grid(beta, ydd):
        return ydd - beta[0] * (1.0 - eg(-beta[1]))

    def make_eval(resfn):
        @jax.jit
        def ev(x0_, yd_):
            def rep(carry, _):
                def one(beta, _):
                    J = jax.vmap(jax.jacfwd(resfn), in_axes=(0, 0))(beta, yd_)
                    G, b = jax.vmap(gram_and_rhs)(
                        J, jax.vmap(resfn)(beta, yd_)
                    )
                    return beta + 1e-12 * b, jnp.sum(b)
                beta, s = jax.lax.scan(one, carry, None, length=K)
                return beta * (1.0 + 1e-7), jnp.sum(s)
            _, ss = jax.lax.scan(rep, x0_, None, length=R)
            return jnp.sum(ss)
        return ev

    t = timeit(make_eval(resid_shared), x0j, yd)
    print(f"eval_shared  : {1e3 * t / K:8.3f} ms/iter")
    t = timeit(make_eval(resid_grid), x0j, yd)
    print(f"eval_gridded : {1e3 * t / K:8.3f} ms/iter")

    # --- iter_core: full LM arithmetic, no flags/freeze ---
    @jax.jit
    def iter_core(x0_, xd_, yd_):
        def one(carry, _):
            beta, fcur, ssr, delta = carry

            def per_fit(beta, fcur, ssr, delta, xdd, ydd):
                r, jvp = jax.linearize(lambda b: resid(b, xdd, ydd), beta)
                J = jax.vmap(jvp, out_axes=1)(jnp.eye(2, dtype=dtype))
                G, b = gram_and_rhs(J, fcur)
                dtd = jnp.diagonal(G)
                mean = jnp.mean(dtd)
                dtd = jnp.clip(dtd, 1e-6 * mean, 1e32 * mean) / delta
                dx = unrolled_chol_solve(G + jnp.diag(dtd), b)
                btrial = beta - dx
                ftrial = resid(btrial, xdd, ydd)
                tssr = jnp.sum(ftrial * ftrial)
                ared = jnp.sum((fcur - ftrial) * (fcur + ftrial))
                pred = jnp.abs(
                    2.0 * jnp.sum(dx * b)
                    - jnp.sum(dx * jnp.sum(G * dx[None, :], -1))
                )
                rho = jnp.where(pred > 0, ared / pred, 0.0)
                acc = rho > 1e-3
                grow = jnp.minimum(
                    delta / jnp.maximum(1 / 3, 1 - (2 * rho - 1) ** 3), 1e16
                )
                return (
                    jnp.where(acc, btrial, beta),
                    jnp.where(acc, ftrial, fcur),
                    jnp.where(acc, tssr, ssr),
                    jnp.where(acc, grow, delta * 0.5),
                )

            out = jax.vmap(per_fit)(beta, fcur, ssr, delta, xd_, yd_)
            return out, jnp.sum(out[2])

        def rep(x0r, _):
            fcur0 = jax.vmap(resid)(x0r, xd_, yd_)
            ssr0 = jnp.sum(fcur0 * fcur0, -1)
            delta0 = jnp.full((x0r.shape[0],), 10.0, dtype)
            out, s = jax.lax.scan(
                one, (x0r, fcur0, ssr0, delta0), None, length=K
            )
            return x0r * (1.0 + 1e-7), jnp.sum(s)

        _, ss = jax.lax.scan(rep, x0_, None, length=R)
        return jnp.sum(ss)

    t = timeit(iter_core, x0j, xd, yd)
    print(f"iter_core    : {1e3 * t / K:8.3f} ms/iter")

    # --- solve_full: the real bench path, per-iteration cost ---
    opts = lso.Options(iterations=50, x_tol=1e-6, f_tol=1e-6, g_tol=1e-5)

    def f(beta, d):
        return resid(beta, d[0], d[1])

    @jax.jit
    def run(x0_, xd_, yd_):
        def rep(x0r, _):
            raw = lso.solve_batch(
                f, x0r, (xd_, yd_), lso.LevenbergMarquardt(lso.Cholesky()),
                output_length=m, options=opts, min_converged_fraction=0.99,
            )
            return x0r * (1.0 + 1e-7), jnp.max(raw["iterations"])
        _, mx = jax.lax.scan(rep, x0_, None, length=R)
        return jnp.max(mx)

    mx = int(np.asarray(run(x0j, xd, yd)))
    ts = []
    for i in range(4):
        a0 = x0j * (1.0 + 1e-5 * (i + 1))
        t0 = time.perf_counter()
        mx = int(np.asarray(run(a0, xd, yd)))
        ts.append((time.perf_counter() - t0) / R)
    t = min(ts)
    print(
        f"solve_full   : {1e3 * t / mx:8.3f} ms/iter "
        f"(lockstep iters ~{mx}, {1e3 * t:.1f} ms/batch)"
    )


if __name__ == "__main__":
    main()
