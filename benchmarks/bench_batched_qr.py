"""Batched mid-n QR vs Cholesky on the real chip (round-3 blocked MGS).

Round-2 VERDICT weak #3: batched-safe QR used to stop at n=8. The
fori_loop-blocked MGS (ops/linalg.blocked_mgs_solve) extends true-QR
conditioning to 8 < n <= 64 under vmap at any batch size — XLA's batched
Householder QR cannot compile in this regime. This bench measures the
cost of that accuracy on the end-to-end batched LM workload at n=32:
B=10k linear-fit problems (cond ~ 1e4, where f32 normal equations lose
~eps*cond^2 = all digits), QR route vs Cholesky route, plus the median
parameter accuracy of each.

Prints one JSON line: QR fits/s with vs_baseline = QR/Cholesky throughput
ratio (the accuracy goes to stderr — the point of the route is the
~cond-factor accuracy win, the cost is the throughput ratio).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_config(B, m, n, cond):
    import jax
    import jax.numpy as jnp

    import leastsquaresoptim_jl_tpu as lso

    rng = np.random.default_rng(0)
    # Controlled-conditioning linear fit family: A_i = U diag(s) V' with
    # log-spaced singular values, shared across the batch up to a random
    # orthogonal mix (keeps generation cheap at B=10k).
    A0 = rng.standard_normal((m, n))
    u, _, vt = np.linalg.svd(A0, full_matrices=False)
    s = np.logspace(0, -np.log10(cond), n)
    base = u @ np.diag(s) @ vt
    mixes = rng.standard_normal((B, n, n))
    q_mix = np.linalg.qr(mixes)[0]
    A = np.einsum("mk,bkn->bmn", base, q_mix)
    xtrue = rng.standard_normal((B, n))
    b = np.einsum("bmn,bn->bm", A, xtrue)

    A32 = jnp.asarray(A, jnp.float32)
    b32 = jnp.asarray(b, jnp.float32)
    # Start near the solution: the linear LS is solved by one Gauss-Newton
    # step, so the landed accuracy is purely the inner solver's (the point
    # of the comparison); the remaining iterations are the convergence
    # bookkeeping both routes share.
    x0 = jnp.asarray(xtrue + 0.3 * rng.standard_normal((B, n)), jnp.float32)

    def f(x, data):
        Ai, bi = data
        return jnp.sum(Ai * x[None, :], axis=-1) - bi

    opts = lso.Options(iterations=12)
    R = 6

    def make_run(solver):
        def run(x0_, A_, b_):
            def rep(x0r, _):
                raw = lso.solve_batch(
                    f, x0r, (A_, b_), lso.Dogleg(solver),
                    output_length=m, options=opts,
                )
                return x0r * (1.0 + 1e-6), (
                    jnp.sum(raw["minimizer"]), raw["minimizer"]
                )
            _, (ss, mins) = jax.lax.scan(rep, x0_, None, length=R)
            return jnp.sum(ss), mins[-1]

        return jax.jit(run)

    out = {}
    for label, solver in (("qr", lso.QR()), ("chol", lso.Cholesky())):
        run = make_run(solver)
        np.asarray(run(x0, A32, b32)[0])  # compile
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            ssum, mins = run(x0 * (1.0 + 1e-4 * i), A32, b32)
            float(np.asarray(ssum))
            ts.append((time.perf_counter() - t0) / R)
        sol = np.asarray(mins, np.float64)
        err = np.median(
            np.linalg.norm(sol - xtrue, axis=1) / np.linalg.norm(xtrue, axis=1)
        )
        out[label] = (B / min(ts), err)
        print(f"{label}: {B/min(ts):,.0f} fits/s, median rel err {err:.2e}",
              file=sys.stderr)

    qr_fps, qr_err = out["qr"]
    ch_fps, ch_err = out["chol"]
    print(
        json.dumps(
            {
                "metric": f"batched_qr_n{n}_fits_per_second",
                "value": round(qr_fps, 1),
                "unit": (
                    f"linear-fit solves/s (B={B}, m={m}, n={n}, cond~1e4 f32; "
                    f"QR rel err {qr_err:.1e} vs Cholesky {ch_err:.1e})"
                ),
                "vs_baseline": round(qr_fps / ch_fps, 3),
            }
        )
    )


def main():
    # n=32: the round-3 blocked-MGS regime. n=128: the round-4 panel
    # BCGS2 regime (round-3 VERDICT weak #4 asked for exactly this row).
    run_config(10_000, 48, 32, 1e4)
    run_config(10_000, 192, 128, 1e4)


if __name__ == "__main__":
    main()
