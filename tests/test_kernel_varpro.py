"""Equivalence tests for the fused Pallas VarPro LM kernel (p=1).

``ops/kernel_varpro.py`` runs K LM iterations per kernel launch with the
same arithmetic as the lax route (optimizer/levenberg_marquardt.py
specialized to n=1 + models/separable's p=1 floored projection). These
tests pin that equivalence in interpret mode on CPU — same fits, same
convergence flags, same optimum — against ``curve_fit_batch``'s
separable route.

NOTE: on the real chip the kernel measured 2-6x SLOWER than the lax
route (see benchmarks/README.md "Fused VarPro Pallas kernel"); it is
kept as an opt-in experiment, and these tests keep it honest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from leastsquaresoptim_jl_tpu.models import curve_fit_batch
from leastsquaresoptim_jl_tpu.ops.kernel_varpro import (
    varpro_lm_p1_kernel_solve,
)

B, M = 192, 32


def _problem(dtype=np.float32, B=B, m=M, seed=0):
    rng = np.random.default_rng(seed)
    xd = np.linspace(1.0, 80.0, m)
    bt = np.stack(
        [rng.uniform(100, 400, B), rng.uniform(1e-2, 6e-2, B)], axis=1
    )
    Y = (bt[:, :1] * (1.0 - np.exp(-bt[:, 1:2] * xd[None, :]))).astype(dtype)
    p0 = (bt * rng.uniform(0.7, 1.4, bt.shape)).astype(dtype)
    return xd, jnp.asarray(Y), jnp.asarray(p0), bt.astype(dtype)


PHI = lambda x, a: 1.0 - jnp.exp(-a * x)
DPHI = lambda x, a: x * jnp.exp(-a * x)


def _kernel_solve(xd, Y, alpha0, **kw):
    defaults = dict(
        x_tol=1e-6,
        f_tol=1e-6,
        g_tol=1e-5,
        iterations=50,
        min_converged_fraction=1.0,
        k_iters=4,
        block_fits=64,
        interpret=True,  # CPU test box: Mosaic unavailable, semantics identical
    )
    defaults.update(kw)
    return varpro_lm_p1_kernel_solve(PHI, DPHI, xd, Y, alpha0, **defaults)


def test_kernel_matches_lax_route_optimum():
    """Kernel and lax VarPro route converge to the same (alpha, c)."""
    xd, Y, p0, bt = _problem()
    out = _kernel_solve(xd, Y, p0[:, 1])
    assert bool(jnp.all(out["done"]))
    assert float(jnp.mean(out["converged"].astype(jnp.float64))) > 0.99

    lax_res = curve_fit_batch(
        "exp_saturation", np.asarray(xd, np.float32), Y, p0, separable=True
    )
    lax_min = lax_res["minimizer"]  # (B, 2) full vector [c, alpha]

    # Both routes solve the identical reduced problem to their own
    # convergence criteria; agreement at the optimum is limited only by
    # the f32 valley resolution of this (well-conditioned) model family.
    alpha_rel = jnp.abs(out["alpha"] - lax_min[:, 1]) / jnp.abs(lax_min[:, 1])
    c_rel = jnp.abs(out["coefficient"] - lax_min[:, 0]) / jnp.abs(
        lax_min[:, 0]
    )
    assert float(jnp.median(alpha_rel)) < 1e-5
    assert float(jnp.median(c_rel)) < 1e-5
    assert float(jnp.mean((alpha_rel < 1e-3).astype(jnp.float64))) > 0.98

    # And both recover the ground truth.
    rel_true = jnp.abs(out["alpha"] - bt[:, 1]) / jnp.abs(bt[:, 1])
    assert float(jnp.median(rel_true)) < 1e-4


def test_kernel_iteration_counts_sane():
    """Well-posed starts converge in few iterations, none at the cap."""
    xd, Y, p0, _ = _problem()
    out = _kernel_solve(xd, Y, p0[:, 1])
    iters = np.asarray(out["iterations"])
    assert iters.max() < 50
    assert np.median(iters) <= 16


def test_kernel_pads_non_multiple_batch():
    """B not a multiple of block_fits: pad rows are dropped on return."""
    xd, Y, p0, bt = _problem(B=100)  # 100 % 64 != 0
    out = _kernel_solve(xd, Y, p0[:, 1])
    assert out["alpha"].shape == (100,)
    rel = jnp.abs(out["alpha"] - bt[:, 1]) / jnp.abs(bt[:, 1])
    assert float(jnp.median(rel)) < 1e-4


def test_kernel_freezes_converged_fits():
    """Fits stop counting at their own convergence iteration even though
    the kernel keeps launching for stragglers (k_iters=2 forces several
    launches; per-fit counts must spread below the total)."""
    xd, Y, p0, _ = _problem()
    out = _kernel_solve(xd, Y, p0[:, 1], k_iters=2)
    assert float(jnp.mean(out["converged"].astype(jnp.float64))) == 1.0
    iters = np.asarray(out["iterations"])
    assert iters.max() > 2          # more than one launch happened
    assert iters.min() < iters.max()  # early fits froze at their own count


def test_kernel_fraction_stop():
    """min_converged_fraction < 1 stops once the quorum is done; the
    poisoned stragglers are left unconverged, the rest converge."""
    xd, Y, p0, _ = _problem()
    a0 = np.asarray(p0[:, 1]).copy()
    a0[:20] *= 400.0  # deep saturation: slow progress
    out = _kernel_solve(xd, Y, jnp.asarray(a0),
                        min_converged_fraction=0.85, k_iters=2)
    done = np.asarray(out["done"])
    assert done.mean() >= 0.85          # quorum reached
    assert done[:20].mean() < 0.5       # poisoned fits did not fake it
    # healthy fits make up (at least) the quorum; a few may be cut
    # mid-flight by the early stop — that IS the contract
    assert np.asarray(out["converged"])[20:].mean() > 0.85


def test_kernel_convergence_flags_mutually_exclusive():
    """The per-fit f/x/g flags are priority-gated exactly like
    optimizer/common.assess_convergence (f beats x beats g): at most one
    flag is set per fit, and 'converged' is their union."""
    xd, Y, p0, _ = _problem()
    out = _kernel_solve(xd, Y, p0[:, 1])
    f = np.asarray(out["f_converged"])
    x = np.asarray(out["x_converged"])
    g = np.asarray(out["g_converged"])
    nset = f.astype(int) + x.astype(int) + g.astype(int)
    assert nset.max() <= 1
    np.testing.assert_array_equal(np.asarray(out["converged"]), nset == 1)


def test_kernel_fraction_stop_counts_true_batch_only():
    """When B % block_fits != 0, pad rows are copies of fit 0. The stop
    quorum must be counted over the TRUE B rows — if fit 0 is a straggler
    the old padded count could never reach quorum and every fit ran to
    the iteration cap."""
    xd, Y, p0, _ = _problem(B=100)  # pads 28 rows at block_fits=64
    a0 = np.asarray(p0[:, 1]).copy()
    a0[0] *= 400.0  # fit 0 (and hence every pad row) is a straggler
    out = _kernel_solve(
        xd, Y, jnp.asarray(a0), min_converged_fraction=0.9, k_iters=2,
        iterations=60,
    )
    done = np.asarray(out["done"])
    assert done.shape == (100,)
    assert done.mean() >= 0.9           # quorum over the true batch
    iters = np.asarray(out["iterations"])
    # the stop fired well before the cap: the straggler was cut
    # mid-flight instead of dragging the whole batch to 60 iterations
    assert iters[0] < 60
    assert np.median(iters[1:]) < 30


def test_kernel_f64_dtype_follows_y():
    xd, Y, p0, bt = _problem(dtype=np.float64, B=64)
    out = _kernel_solve(xd, Y, p0[:, 1])
    assert out["alpha"].dtype == jnp.float64
    rel = jnp.abs(out["alpha"] - bt[:, 1]) / jnp.abs(bt[:, 1])
    # stops at the (absolute) 1e-6 tolerances, not at f64 resolution
    assert float(jnp.median(rel)) < 1e-7


def test_kernel_fraction_zero_short_circuits():
    """min_converged_fraction <= 0 mirrors batch.py's degenerate
    contract: need = 0, the launch loop never runs, and the initial
    state comes back untouched (alpha == alpha0, zero iterations)."""
    xd, Y, p0, _ = _problem()
    out = _kernel_solve(xd, Y, p0[:, 1], min_converged_fraction=0.0)
    np.testing.assert_array_equal(np.asarray(out["alpha"]),
                                  np.asarray(p0[:, 1]))
    assert not np.asarray(out["done"]).any()
    assert (np.asarray(out["iterations"]) == 0).all()
