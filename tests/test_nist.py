"""NIST StRD certified nonlinear-regression scoreboard.

Port of reference test/nonlinearfitting.jl: 16 datasets x 2 certified starts
x {Dogleg, LM} with QR and extreme tolerances (x_tol=1e-50, f_tol=1e-36,
g_tol=1e-50 — forcing g-convergence). The reference's hard assertion is only
!isnan(mean(minimizer)); we additionally gate on a minimum scoreboard count
so accuracy regressions fail loudly.

Model formulas below are implemented from the NIST model definitions
(https://www.itl.nist.gov/div898/strd/nls/nls_main.shtml).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.models.nist import DATASETS, MODELS

# Reference scoreboard (test/nonlinearfitting.jl:1464-1471) passes a subset
# of the 32 runs per optimizer; require at least this many here. Gates are
# measured-0: dogleg misses MGH09 s0 + MGH10 s0, lm misses MGH10 s0 — all
# far-start basin escapes, each recovered by the documented multistart
# recipe (test_nist_multistart_escape below). Any single-dataset regression
# fails loudly.
MIN_SCORE = {"dogleg": 30, "lm": 31}


def _scoreboard(optimizer):
    n, total = 0, 0
    misses = []
    for name, d in DATASETS.items():
        model = MODELS[name]
        xdata = jnp.asarray(d["x"])
        ydata = jnp.asarray(d["y"])
        sol = np.asarray(d["solution"])

        def residual(beta, xdata=xdata, ydata=ydata, model=model):
            return ydata - model(xdata, beta)

        # One problem (= one compiled executable) per dataset; the two
        # certified starts go through the x0 override.
        p = lso.least_squares_problem(
            f=residual, x=jnp.asarray(d["starts"][0], dtype=jnp.float64)
        )
        for start in d["starts"]:
            r = lso.optimize_problem(
                p, optimizer, x_tol=1e-50, f_tol=1e-36, g_tol=1e-50,
                x0=jnp.asarray(start, dtype=jnp.float64),
            )
            assert not np.isnan(np.mean(r.minimizer)), name
            total += 1
            if np.linalg.norm(r.minimizer - sol) <= 1e-3:
                n += 1
            else:
                misses.append((name, start))
    return n, total, misses


@pytest.mark.parametrize("opt_name", ["dogleg", "lm"])
def test_nist_strd_scoreboard(opt_name):
    opt = {
        "dogleg": lso.Dogleg(lso.QR()),
        "lm": lso.LevenbergMarquardt(lso.QR()),
    }[opt_name]
    n, total, misses = _scoreboard(opt)
    print(f"strd {opt_name} {n}/{total}  misses={misses}")
    assert total == 32
    assert n >= MIN_SCORE[opt_name], f"score {n}/{total}, misses={misses}"


@pytest.mark.parametrize("name", ["MGH09", "MGH10"])
def test_nist_multistart_escape(name):
    """The far-start misses above are basin escapes, not solver failures:
    the documented multistart recipe — Latin-hypercube starts over the box
    [min(s0,s1)/4, max(s0,s1)*4] spanned by the two certified starts —
    recovers the certified solution to well under the 1e-3 criterion.
    (The reference has no such escape; its scoreboard simply counts the
    miss, test/nonlinearfitting.jl:1466.)"""
    import jax

    d = DATASETS[name]
    model = MODELS[name]
    xdata = jnp.asarray(d["x"])
    ydata = jnp.asarray(d["y"])
    sol = np.asarray(d["solution"])

    def f(beta, data, model=model):
        x, y = data
        return y - model(x, beta)

    s0, s1 = (np.asarray(s, np.float64) for s in d["starts"])
    lo = jnp.asarray(np.minimum(s0, s1) / 4.0)
    hi = jnp.asarray(np.maximum(s0, s1) * 4.0)
    starts = lso.latin_hypercube_starts(jax.random.PRNGKey(0), 64, lo, hi)
    best, _ = lso.optimize_multistart(
        f, starts, data=(xdata, ydata), output_length=int(xdata.shape[0])
    )
    assert bool(best["converged"])
    err = np.linalg.norm(np.asarray(best["minimizer"]) - sol)
    assert err <= 1e-3, err
