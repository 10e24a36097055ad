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

from nist_data import DATASETS

MODELS = {
    "misra1a": lambda x, b: b[0] * (1.0 - jnp.exp(-b[1] * x)),
    "Misra1b": lambda x, b: b[0] * (1.0 - (1.0 + b[1] * x / 2.0) ** (-2.0)),
    "Chwirut1": lambda x, b: jnp.exp(-b[0] * x) / (b[1] + b[2] * x),
    "Chwirut2": lambda x, b: jnp.exp(-b[0] * x) / (b[1] + b[2] * x),
    "Lanczos3": lambda x, b: (
        b[0] * jnp.exp(-b[1] * x) + b[2] * jnp.exp(-b[3] * x)
        + b[4] * jnp.exp(-b[5] * x)
    ),
    "Gauss1": lambda x, b: (
        b[0] * jnp.exp(-b[1] * x)
        + b[2] * jnp.exp(-((x - b[3]) ** 2) / b[4] ** 2)
        + b[5] * jnp.exp(-((x - b[6]) ** 2) / b[7] ** 2)
    ),
    "Gauss2": lambda x, b: (
        b[0] * jnp.exp(-b[1] * x)
        + b[2] * jnp.exp(-((x - b[3]) ** 2) / b[4] ** 2)
        + b[5] * jnp.exp(-((x - b[6]) ** 2) / b[7] ** 2)
    ),
    "DanWood": lambda x, b: b[0] * x ** b[1],
    "MGH09": lambda x, b: b[0] * (x**2 + x * b[1]) / (x**2 + x * b[2] + b[3]),
    "Thurber": lambda x, b: (
        (b[0] + b[1] * x + b[2] * x**2 + b[3] * x**3)
        / (1.0 + b[4] * x + b[5] * x**2 + b[6] * x**3)
    ),
    "BoxBOD": lambda x, b: b[0] * (1.0 - jnp.exp(-b[1] * x)),
    "Rat42": lambda x, b: b[0] / (1.0 + jnp.exp(b[1] - b[2] * x)),
    "MGH10": lambda x, b: b[0] * jnp.exp(b[1] / (x + b[2])),
    "Eckerle4": lambda x, b: (
        (b[0] / b[1]) * jnp.exp(-((x - b[2]) ** 2) / (2.0 * b[1] ** 2))
    ),
    "Rat43": lambda x, b: b[0] / (1.0 + jnp.exp(b[1] - b[2] * x)) ** (1.0 / b[3]),
    "Bennet5": lambda x, b: b[0] * (b[1] + x) ** (-1.0 / b[2]),
}

# Reference scoreboard (test/nonlinearfitting.jl:1464-1471) passes a subset
# of the 32 runs per optimizer; require at least this many here.
MIN_SCORE = {"dogleg": 22, "lm": 22}


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

        for start in d["starts"]:
            p = lso.least_squares_problem(
                f=residual, x=jnp.asarray(start, dtype=jnp.float64)
            )
            r = lso.optimize_problem(
                p, optimizer, x_tol=1e-50, f_tol=1e-36, g_tol=1e-50
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
