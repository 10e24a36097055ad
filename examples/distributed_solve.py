"""Residual-row-sharded solve over a device mesh.

Run single-chip, or with virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/distributed_solve.py
On a multi-host pod, call lso.parallel.initialize_multihost() first.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import leastsquaresoptim_jl_tpu as lso
from leastsquaresoptim_jl_tpu.parallel import make_mesh, shard_rows, solve_sharded


def main():
    ndev = len(jax.devices())
    mesh = make_mesh((ndev,), ("rows",))
    m = 4096 * ndev

    xdata = jnp.linspace(1.0, 80.0, m)
    ydata = 240.0 * (1 - jnp.exp(-5e-2 * xdata))

    def per_row(beta, row):
        xr, yr = row
        return yr - beta[0] * (1 - jnp.exp(-beta[1] * xr))

    data = shard_rows((xdata, ydata), mesh)
    raw = solve_sharded(
        per_row, data, jnp.array([200.0, 1e-1]), mesh,
        lso.LevenbergMarquardt(lso.LSMR()),
    )
    print(f"devices={ndev} m={m}")
    print("minimizer:", np.asarray(raw["minimizer"]))
    print("converged:", bool(raw["converged"]),
          "iters:", int(raw["iterations"]),
          "matvecs:", int(raw["mul_calls"]))


if __name__ == "__main__":
    main()
