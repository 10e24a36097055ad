"""Multi-start solves: batched global(-ish) optimization.

The reference solves from one start per call; hard NLLS problems (e.g. the
NIST StRD far starts) routinely need several. On TPU the marginal cost of
extra starts is tiny — they ride the same vmapped kernel as one — so
multi-start becomes a first-class verb: run S starts in one `solve_batch`,
return the best converged result (falling back to best ssr if none
converged).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .batch import solve_batch
from .optimizer.common import Options

__all__ = ["optimize_multistart", "latin_hypercube_starts", "best_of_raw"]


def best_of_raw(raw, ssr_rtol: float = 0.0):
    """Pure on-device best-row selection from a batched raw result pytree.

    Picks the row with the smallest ssr among converged finite rows —
    falling back to all finite rows when none converged — and slices every
    batch-leading leaf to it. jit/vmap/pjit-safe (lax.cond-free: the
    fallback is a mask select), so a full multistart pipeline
    ``best_of_raw(solve_batch(f, starts, ...))`` can live inside one
    compiled program (e.g. chained under lax.map, or per-problem under
    vmap). ``optimize_multistart`` uses it for its pick.

    ``ssr_rtol > 0`` enables the KKT-quality tie-break: among rows whose
    ssr is within ``(1 + ssr_rtol)`` of the best, the row with the
    smallest projected-gradient max (``raw["maxabs_gr"]``) wins. On
    sloppy models (exponential sums, NIST Bennett5/Lanczos class) the
    ssr landscape is flat to the dtype's rounding while parameters move
    ~1% — rounding-level ssr "wins" are then arbitrary, and the endpoint
    closest to stationarity is the better representative (measured: the
    tie-break picks the certified NIST basin on every f32 VarPro tie row,
    benchmarks/sweep_f32.py).
    """
    ssr = raw["ssr"]
    conv = raw["converged"]
    finite = jnp.isfinite(ssr)
    pick = conv & finite
    use_conv = jnp.any(pick)
    mask = jnp.where(use_conv, pick, finite)
    masked = jnp.where(mask, ssr, jnp.inf)
    if ssr_rtol > 0.0 and "maxabs_gr" in raw:
        smin = jnp.min(masked)
        tie = mask & (masked <= smin * (1.0 + ssr_rtol))
        g = jnp.where(tie, jnp.abs(raw["maxabs_gr"]), jnp.inf)
        best = jnp.argmin(g)
    else:
        best = jnp.argmin(masked)
    S = ssr.shape[0]
    return jax.tree_util.tree_map(
        lambda leaf: (
            leaf[best]
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == S
            else leaf
        ),
        raw,
    )


def latin_hypercube_starts(key, num_starts: int, lower, upper):
    """Latin-hypercube sample of `num_starts` starts in the box
    [lower, upper] — stratified per dimension, one cell per start."""
    lower = jnp.asarray(lower, dtype=jnp.result_type(lower, upper, float))
    upper = jnp.asarray(upper, lower.dtype)
    n = lower.shape[0]
    kperm, kjit = jax.random.split(key)
    # one random permutation of strata per dimension
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, num_starts)
    )(jax.random.split(kperm, n)).T  # (S, n)
    jitter = jax.random.uniform(kjit, (num_starts, n), dtype=lower.dtype)
    u = (perms + jitter) / num_starts
    return lower + u * (upper - lower)


def optimize_multistart(
    f: Callable,
    starts,
    optimizer=None,
    *,
    data=None,
    options: Optional[Options] = None,
    output_length: Optional[int] = None,
    lower=None,
    upper=None,
    materialize_jacobian: bool = True,
    autodiff: str = "forward",
    ssr_rtol: float = 0.0,
):
    """Solve from every row of ``starts`` (S, n) in one batched kernel and
    return ``(best_raw, all_raw)``.

    ``best_raw`` is the single raw result (pytree of unbatched leaves) with
    the smallest ssr among converged starts — or among all starts when none
    converged. ``all_raw`` is the full batched result for inspection.
    ``data``, if given, is shared by every start (not batched).
    ``ssr_rtol`` enables best_of_raw's KKT-quality tie-break on
    rounding-level ssr ties.
    """
    starts = jnp.asarray(starts)

    # Shared data rides as a broadcast (in_axes=None) runtime argument, not
    # a closure constant: large datasets aren't baked into the HLO, and a
    # new dataset of the same shape reuses the compiled kernel.
    raw = solve_batch(
        f,
        starts,
        data,
        optimizer,
        options=options,
        output_length=output_length,
        lower=lower,
        upper=upper,
        materialize_jacobian=materialize_jacobian,
        autodiff=autodiff,
        data_axis=None,
    )

    return best_of_raw(raw, ssr_rtol=ssr_rtol), raw
