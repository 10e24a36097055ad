"""Shared numeric constants for the trust-region optimizers.

These mirror the reference's shared optimizer constants
(reference: src/types.jl:107-111) so that trust-region dynamics —
and therefore iteration counts and convergence behavior — are
directly comparable with LeastSquaresOptim.jl.
"""

# Minimum / maximum trust region radius (reference: src/types.jl:107-108).
MIN_TRUST_REGION_RADIUS = 1e-16
MAX_TRUST_REGION_RADIUS = 1e16

# Gain ratio below which a step is rejected (reference: src/types.jl:109).
MIN_STEP_QUALITY = 1e-3

# Clamp band for the scaling diagonal D'D (reference: src/types.jl:110-111).
MIN_DIAGONAL = 1e-6
MAX_DIAGONAL = 1e32

# Dogleg trust-region thresholds (reference: src/optimizer/dogleg.jl:38-39).
# (The reference also defines a GOOD_STEP_QUALITY = 0.75 for LM, but its LM
# loop never reads it — the Ceres radius formula replaces it — so it is not
# mirrored here.)
DECREASE_THRESHOLD = 0.25
INCREASE_THRESHOLD = 0.75

# Default convergence tolerances and iteration cap
# (reference: src/types.jl:196-199). These are the f64 values — the
# reference runs in Float64 everywhere, so 1e-8 is meaningful there.
DEFAULT_X_TOL = 1e-8
DEFAULT_F_TOL = 1e-8
DEFAULT_G_TOL = 1e-8
DEFAULT_ITERATIONS = 1000

# f32 dtype-scaled tolerance defaults (the TPU perf surface). The f-criterion
# compares the per-step reduction against f_tol * ssr: even with the
# cancellation-free diff-of-squares reduction (optimizer/*.py), each residual
# carries ~eps_f32 = 1.19e-7 relative rounding from its own evaluation, so
# the measured reduction has a noise floor of a few eps * ssr — an f64-scaled
# 1e-8 threshold can never fire and the loop runs to the iteration cap
# (docs/ROADMAP.md round-1 item 2). Floors chosen a small multiple above
# that noise floor; x/g floors likewise sit near sqrt(eps_f32) ~ 3.5e-4
# scaled down by the typical accuracy slack the NIST 1e-3 criterion needs.
F32_X_TOL = 1e-6
F32_F_TOL = 1e-6
F32_G_TOL = 1e-5


def default_tolerances(dtype):
    """(x_tol, f_tol, g_tol) defaults for ``dtype``.

    f64 keeps the reference's 1e-8 (parity); f32 gets the tuned
    noise-floor-scaled constants above; other low-precision dtypes
    (bf16/f16) get the same *ratios* derived from their own eps
    (x = f = ~8 eps, g = ~80 eps — the f32 constants expressed
    generically), so the f-criterion floor always sits a small multiple
    above that dtype's reduction noise.
    """
    import jax.numpy as _jnp  # jnp.finfo understands ml_dtypes (bf16/f16)

    info = _jnp.finfo(dtype)
    if info.bits >= 64:
        return DEFAULT_X_TOL, DEFAULT_F_TOL, DEFAULT_G_TOL
    if info.bits == 32:
        return F32_X_TOL, F32_F_TOL, F32_G_TOL
    eps = float(info.eps)
    return 8.0 * eps, 8.0 * eps, 80.0 * eps

# Default initial trust-region radii
# (reference: levenberg_marquardt.jl:42, dogleg.jl:44).
DEFAULT_RADIUS_LM = 10.0
DEFAULT_RADIUS_DOGLEG = 1.0

# Geodesic acceleration (LevenbergMarquardt(geodesic=True); no reference
# analogue — Transtrum & Sethna 2012). The second-order correction is
# added only when ||a|| <= GEODESIC_ALPHA * ||v||; beyond that the local
# quadratic model is untrustworthy and the plain first-order step is
# kept (the standard avmax guard, e.g. GSL multifit_nlinear's 0.75).
GEODESIC_ALPHA = 0.75

# LSMR defaults (reference: src/utils/lsmr.jl:53-55) and the deliberately
# inexact inner tolerance used for damped LM solves
# (reference: src/solver/iterative_lsmr.jl:255, per Wright & Holt 1985).
LSMR_ATOL = 1e-6
LSMR_BTOL = 1e-6
LSMR_CONLIM = 1e8
LSMR_DAMPED_BTOL = 0.5
