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
DECREASE_THRESHOLD = 0.25
INCREASE_THRESHOLD = 0.75

# LM "good step" threshold (reference: src/optimizer/levenberg_marquardt.jl:37).
GOOD_STEP_QUALITY = 0.75

# Default convergence tolerances and iteration cap
# (reference: src/types.jl:196-199).
DEFAULT_X_TOL = 1e-8
DEFAULT_F_TOL = 1e-8
DEFAULT_G_TOL = 1e-8
DEFAULT_ITERATIONS = 1000

# Default initial trust-region radii
# (reference: levenberg_marquardt.jl:42, dogleg.jl:44).
DEFAULT_RADIUS_LM = 10.0
DEFAULT_RADIUS_DOGLEG = 1.0

# LSMR defaults (reference: src/utils/lsmr.jl:53-55) and the deliberately
# inexact inner tolerance used for damped LM solves
# (reference: src/solver/iterative_lsmr.jl:255, per Wright & Holt 1985).
LSMR_ATOL = 1e-6
LSMR_BTOL = 1e-6
LSMR_CONLIM = 1e8
LSMR_DAMPED_BTOL = 0.5
