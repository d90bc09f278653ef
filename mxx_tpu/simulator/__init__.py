from .norms import (  # noqa: F401
    ErrorNorm,
    NormPltLWEEvaluator,
    PolyMatrixNorm,
    PolyNorm,
    SimulatorContext,
    bits_ceil,
    compute_preimage_norm,
    simulate_max_error_norm,
)
