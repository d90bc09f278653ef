from .public_lut import PublicLut  # noqa: F401
from .poly_eval import PolyPltEvaluator  # noqa: F401
