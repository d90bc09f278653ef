from .fe import Aky24FuncEnc, FuncEnc, NoCircuitEvaluator  # noqa: F401
