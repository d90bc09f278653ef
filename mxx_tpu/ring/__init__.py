from .params import RingParams  # noqa: F401
