from africanus_tpu.rime.fused.core import rime, RimeFactory, consolidate_args
from africanus_tpu.rime.fused.specification import (
    RimeSpecification,
    RimeParseError,
    RimeSpecificationError,
)
from africanus_tpu.rime.fused.terms import (
    Term,
    TermValue,
    term_mul,
    hermitian,
    Phase,
    Brightness,
    Gaussian,
    FeedRotation,
    BeamCubeDDE,
)

__all__ = [
    "rime", "RimeFactory", "consolidate_args",
    "RimeSpecification", "RimeParseError", "RimeSpecificationError",
    "Term", "TermValue", "term_mul", "hermitian",
    "Phase", "Brightness", "Gaussian", "FeedRotation", "BeamCubeDDE",
]
