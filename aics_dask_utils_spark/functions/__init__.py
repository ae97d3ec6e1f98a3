"""Column-level helper functions shared by plans and operators."""

from .deterministic import dsum, davg, drounded  # noqa: F401
from .vectors import (  # noqa: F401
    vec_dot,
    vec_norm,
    vec_cosine,
    as_double_array,
)
