from .vector import (
    METRICS,
    cosine_distance,
    dot,
    l2_distance,
    l2_norm,
    metric_expr,
    normalize_pixels,
    to_vec,
    validate_dim,
)

__all__ = [
    "METRICS",
    "cosine_distance",
    "dot",
    "l2_distance",
    "l2_norm",
    "metric_expr",
    "normalize_pixels",
    "to_vec",
    "validate_dim",
]
