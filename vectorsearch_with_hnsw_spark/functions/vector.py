"""Vector distance / norm expressions as native Column factories.

Pure Catalyst higher-order-function expressions — no UDFs — so distance
math stays inside whole-stage codegen and is eligible for pushdown /
pruning around it. Semantics mirror the reference exactly:

- L2: euclidean norm of the difference (reference ``l2_distance``,
  hsnw_trial.py:44-45).
- cosine: ``1 - dot/(||a||*||b||)`` with the zero-norm guard returning
  exactly 1.0 (reference ``cosine_distance``, hsnw_trial.py:48-54).
- metric registry keyed by name, unknown metric raises ValueError
  (reference ``_METRICS`` dispatch, hsnw_trial.py:57-60, 88-89).
- float32 storage, dimension validation on use (hsnw_trial.py:199-201).

All arithmetic is done in DOUBLE with a left-to-right fold
(``aggregate`` over ``zip_with``) so results are bit-identical to any
engine evaluating the same fold shape — this is what makes the DuckDB
oracle hash-stable without rounding tricks.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_vec(col: Column | str) -> Column:
    """Cast an array column to array<double> for exact, overflow-free math."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Inner product as a sequential double fold (bit-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance; same contract as reference l2 (hsnw_trial.py:44-45)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cosine similarity, returning exactly 1.0 when either norm is 0
    (reference zero-norm guard, hsnw_trial.py:51-52)."""
    na = l2_norm(a)
    nb = l2_norm(b)
    return F.when((na == F.lit(0.0)) | (nb == F.lit(0.0)), F.lit(1.0)).otherwise(
        F.lit(1.0) - dot(a, b) / (na * nb)
    )


def l2_normalize(a: Column) -> Column:
    """Project a vector onto the unit sphere; zero vectors pass through
    unchanged rather than producing NaNs (the same zero-norm guard the
    reference's cosine uses, hsnw_trial.py:51-52). Pure higher-order
    expression — stays in whole-stage codegen, no UDF."""
    n = l2_norm(a)
    return F.when(n == F.lit(0.0), a).otherwise(F.transform(a, lambda x: x / n))


METRICS: dict[str, Callable[[Column, Column], Column]] = {
    "l2": l2_distance,
    "cosine": cosine_distance,
}


def metric_expr(name: str) -> Callable[[Column, Column], Column]:
    """Metric dispatch with the reference's unknown-metric error
    (hsnw_trial.py:88-89)."""
    if name not in METRICS:
        raise ValueError(f"Unknown metric '{name}'. Available: {sorted(METRICS)}")
    return METRICS[name]


def validate_dim(vec: Column, dim: int) -> Column:
    """Boolean predicate: vector has the expected dimensionality
    (reference dim check on every insert/query, hsnw_trial.py:199, 269)."""
    return F.size(vec) == F.lit(dim)


def flatten_image(mat: Column) -> Column:
    """Row-major flatten of a nested array (image matrix -> vector): the
    FashionMNIST reshape(n, -1) projection (notebook cell 4) as a pure
    higher-order function."""
    return F.flatten(mat)


def normalize_pixels(vec: Column, denom: float = 255.0) -> Column:
    """Per-element ``x / denom`` projection — the FashionMNIST
    flatten+normalize step (`/255.0`, FashionMNIST notebook cell 4) as a
    pure higher-order projection (no shuffle, codegen'd)."""
    return F.transform(to_vec(vec), lambda x: x / F.lit(denom))
