from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.functions.vector import (
    cosine_distance,
    dot,
    l2_distance,
    l2_norm,
    l2_normalize,
    metric_expr,
    normalize_pixels,
    to_vec,
    validate_dim,
)


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        (2, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        (3, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),  # zero-norm guard
        (4, [2.0, 0.0, 0.0], [-2.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "id int, a array<double>, b array<double>")


def _vals(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_l2(pairs):
    v = _vals(pairs.select("id", l2_distance(F.col("a"), F.col("b")).alias("d")), "d")
    assert v[1] == pytest.approx(math.sqrt(2))
    assert v[2] == 0.0
    assert v[4] == 4.0


def test_cosine_and_zero_norm_guard(pairs):
    v = _vals(pairs.select("id", cosine_distance(F.col("a"), F.col("b")).alias("d")), "d")
    assert v[1] == pytest.approx(1.0)  # orthogonal
    assert v[2] == pytest.approx(0.0)  # identical
    assert v[3] == 1.0  # EXACTLY 1.0: reference zero-norm contract
    assert v[4] == pytest.approx(2.0)  # opposite

def test_dot_and_norm(pairs):
    v = _vals(pairs.select("id", dot(F.col("a"), F.col("b")).alias("d")), "d")
    assert v[2] == 14.0
    n = _vals(pairs.select("id", l2_norm(F.col("a")).alias("n")), "n")
    assert n[2] == pytest.approx(math.sqrt(14))


def test_metric_registry():
    assert metric_expr("l2") is l2_distance
    assert metric_expr("cosine") is cosine_distance
    with pytest.raises(ValueError, match="Unknown metric"):
        metric_expr("dotproduct")


def test_validate_dim_and_normalize(pairs):
    ok = _vals(pairs.select("id", validate_dim(F.col("a"), 3).alias("ok")), "ok")
    assert all(ok.values())
    norm = _vals(
        pairs.select("id", F.element_at(normalize_pixels(F.col("a")), 1).alias("h")), "h"
    )
    assert norm[4] == pytest.approx(2.0 / 255.0)


def test_distances_stay_native(pairs):
    """Distance expressions must not introduce Python UDF nodes."""
    df = pairs.select(l2_distance(to_vec("a"), to_vec("b")).alias("d"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_l2_normalize_unit_and_zero_guard(pairs):
    out = pairs.select(
        "id",
        l2_norm(l2_normalize(F.col("a"))).alias("n"),
        F.element_at(l2_normalize(F.col("a")), 1).alias("h"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[2]["n"] == pytest.approx(1.0)
    assert by_id[2]["h"] == pytest.approx(1.0 / math.sqrt(14.0))
    assert by_id[3]["n"] == 0.0  # zero vector passes through, no NaN
    assert by_id[4]["h"] == pytest.approx(1.0)
