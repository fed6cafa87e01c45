"""Bloom-filter runtime pruning (plans/bloom.py): exactness, the
no-false-negative guarantee, a bounded false-positive rate, and the
plan property that the membership test sits on the fact side before a
broadcast join."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.plans.bloom import (
    bloom_build,
    bloom_pruned_join,
    might_contain,
)
from vectorsearch_with_hnsw_spark.plans.checks import formatted_plan, uses_broadcast_join
from vectorsearch_with_hnsw_spark.sources import load_table


def test_no_false_negatives(spark):
    keys = spark.range(0, 5000).select((F.col("id") * 37 + 11).alias("k"))
    bf = bloom_build(keys, "k")
    missed = keys.filter(~might_contain(bf, F.col("k"))).count()
    assert missed == 0


def test_build_params_travel_with_filter(spark):
    """The artifact carries num_bits/num_hashes, so probing can never
    use different parameters than the build (the false-negative trap)."""
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    bf = bloom_build(keys, "k", num_bits=1 << 12, num_hashes=3)
    assert bf.num_bits == 1 << 12 and bf.num_hashes == 3
    assert len(bf.words) == (1 << 12) // 64
    assert keys.filter(~might_contain(bf, F.col("k"))).count() == 0


def test_pruned_join_rejects_outer_joins(spark):
    """Outer/anti joins must keep unmatched fact rows; pre-filtering
    would drop them, so the API refuses instead of silently corrupting."""
    import pytest

    fact = spark.range(0, 10).select(F.col("id").alias("fk"))
    dim = spark.range(0, 3).select(F.col("id").alias("dk"))
    for how in ("left", "left_outer", "full", "left_anti", "right"):
        with pytest.raises(ValueError, match="inner/semi"):
            bloom_pruned_join(fact, dim, "fk", "dk", how=how)
    for how in ("inner", "semi", "left_semi", "leftsemi"):
        bloom_pruned_join(fact, dim, "fk", "dk", how=how)


def test_false_positive_rate_bounded(spark):
    keys = spark.range(0, 5000).select((F.col("id") * 37 + 11).alias("k"))
    bf = bloom_build(keys, "k")
    # probe with keys guaranteed disjoint from the build set (different residue)
    probes = spark.range(0, 20000).select((F.col("id") * 37 + 12).alias("k"))
    fp = probes.filter(might_contain(bf, F.col("k"))).count()
    # 5000 keys in 2^17 bits, 5 hashes -> theoretical fpp ~0.03%; allow 1%
    assert fp / 20000 < 0.01


def test_bloom_pruned_join_equals_plain_join(spark, sf_smoke):
    cust = (
        load_table(spark, sf_smoke, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_name")
    )
    orders = load_table(spark, sf_smoke, "orders").select("o_custkey", "o_orderkey")
    got = bloom_pruned_join(orders, cust, fact_key="o_custkey", dim_key="c_custkey")
    want = orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "inner")
    cols = ["o_orderkey", "c_custkey"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_pruned_plan_is_broadcast_join_with_fact_side_filter(spark, sf_smoke):
    cust = (
        load_table(spark, sf_smoke, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_smoke, "orders").select("o_custkey", "o_totalprice")
    out = bloom_pruned_join(orders, cust, fact_key="o_custkey", dim_key="c_custkey")
    assert uses_broadcast_join(out)
    # the membership test must appear as a Filter in the plan (fact side,
    # upstream of the join), not as a post-join residual
    plan = formatted_plan(out)
    assert "Filter" in plan and "xxhash64" in plan
