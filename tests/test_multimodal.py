from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.multimodal.binary import (
    decode_image,
    extract_features,
    frame_sample,
)
from vectorsearch_with_hnsw_spark.sources import load_table


def test_decode_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_extract_features_schema_and_determinism(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    blobs = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    out = extract_features(blobs)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,f0:double,f1:double,f2:double,f3:double>"
    )
    a = {r["doc_id"]: (r["f0"], r["f1"], r["f2"], r["f3"]) for r in out.collect()}
    b = {r["doc_id"]: (r["f0"], r["f1"], r["f2"], r["f3"]) for r in out.collect()}
    assert a == b and len(a) == 50
    assert all(0.0 <= v < 1.0 for feats in a.values() for v in feats)


def test_frame_sample_plumbing(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(10)
    blobs = docs.select(
        F.col("doc_id").alias("vid_id"), F.encode("text", "utf-8").alias("payload")
    )
    frames = frame_sample(blobs, every_n=2)
    assert frames.schema.simpleString() == (
        "struct<vid_id:bigint,frame_no:int,frame_payload:binary>"
    )
    assert frames.count() >= 10


def test_resize_stub_schema_and_bounds(spark):
    """Resize plumbing: stable schema, output payload bounded by target,
    deterministic across runs, empty input -> empty output."""
    from pyspark.sql import functions as F

    from vectorsearch_with_hnsw_spark.multimodal.binary import resize_image

    blobs = spark.range(20).select(
        F.col("id").alias("img_id"),
        F.encode(F.concat(F.lit("pixels" * 100), F.col("id").cast("string")), "utf-8").alias("payload"),
    )
    out = resize_image(blobs, target=64)
    rows = out.collect()
    assert len(rows) == 20
    assert out.schema.simpleString() == "struct<img_id:bigint,width:int,height:int,resized_payload:binary>"
    for r in rows:
        assert 1 <= len(r["resized_payload"]) <= 64
        assert r["width"] >= 1 and r["width"] == r["height"]
    again = {r["img_id"]: bytes(r["resized_payload"]) for r in resize_image(blobs, target=64).collect()}
    assert {r["img_id"]: bytes(r["resized_payload"]) for r in rows} == again
    empty = resize_image(blobs.filter("img_id < 0"), target=64)
    assert empty.count() == 0
