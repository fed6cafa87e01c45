from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.multimodal.binary import (
    decode_image,
    extract_features,
    frame_sample,
)
from vectorsearch_with_hnsw_spark.sources import load_table


def test_decode_gate_matches_pillow_availability():
    """Without Pillow the decode path is an explicit NotImplementedError
    (both the function and the decoder='image' kernel up front); with it,
    decode is expected to work — covered by the skipif test below."""
    from vectorsearch_with_hnsw_spark.multimodal.binary import HAS_PIL

    if HAS_PIL:
        pytest.skip("Pillow present: decode is live, gate test n/a")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_extract_features_image_decoder_gate(spark):
    from vectorsearch_with_hnsw_spark.multimodal.binary import HAS_PIL

    blobs = spark.range(3).select(
        F.col("id").alias("doc_id"), F.encode(F.lit("xx"), "utf-8").alias("payload")
    )
    with pytest.raises(ValueError, match="unknown decoder"):
        extract_features(blobs, decoder="resnet")
    if not HAS_PIL:
        with pytest.raises(NotImplementedError):
            extract_features(blobs, decoder="image")


@pytest.mark.skipif(
    not __import__(
        "vectorsearch_with_hnsw_spark.multimodal.binary", fromlist=["HAS_PIL"]
    ).HAS_PIL,
    reason="Pillow not installed in this container",
)
def test_real_decode_roundtrip(spark):
    """With Pillow present: a real encoded PNG decodes to HWC uint8 and
    the image-decoder kernel produces bounded channel statistics."""
    import io

    from PIL import Image

    import numpy as np

    im = Image.fromarray(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    arr = decode_image(buf.getvalue())
    assert arr.shape == (4, 4, 3) and arr.dtype == np.uint8
    blobs = spark.createDataFrame([(0, bytearray(buf.getvalue()))], "doc_id long, payload binary")
    rows = extract_features(blobs, decoder="image").collect()
    assert len(rows) == 1 and all(0.0 <= rows[0][f"f{i}"] <= 1.0 for i in range(4))


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


def test_embed_build_query_pipeline_end_to_end(spark, sf_smoke):
    """SURVEY §2A row 30 composed: binary payload -> batched feature
    extraction -> validity filter -> HNSW build -> kNN query -> label
    join (the CIFAR notebook cell 3-4 pipeline, Spark-shaped). The
    4-dim fake embedding stands in for the stubbed model; every other
    stage is the real operator."""
    from pyspark.sql import functions as F

    from vectorsearch_with_hnsw_spark.index.build import HnswParams, hnsw_build
    from vectorsearch_with_hnsw_spark.index.query import knn_hnsw
    from vectorsearch_with_hnsw_spark.multimodal.binary import N_FEATURES, extract_features
    from vectorsearch_with_hnsw_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(300)
    blobs = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    feats = extract_features(blobs)
    vec = F.array(*[F.col(f"f{i}") for i in range(N_FEATURES)]).cast("array<float>")
    embedded = feats.select(F.col("doc_id").alias("id"), vec.alias("vec"))
    valid = embedded.filter(F.size("vec") == N_FEATURES)  # validity gate (cell 3)
    idx = hnsw_build(valid, HnswParams(dim=N_FEATURES, metric="cosine"), num_partitions=2)
    q = valid.filter(F.col("id") < 3).select(
        F.col("id").alias("query_id"), F.col("vec").alias("query_vec")
    )
    res = knn_hnsw(idx, q, k=5).join(
        docs.select(F.col("doc_id").alias("neighbor_id"), "lang"), "neighbor_id"
    )
    rows = res.collect()
    assert len(rows) == 3 * 5
    for r in rows:
        assert r["lang"] is not None  # label joined for every hit
        if r["rnk"] == 1:
            assert r["neighbor_id"] == r["query_id"] and abs(r["dist"]) < 1e-6


def test_embed_with_model_broadcast_weights(spark, sf_smoke):
    """The broadcast-weights inference path: weights ship via
    sc.broadcast, materialize lazily per executor, and the projection
    equals the hand-computed integer matmul over the payload-hash
    feature numerators."""
    import numpy as np

    from vectorsearch_with_hnsw_spark.multimodal.binary import (
        N_FEATURES,
        _payload_hash,
        embed_with_model,
        make_projection_weights,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(50)
    blobs = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    got = {r["doc_id"]: r for r in embed_with_model(blobs).collect()}
    W = make_projection_weights()
    for r in blobs.collect():
        h = _payload_hash(bytes(r["payload"]))
        feats = np.array([(h * (i + 1)) % 1009 for i in range(N_FEATURES)], dtype=np.int64)
        want = feats @ W
        have = np.array([got[r["doc_id"]][f"e{j}"] for j in range(W.shape[1])])
        assert np.array_equal(have, want.astype(np.float64)), r["doc_id"]


def test_embed_with_model_custom_and_invalid_weights(spark, sf_smoke):
    import numpy as np
    import pytest as _pytest

    from vectorsearch_with_hnsw_spark.multimodal.binary import embed_with_model

    docs = load_table(spark, sf_smoke, "documents").limit(5)
    blobs = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    out = embed_with_model(blobs, weights=np.ones((4, 3), dtype=np.int64))
    assert out.columns == ["doc_id", "e0", "e1", "e2"]
    # all-ones weights: every output dim equals the feature sum
    row = out.collect()[0]
    assert row["e0"] == row["e1"] == row["e2"]
    with _pytest.raises(ValueError, match="input rows"):
        embed_with_model(blobs, weights=np.ones((3, 2), dtype=np.int64))


def test_projection_weights_deterministic():
    import numpy as np

    from vectorsearch_with_hnsw_spark.multimodal.binary import make_projection_weights

    a, b = make_projection_weights(), make_projection_weights()
    assert np.array_equal(a, b)
    assert a.min() >= -8 and a.max() <= 7
    assert not np.array_equal(a, make_projection_weights(seed=8))


def test_payload_dup_pairs_star_semantics(spark):
    """Identical payloads pair to the min-id representative (star
    edges, O(n) per clique); distinct payloads never pair; singletons
    emit nothing."""
    from vectorsearch_with_hnsw_spark.multimodal.binary import payload_dup_pairs

    rows = [
        (1, b"same-bytes"),
        (5, b"same-bytes"),
        (9, b"same-bytes"),
        (2, b"unique-a"),
        (3, b"unique-b"),
    ]
    blobs = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sorted(tuple(r) for r in payload_dup_pairs(blobs).collect())
    assert got == [(1, 5), (1, 9)]
