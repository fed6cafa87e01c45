from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.functions.text import (
    fingerprint,
    lang_id,
    token_count,
    word_shingles,
)
from vectorsearch_with_hnsw_spark.index.local_hnsw import HnswParams, LocalHNSW


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).first()["v"]


def test_lang_id_und_when_no_stopwords(spark):
    assert _one(spark, "zzz qqq xxx", lang_id(F.col("text"))) == "und"
    assert _one(spark, "the quick fox", lang_id(F.col("text"))) == "en"
    assert _one(spark, "der und das", lang_id(F.col("text"))) == "de"


def test_token_count_whitespace_runs(spark):
    assert _one(spark, "  a   b\tc  ", token_count(F.col("text"))) == 3
    assert _one(spark, "", token_count(F.col("text"))) == 0


def test_shingles_short_text_empty(spark):
    assert _one(spark, "one two", word_shingles(F.col("text"), 3)) == []
    assert _one(spark, "one two three four", word_shingles(F.col("text"), 3)) == [
        "one two three",
        "two three four",
    ]


def test_fingerprint_case_whitespace_invariant(spark):
    a = _one(spark, "Hello  World", fingerprint(F.col("text")))
    b = _one(spark, "  hello world ", fingerprint(F.col("text")))
    assert a == b


def test_kernel_cosine_zero_vector_guard():
    """float32 kernel path: cosine distance to/from a zero vector is
    exactly 1.0 (reference hsnw_trial.py:51-52)."""
    idx = LocalHNSW(HnswParams(dim=4, metric="cosine"))
    data = np.array(
        [[0.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]],
        dtype=np.float32,
    )
    idx.add_batch(np.arange(3), data)
    res = dict(idx.search(np.zeros(4, dtype=np.float32), k=3))
    assert res[1] == 1.0 and res[2] == 1.0  # zero-norm query → dist exactly 1.0
    res2 = dict(idx.search(data[1], k=3))
    assert res2[0] == 1.0  # zero-norm stored vector → dist exactly 1.0
