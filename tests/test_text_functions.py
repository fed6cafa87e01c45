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


def test_lm_familiarity_reference_model_semantics(spark):
    """The bigram model trains only on the ref_lang slice: a doc that
    repeats reference phrasing scores high ``fam``; an out-of-domain doc
    shares no bigram with the model (hits == 0); a doc under 2 tokens
    scores (0, 0, 0) instead of disappearing; empty input is total."""
    from vectorsearch_with_hnsw_spark.operators.textpipe import lm_familiarity

    rows = [
        (0, "the quick brown fox jumps", "en"),
        (1, "the quick brown dog runs", "en"),
        (2, "the quick brown fox sleeps", "de"),  # scores vs en model, doesn't train it
        (3, "zork gnab blarp wizzle", "de"),      # out-of-domain: zero hits
        (4, "solo", "en"),                         # < 2 tokens
    ]
    docs = spark.createDataFrame(
        [(i, t, l, "src0", len(t)) for i, t, l in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in lm_familiarity(docs, ref_lang="en").collect()}
    # "the quick" and "quick brown" occur twice in the en slice
    assert out[0].n_bigrams == 4 and out[0].hits == 4 and out[0].fam == 6
    # de doc 2 shares "the quick", "quick brown", "brown fox" with the model
    assert out[2].hits == 3 and out[2].fam == 5
    assert out[3].n_bigrams == 3 and out[3].hits == 0 and out[3].fam == 0
    assert (out[4].n_bigrams, out[4].hits, out[4].fam) == (0, 0, 0)
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert lm_familiarity(empty).count() == 0


def test_hashed_doc_vectors_bridge_semantics(spark):
    """Exact-duplicate texts hash to IDENTICAL unit vectors (the bridge
    makes exact text dedup visible to the vector surface); a token-less
    document gets the zero vector; norms are 1 (or 0) and the vectors
    compose with the existing kNN ops."""
    from vectorsearch_with_hnsw_spark.operators.knn import knn_exact
    from vectorsearch_with_hnsw_spark.operators.textpipe import hashed_doc_vectors

    rows = [
        (0, "spark shuffles the hash join"),
        (1, "spark shuffles the hash join"),   # exact dup of 0
        (2, "an entirely different sentence about windows"),
        (3, "   "),                             # no tokens -> zero vector
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: list(r.vec) for r in hashed_doc_vectors(docs, dim=16).collect()}
    assert out[0] == out[1], "identical text -> identical vector"
    assert out[0] != out[2]
    assert out[3] == [0.0] * 16
    for i in (0, 1, 2):
        assert abs(sum(x * x for x in out[i]) - 1.0) < 1e-12
    emb = spark.createDataFrame(
        [(i, v, 0) for i, v in out.items()], "vec_id long, embedding array<double>, label int"
    )
    q = emb.filter(F.col("vec_id") == 0).selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    top = {r.rnk: r.neighbor_id for r in knn_exact(emb, q, k=2, metric="l2").collect()}
    assert set(top.values()) == {0, 1}, "dup doc is the nearest neighbor at dist 0"


def test_familiarity_buckets_semantics(spark, sf_smoke):
    """CCNet buckets: within a language, higher familiarity rate never
    lands in a later bucket; bucket sizes are within one quantized-rate
    group of equal frequency; bucket ids span [1, n]; deterministic."""
    from collections import Counter

    from vectorsearch_with_hnsw_spark.operators.textpipe import familiarity_buckets
    from vectorsearch_with_hnsw_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    rows = familiarity_buckets(docs, ref_lang="en", n_buckets=3).collect()
    assert len(rows) == docs.count()
    assert {r.bucket for r in rows} <= {1, 2, 3}
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (-r.rate_ppm, r.doc_id))
        buckets = [r.bucket for r in rs]
        assert buckets == sorted(buckets), f"{lang}: bucket not monotone in rate"
        sizes = Counter(buckets)
        n = len(rs)
        if n >= 6:
            for b, c in sizes.items():
                assert c <= n, (lang, b, c)
        # docs sharing a quantized rate share a bucket
        seen = {}
        for r in rs:
            if r.rate_ppm in seen:
                assert seen[r.rate_ppm] == r.bucket
            seen[r.rate_ppm] = r.bucket
    again = familiarity_buckets(docs, ref_lang="en", n_buckets=3).collect()
    assert {(r.doc_id, r.bucket) for r in again} == {(r.doc_id, r.bucket) for r in rows}
    import pytest

    with pytest.raises(ValueError):
        familiarity_buckets(docs, n_buckets=0)


def test_strip_repeated_lines_keep_first(spark):
    """Planted intra-doc repeats: the first occurrence survives, later
    exact copies drop, distinct lines and order are untouched, and
    min_chars exempts short recurring lines (bullets)."""
    from vectorsearch_with_hnsw_spark.operators.textpipe import strip_repeated_lines

    docs = spark.createDataFrame(
        [
            (1, "cookie banner\nreal content one\ncookie banner\nreal content two\ncookie banner"),
            (2, "a\nunique line\na\nother line\na"),
            (3, "no repeats here\nsecond line"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in strip_repeated_lines(docs).collect()}
    assert got[1]["text_clean"] == "cookie banner\nreal content one\nreal content two"
    assert got[1]["n_repeats_removed"] == 2 and got[1]["n_lines"] == 5
    assert got[2]["text_clean"] == "a\nunique line\nother line"
    assert got[3]["n_repeats_removed"] == 0
    assert got[3]["text_clean"] == "no repeats here\nsecond line"
    assert got[4]["n_lines"] == 0 and got[4]["text_clean"] == ""
    # min_chars=2: single-char 'a' lines are exempt from dedup
    got2 = {
        r["doc_id"]: r
        for r in strip_repeated_lines(docs, min_chars=2).collect()
    }
    assert got2[2]["text_clean"] == "a\nunique line\na\nother line\na"
    assert got2[2]["n_repeats_removed"] == 0


def test_doc_dup_ngram_fraction_planted(spark):
    """Gopher's duplicate-n-gram coverage on crafted docs: a doc that
    is one trigram repeated scores ~1.0 on both fractions; a doc with
    no repeated trigram scores dup = 0 while the top fraction covers
    exactly one trigram's chars; short docs (< n tokens) score 0."""
    from vectorsearch_with_hnsw_spark.operators.textpipe import (
        doc_dup_ngram_fraction,
    )

    docs = spark.createDataFrame(
        [
            (1, "ab cd ef ab cd ef ab cd ef"),       # trigram repeated 3x
            (2, "aa bb cc dd ee ff gg"),             # all trigrams unique
            (3, "xx yy"),                            # shorter than n
            (4, "one two three four one two three"), # 'one two three' twice
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in doc_dup_ngram_fraction(docs, n=3).collect()}
    assert got[1]["dup_ngram_char_frac"] == 1.0
    assert got[1]["top_ngram_char_frac"] == 1.0
    assert got[1]["top_ngram_count"] >= 2
    assert got[2]["dup_ngram_char_frac"] == 0.0
    # 7 unique trigrams; the top one (count 1, lexicographic min) covers
    # exactly 3 tokens of 2 chars each out of 14 total
    assert got[2]["top_ngram_count"] == 1
    assert got[2]["top_ngram_char_frac"] == 6 / 14
    assert got[3]["dup_ngram_char_frac"] == 0.0 and got[3]["top_ngram_count"] == 0
    # doc 4: 'one two three' occurs twice -> covered tokens are
    # one,two,three,four? four is NOT inside any duplicated trigram
    # window: covered = positions 1-3 and 5-7 (1-based) = one two three
    # one two three = 3+3+5+3+3+5 = 22 chars of total 26
    assert got[4]["dup_ngram_char_frac"] == 22 / 26


def test_hashed_doc_vectors_kernel_matches_expression_assembly(spark, sf_smoke):
    """r14 optimization pin: the Arrow assembly kernel (numpy scatter +
    per-dim ascending norm fold) is BIT-IDENTICAL to the declarative
    map_from_entries + element_at + l2_normalize expression chain it
    replaced — same sequential fold order, same x/n per-element
    division, same zero-norm pass-through — on real testdata, not just
    toy rows."""
    from pyspark.sql import functions as F

    from vectorsearch_with_hnsw_spark.functions.text import poly_hash, tokens
    from vectorsearch_with_hnsw_spark.functions.vector import l2_normalize
    from vectorsearch_with_hnsw_spark.operators.textpipe import hashed_doc_vectors
    from vectorsearch_with_hnsw_spark.sources import load_table
    from vectorsearch_with_hnsw_spark.sources.tables import spread

    dim = 16
    docs = load_table(spark, sf_smoke, "documents")

    # the pre-r14 expression-chain reference, verbatim
    tok = spread(docs).select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("token")
    ).select("doc_id", poly_hash(F.col("token")).alias("h"))
    signed = tok.select(
        "doc_id",
        (F.col("h") % dim).cast("int").alias("bucket"),
        F.expr(f"CASE WHEN (h div {dim}) % 2 = 0 THEN 1 ELSE -1 END").alias("sign"),
    )
    vals = signed.groupBy("doc_id", "bucket").agg(F.sum("sign").alias("val"))
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("m"), i.cast("int")), F.lit(0).cast("long")
        ).cast("double"),
    )
    assembled = (
        vals.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("bucket", "val"))).alias("m"))
        .select("doc_id", raw.alias("raw"))
        .select("doc_id", l2_normalize(F.col("raw")).alias("vec"))
    )
    zero = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda i: F.lit(0.0))
    ref = (
        docs.select("doc_id")
        .join(assembled, "doc_id", "left")
        .select("doc_id", F.coalesce("vec", zero).alias("vec"))
    )

    got = {r.doc_id: r.vec for r in hashed_doc_vectors(docs, dim=dim).collect()}
    want = {r.doc_id: r.vec for r in ref.collect()}
    assert got.keys() == want.keys()
    # bitwise equality, element by element — no tolerance
    assert all(got[k] == want[k] for k in want), "kernel diverged from expression"
