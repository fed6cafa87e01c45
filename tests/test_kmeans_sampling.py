"""Property tests for the k-means trainer (ivf.kmeans_fit) and
deterministic weighted sampling (textpipe.weighted_sample)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.operators.ivf import kmeans_fit
from vectorsearch_with_hnsw_spark.operators.textpipe import weighted_sample
from vectorsearch_with_hnsw_spark.sources import load_table


def test_kmeans_partition_and_cells(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    n = emb.count()
    out = kmeans_fit(emb, dim=64, k=8, iters=2).collect()
    assert len(out) == n, "every vector assigned exactly once"
    assert len({r.vec_id for r in out}) == n
    assert all(0 <= r.cell < 8 for r in out)
    assert all(r.d2 >= 0.0 for r in out)


def test_kmeans_iterations_do_not_worsen_sse(spark, sf_smoke):
    """Lloyd's algorithm is monotone non-increasing in the summed
    within-cluster squared distance; the decimal-exact mean update
    preserves that on this data."""
    emb = load_table(spark, sf_smoke, "embeddings")
    sse = []
    for iters in (0, 1, 2):
        out = kmeans_fit(emb, dim=64, k=8, iters=iters)
        sse.append(out.agg(F.sum("d2")).collect()[0][0])
    assert sse[1] <= sse[0] + 1e-9
    assert sse[2] <= sse[1] + 1e-9


def test_weighted_sample_deterministic_and_bounded(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    a = weighted_sample(docs, n_per_group=10).collect()
    b = weighted_sample(docs, n_per_group=10).collect()
    assert sorted((r.doc_id, r.rnk) for r in a) == sorted((r.doc_id, r.rnk) for r in b)
    from collections import Counter

    per_group = Counter(r.lang for r in a)
    group_sizes = {
        r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, cnt in per_group.items():
        assert cnt == min(10, group_sizes[lang])


def test_mix_corpus_proportions_and_determinism(spark, sf_smoke):
    """The binding source (largest target here, equal counts) keeps all
    rows; other sources land near f_s/f_b of their rows; untargeted
    sources are dropped; the selection repeats exactly."""
    from vectorsearch_with_hnsw_spark.operators.textpipe import mix_corpus

    docs = load_table(spark, sf_smoke, "documents")
    targets = {"src0": 40, "src1": 30, "src2": 20, "src3": 10}
    a = mix_corpus(docs, targets).collect()
    b = mix_corpus(docs, targets).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    from collections import Counter

    kept = Counter(r.source for r in a)
    n_src = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(kept) <= set(targets), "untargeted sources dropped"
    assert kept["src0"] == n_src["src0"], "binding source keeps 100%"
    # hash gating is approximate per source: expected rate f_s/40
    for s, f in targets.items():
        expected = n_src[s] * f / 40
        assert abs(kept.get(s, 0) - expected) <= max(4, 0.45 * expected), (s, kept.get(s), expected)
    import pytest

    with pytest.raises(ValueError):
        mix_corpus(docs, {})


def test_weighted_sample_prefers_heavy_rows(spark, sf_smoke):
    """Priority sampling keeps higher-weight rows more often: the
    sampled set's mean weight must exceed the population mean (a weak
    but deterministic check on this fixed data)."""
    docs = load_table(spark, sf_smoke, "documents")
    pop_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    samp = weighted_sample(docs, n_per_group=25).collect()
    samp_mean = sum(r.weight for r in samp) / len(samp)
    assert samp_mean > pop_mean


def test_approx_top_tokens_error_bound(spark, sf_smoke):
    """Misra-Gries guarantee: estimates never exceed true counts, and
    the undercount is bounded by total_tokens / (capacity + 1); with a
    tight capacity the true heavy hitters still surface."""
    from vectorsearch_with_hnsw_spark.functions.text import tokens as tok_expr
    from vectorsearch_with_hnsw_spark.operators.textpipe import approx_top_tokens

    docs = load_table(spark, sf_smoke, "documents")
    exact = {
        r.token: r.n
        for r in docs.select(
            F.explode(tok_expr(F.lower(F.col("text")))).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(exact.values())
    cap = 16
    est = {r.token: r.est_count for r in approx_top_tokens(docs, k=10, capacity=cap).collect()}
    assert est, "sketch returns heavy hitters"
    bound = total / (cap + 1)
    for t, e in est.items():
        assert e <= exact[t], (t, e, exact[t])
        assert exact[t] - e <= bound + 1, (t, e, exact[t], bound)
    # the single most frequent true token must be found
    top_true = max(exact, key=lambda t: (exact[t], t))
    assert top_true in est


def test_mix_corpus_temperature_flattening(spark, sf_smoke):
    """alpha=0.5 sampling: the smallest source keeps 100%, every other
    source keeps ~sqrt(n_b/n_s) of its rows (flattening the size
    distribution halfway), selection is deterministic, and invalid
    alpha raises."""
    import math

    import pytest

    from vectorsearch_with_hnsw_spark.operators.textpipe import mix_corpus_temperature

    docs = load_table(spark, sf_smoke, "documents")
    a = mix_corpus_temperature(docs).collect()
    b = mix_corpus_temperature(docs).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    from collections import Counter

    kept = Counter(r.source for r in a)
    n_src = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    nb = min(n_src.values())
    binding = min(s for s, n in n_src.items() if n == nb)
    assert kept[binding] == nb, "smallest source keeps every row"
    for s, n in n_src.items():
        expected = n * math.sqrt(nb / n)
        assert abs(kept.get(s, 0) - expected) <= max(4, 0.45 * expected), (
            s, kept.get(s), expected,
        )
    with pytest.raises(ValueError):
        mix_corpus_temperature(docs, alpha=0.0)
    with pytest.raises(ValueError):
        mix_corpus_temperature(docs, alpha=1.5)
