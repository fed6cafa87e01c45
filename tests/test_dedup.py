"""Unit-level dedup semantics beyond the oracle comparison."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.operators import dedup as D
from vectorsearch_with_hnsw_spark.sources import load_table


@pytest.fixture(scope="module")
def docs_with_dups(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    # inject exact duplicates (case/whitespace variants) of doc 0
    d0 = docs.filter(F.col("doc_id") == 0)
    dup1 = d0.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.upper("text").alias("text"), "lang", "source", "n_chars",
    )
    dup2 = d0.select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.lit("  "), F.col("text"), F.lit("   ")).alias("text"),
        "lang", "source", "n_chars",
    )
    return docs.unionByName(dup1).unionByName(dup2)


def test_exact_dedup_normalizes_case_and_whitespace(docs_with_dups):
    groups = D.dedup_exact(docs_with_dups).filter(F.col("n_dups") > 1).collect()
    assert len(groups) == 1
    assert groups[0]["keeper_doc_id"] == 0 and groups[0]["n_dups"] == 3


def test_jaccard_identical_docs_score_1(docs_with_dups):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs_with_dups, threshold=0.9).collect()
    }
    assert pairs.get((0, 10_000)) == 1.0
    assert pairs.get((0, 20_000)) == 1.0


def test_minhash_identical_docs_collide(docs_with_dups):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in D.minhash_lsh_pairs(docs_with_dups).collect()
    }
    assert pairs.get((0, 10_000)) == 1.0  # identical shingle sets → identical sigs


def test_simhash_identical_docs_hamming_zero(docs_with_dups):
    rows = D.simhash_pairs(docs_with_dups, max_hamming=0).collect()
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert found.get((0, 10_000)) == 0


def test_simhash_bits_all_meaningful(spark, sf_smoke):
    """Regression: a small hash modulus zeroes the high SimHash bits and
    collapses the top band into one LSH bucket."""
    sigs = D.simhash_signatures(load_table(spark, sf_smoke, "documents"))
    top_band_nonzero = sigs.filter(
        (F.shiftright(F.col("simhash"), 36) % F.lit(1 << 12)) != 0
    ).count()
    assert top_band_nonzero > 0


def test_dedup_incremental_drops_known_and_near_dups(spark, sf_smoke):
    """A new batch deduped against the corpus: an exact copy of a corpus
    doc is dropped, an unrelated new doc survives, and the testdata
    split flags a non-trivial near-dup set."""
    from pyspark.sql import functions as F

    from vectorsearch_with_hnsw_spark.operators.dedup import dedup_incremental
    from vectorsearch_with_hnsw_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    corpus = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    out = {r.doc_id for r in dedup_incremental(new, corpus).collect()}
    assert 0 < len(out) < 250, "some flagged, some survive"
    # inject an exact copy of corpus doc 0 as new doc 9001 and a clearly
    # novel doc as 9002
    copy_text = corpus.filter(F.col("doc_id") == 0).select("text").first()[0]
    injected = spark.createDataFrame(
        [(9001, copy_text, "en", "srcX", len(copy_text)),
         (9002, "zzz qqq xxw yyv unique brand new content never seen", "en", "srcX", 51)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out2 = {r.doc_id for r in dedup_incremental(new.unionByName(injected), corpus).collect()}
    assert 9001 not in out2, "exact copy of a corpus doc is dropped"
    assert 9002 in out2, "novel doc survives"


def test_dup_spans_planted_passage(spark):
    """A 15-token passage copied between two otherwise-disjoint docs
    yields max_run = 15 - 8 + 1 = 8 consecutive shared 8-grams and
    span_tokens = 15; a 7-token overlap (shorter than the n-gram) is
    invisible; a doc pair with two disjoint short runs reports the
    longest, not the sum."""
    passage = " ".join(f"p{i}" for i in range(15))
    rows = [
        (0, passage + " " + " ".join(f"a{i}" for i in range(20))),
        (1, " ".join(f"b{i}" for i in range(20)) + " " + passage),
        (2, " ".join(f"c{i}" for i in range(10)) + " " + " ".join(f"p{i}" for i in range(7))),
        # two separated copies of 9-token pieces of the passage: runs of 2 each
        (3, " ".join(f"p{i}" for i in range(9)) + " " + " ".join(f"d{i}" for i in range(10))
            + " " + " ".join(f"p{i}" for i in range(6, 15))),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {(r.doc_a, r.doc_b): r for r in D.dup_span_pairs(docs, n=8, min_run=2).collect()}
    assert out[(0, 1)].max_run == 8 and out[(0, 1)].span_tokens == 15
    assert (0, 2) not in out and (1, 2) not in out
    assert out[(0, 3)].max_run == 2 and out[(0, 3)].span_tokens == 9
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert D.dup_span_pairs(empty).count() == 0


def test_fuzzy_dedup_end_to_end_verdicts(docs_with_dups):
    """The composed pipeline clusters the planted near-dups together,
    emits exactly one keeper per cluster, keeps every singleton, and
    covers every input document with a verdict."""
    out = D.fuzzy_dedup(docs_with_dups).collect()
    assert len(out) == docs_with_dups.count(), "one verdict per document"
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in by_cluster.items():
        assert sum(r.is_keeper for r in rows) == 1, f"cluster {cid}"
    dup_cluster = next(r.cluster_id for r in out if r.doc_id == 10_000)
    members = {r.doc_id for r in by_cluster[dup_cluster]}
    assert {0, 10_000, 20_000} <= members
    keeper = next(r for r in by_cluster[dup_cluster] if r.is_keeper)
    best_q = max(r.quality_score for r in by_cluster[dup_cluster])
    assert keeper.quality_score == best_q
    singles = [rows[0] for rows in by_cluster.values() if len(rows) == 1]
    assert singles and all(r.is_keeper for r in singles)


def test_semantic_dedup_end_to_end_verdicts(docs_with_dups):
    """The semantic twin of fuzzy_dedup: identical-token docs have
    identical hashed unit vectors (cosine 1.0 >= threshold), so the
    planted variants cluster together; one keeper per cluster, every
    doc gets a verdict, singletons keep."""
    out = D.semantic_dedup(docs_with_dups).collect()
    assert len(out) == docs_with_dups.count(), "one verdict per document"
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in by_cluster.items():
        assert sum(r.is_keeper for r in rows) == 1, f"cluster {cid}"
    dup_cluster = next(r.cluster_id for r in out if r.doc_id == 10_000)
    members = {r.doc_id for r in by_cluster[dup_cluster]}
    assert {0, 10_000, 20_000} <= members
    keeper = next(r for r in by_cluster[dup_cluster] if r.is_keeper)
    assert keeper.quality_score == max(r.quality_score for r in by_cluster[dup_cluster])


def test_dup_spans_max_df_drops_boilerplate(spark):
    """A boilerplate 10-token passage shared by many docs is excluded by
    the df cap, while a passage shared by just two docs still surfaces;
    with no cap the boilerplate pairs appear."""
    boiler = " ".join(f"lic{i}" for i in range(10))
    passage = " ".join(f"p{i}" for i in range(12))
    rows = []
    for i in range(6):  # boilerplate in docs 0..5
        rows.append((i, boiler + " " + " ".join(f"u{i}w{j}" for j in range(12))))
    rows.append((10, passage + " " + " ".join(f"a{j}" for j in range(12))))
    rows.append((11, " ".join(f"b{j}" for j in range(12)) + " " + passage))
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    capped = {(r.doc_a, r.doc_b) for r in D.dup_span_pairs(docs, n=8, max_df=3).collect()}
    assert capped == {(10, 11)}, "only the rare passage survives the df cap"
    uncapped = {(r.doc_a, r.doc_b) for r in D.dup_span_pairs(docs, n=8).collect()}
    assert (0, 1) in uncapped and (10, 11) in uncapped


def test_semantic_neardup_pairs_semantics(spark):
    """Identical texts pair at cosine 1.0 (identical vectors always share
    every LSH band bucket, so blocking can never miss them);
    near-identical texts score high; disjoint-vocabulary docs stay below
    threshold. Language no longer blocks — an identical doc in another
    language row is still a semantic dup."""
    rows = [
        (0, "spark shuffles the big hash join across executors", "en"),
        (1, "spark shuffles the big hash join across executors", "en"),   # exact dup
        (2, "spark shuffles the big hash join across workers", "en"),     # near dup
        (3, "completely unrelated words about gardens and tulips", "en"),
        (4, "spark shuffles the big hash join across executors", "de"),   # same text, other lang
    ]
    docs = spark.createDataFrame(
        [(i, t, l, "src0", len(t)) for i, t, l in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {(r.doc_a, r.doc_b): r.cos_sim for r in D.semantic_neardup_pairs(docs, dim=32, threshold=0.5).collect()}
    assert out[(0, 1)] == 1.0
    assert out[(0, 2)] > 0.5
    assert not any(3 in p for p in out), "unrelated doc pairs with nothing"
    assert out[(0, 4)] == 1.0, "identical text pairs across languages now"


def test_semantic_neardup_chunked_mask_matches_unchunked(spark):
    """The chunked candidate mask (chunk smaller than the block) must
    produce exactly the same pairs and sims as one-shot blocks."""
    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta"
    for i in range(12):
        rows.append((i, base + f" extra{i % 3}", "en"))
    docs = spark.createDataFrame(
        [(i, t, l, "src0", len(t)) for i, t, l in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    big = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in D.semantic_neardup_pairs(docs, dim=32, threshold=0.5, chunk=4096).collect()
    }
    small = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in D.semantic_neardup_pairs(docs, dim=32, threshold=0.5, chunk=3).collect()
    }
    assert big == small and len(big) > 0


def test_cc_driver_and_loop_paths_agree(spark, sf_smoke):
    """The adaptive driver-side union-find and the distributed
    label-propagation loop must return the IDENTICAL (node, min-id)
    relation — threshold=0 forces the loop on the same pair set the
    default solves driver-side."""
    from vectorsearch_with_hnsw_spark.operators.clusters import connected_components
    from vectorsearch_with_hnsw_spark.operators.dedup import minhash_lsh_pairs
    from vectorsearch_with_hnsw_spark.sources import load_table

    pairs = minhash_lsh_pairs(load_table(spark, sf_smoke, "documents")).persist()
    fast = {(r["node"], r["cluster_id"]) for r in connected_components(pairs).collect()}
    loop = {
        (r["node"], r["cluster_id"])
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast and fast == loop
    pairs.unpersist()


def test_semantic_neardup_negative_ids_not_dropped(spark):
    """The salt sub-group must use pmod, not %: Spark % keeps the
    dividend's sign, so a negative doc_id got a negative _g that never
    matched any salt task h in [0, n_salt) — its pairs were silently
    dropped. -3 and 5 are both 1 (mod 4); identical text must pair."""
    rows = [
        (-3, "spark shuffles the big hash join across executors"),
        (5, "spark shuffles the big hash join across executors"),
        (-6, "completely different prose about tulips and gardens"),
        (7, "yet another unrelated sentence mentioning volcanoes"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in D.semantic_neardup_pairs(docs, dim=32, threshold=0.5, n_salt=4).collect()
    }
    assert out[(-3, 5)] == 1.0, f"negative-id pair dropped: {out}"


def test_banded_split_bounds_hot_blocks(spark, sf_smoke):
    """A duplicate-heavy corpus (every doc a near-copy of one template)
    puts ~everything in one raw LSH bucket; the size-bounded splitter
    must sub-split it so no final (band, bucket) block exceeds the cap
    unless its members are byte-identical vectors — and exact-duplicate
    pairs must still collide in every band (their extra bits are equal
    by construction)."""
    from vectorsearch_with_hnsw_spark.operators.ann import banded_bucket_frame_split
    from vectorsearch_with_hnsw_spark.operators.textpipe import hashed_doc_vectors

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    # 10 copies of each doc with tiny suffix edits: correlated but
    # DISTINCT vectors -> one dominant raw bucket the splitter can cut
    big = docs.crossJoin(
        spark.range(10).select(F.col("id").alias("_c"))
    ).select(
        (F.col("doc_id") * 100 + F.col("_c")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" suffix"), F.col("_c").cast("string")).alias("text"),
    )
    vecs = hashed_doc_vectors(big, 64)
    cap = 64
    blocks = (
        banded_bucket_frame_split(vecs, "vec", 64, 8, 4, extra_bits=6, cap=cap)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert max(r["n"] for r in blocks) <= cap

    # byte-identical duplicates always pair, split or not
    ident = docs.limit(5).crossJoin(
        spark.range(2).select(F.col("id").alias("_c"))
    ).select((F.col("doc_id") * 10 + F.col("_c")).alias("doc_id"), "text")
    pairs = D.semantic_neardup_pairs(ident, dim=64, threshold=0.99, block_cap=4)
    assert pairs.count() >= 5  # each of the 5 identical twins pairs


def _components(pairs: set[tuple[int, int]]) -> set[frozenset[int]]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, set[int]] = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    return {frozenset(c) for c in comps.values()}


def test_semantic_neardup_star_linear_cliques(spark):
    """identical='star' (default) must emit O(n) rep->member edges for a
    bit-identical-vector clique — the 100 TB mass-duplication case —
    while identical='pairs' keeps the quadratic set; connected
    components must be IDENTICAL between the modes (transitivity)."""
    k = 12
    rows = [(i, "the same exact boilerplate sentence repeated verbatim") for i in range(k)]
    rows += [(100, "the same exact boilerplate sentence repeated verbatim almost")]
    rows += [(200, "entirely different prose about volcanoes and tide pools")]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    star = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in D.semantic_neardup_pairs(docs, dim=32, threshold=0.5).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in D.semantic_neardup_pairs(docs, dim=32, threshold=0.5, identical="pairs").collect()
    }
    clique_star = {p for p in star if p[0] < 100 and p[1] < 100}
    clique_full = {p for p in full if p[0] < 100 and p[1] < 100}
    assert clique_star == {(0, i) for i in range(1, k)}, clique_star
    assert len(clique_full) == k * (k - 1) // 2
    # star edges carry the same self-fold score the kernel gives the pair
    assert all(star[p] == full[p] for p in clique_star)
    # graph contraction, not graph change
    assert _components(set(star)) == _components(set(full))
    # doc 200 pairs with nothing in either mode
    assert not any(200 in p for p in star) and not any(200 in p for p in full)


def test_semantic_neardup_star_zero_vector_clique_unpaired(spark):
    """Token-less documents hash to the zero vector — a bit-identical
    'clique' whose self-dot is 0.0: star mode must NOT invent edges for
    it (the kernel never paired zero vectors either)."""
    rows = [(i, "") for i in range(5)] + [(10, "real words here")]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", max(len(t), 1)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = D.semantic_neardup_pairs(docs, dim=32, threshold=0.5).collect()
    assert out == []


def test_embedding_neardup_star_linear_cliques(spark, sf_smoke):
    """Same star contraction for embedding_neardup_pairs, driven through
    the ``emb`` override: an identical-vector clique emits rep->member
    edges only, zero vectors stay unpaired, components match pairs mode."""
    base = load_table(spark, sf_smoke, "embeddings").limit(6)
    clique = base.filter(F.col("vec_id") == 0).crossJoin(
        spark.range(1, 5).select(F.col("id").alias("_c"))
    ).select((F.lit(1000) + F.col("_c")).alias("vec_id"), "embedding")
    zeros = spark.range(2000, 2003).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 64), x -> 0.0D)").alias("embedding"),
    )
    emb = base.select("vec_id", "embedding").unionByName(clique).unionByName(zeros)
    star = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_pairs(
            spark, sf_smoke, threshold=0.9, dim=64, emb=emb
        ).collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in D.embedding_neardup_pairs(
            spark, sf_smoke, threshold=0.9, dim=64, emb=emb, identical="pairs"
        ).collect()
    }
    # vec 0 + its 4 copies: star = 4 edges from rep 0, pairs = C(5,2)=10
    clique_ids = {0, 1001, 1002, 1003, 1004}
    cs = {p for p in star if set(p) <= clique_ids}
    cf = {p for p in full if set(p) <= clique_ids}
    assert cs == {(0, i) for i in (1001, 1002, 1003, 1004)}, cs
    assert len(cf) == 10
    assert not any(v >= 2000 for p in star for v in p), "zero vectors paired"
    assert _components(star) == _components(full)


def test_uncapped_jaccard_warns_on_projected_pair_budget(spark, monkeypatch):
    """The uncapped foot-gun guard fires on the PROJECTED self-join row
    count sum(df*(df-1)/2) against an absolute budget — not a corpus
    fraction (a df=5M shingle in 5% of a 100M-doc corpus explodes with
    no fraction test ever firing). Probed with a shrunken budget: a
    corpus sharing one hot shingle warns; a disjoint corpus under the
    same budget stays silent."""
    import warnings

    docs = spark.createDataFrame(
        [(i, "common shared boilerplate line here", "en", "s", 30) for i in range(12)]
        + [(100 + i, f"unique text {i} alpha beta gamma {i}", "en", "s", 30)
           for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    monkeypatch.setattr(D, "_PAIR_ROW_BUDGET", 20)
    with pytest.warns(UserWarning, match="projects"):
        D.ngram_jaccard_pairs(docs, n=3, threshold=0.9)
    # same budget, no hot shingle above it -> worst-case gate may pass
    # but the exact census stays under budget: no warning
    disjoint = spark.createDataFrame(
        [(i, f"a{i} b{i} c{i} d{i} e{i} f{i} g{i} h{i}", "en", "s", 30)
         for i in range(12)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        D.ngram_jaccard_pairs(disjoint, n=3, threshold=0.9)


def test_decontaminate_fuzzy_catches_edited_leak(spark, sf_smoke):
    """A lightly-edited copy of a benchmark doc (one word changed) is
    flagged by the band-bucket pass, and an unrelated novel doc is not;
    benchmark members trivially flag themselves with the maximum band
    count."""
    from vectorsearch_with_hnsw_spark.operators.dedup import (
        MINHASH_BANDS,
        decontaminate_fuzzy,
    )

    docs = load_table(spark, sf_smoke, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    b0_text = bench.filter(F.col("doc_id") == 0).select("text").first()[0]
    toks = b0_text.split()
    toks[len(toks) // 2] = "EDITEDTOKEN"
    edited = " ".join(toks)
    injected = spark.createDataFrame(
        [(9001, edited, "en", "srcX", len(edited)),
         (9002, "zzz qqq xxw yyv totally novel content never in any benchmark", "en", "srcX", 60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r.doc_id: r.n_shared_buckets
        for r in decontaminate_fuzzy(docs.unionByName(injected), bench).collect()
    }
    assert out.get(9001, 0) > 0, "edited near-copy of a bench doc must flag"
    assert 9002 not in out, "novel doc must not flag"
    assert out.get(0) == MINHASH_BANDS, "bench member self-flags on every band"


def _ref_span_state(texts: dict[int, str], n: int, min_run: int):
    """Pure-Python reference for dup_span_intervals/strip_dup_spans:
    token-tuple n-grams (hash collisions are negligible and the engine
    hashes injectively on these tiny vocabularies), pairwise diagonal
    runs, victim = higher doc_id, overlap-or-adjacent interval merge."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in texts.items()}
    sh = {
        d: [tuple(t[i : i + n]) for i in range(max(len(t) - n + 1, 0))]
        for d, t in toks.items()
    }
    raw: dict[int, list[tuple[int, int]]] = {}
    ids = sorted(sh)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            hits = [
                (pa, pb)
                for pa, ga in enumerate(sh[a])
                for pb, gb in enumerate(sh[b])
                if ga == gb
            ]
            by_diag: dict[int, list[int]] = {}
            for pa, pb in hits:
                by_diag.setdefault(pa - pb, []).append(pa)
            for diag, pas in by_diag.items():
                pas = sorted(pas)
                run_start = pas[0]
                prev = pas[0]
                runs = []
                for p in pas[1:] + [None]:
                    if p is None or p != prev + 1:
                        runs.append((run_start, prev - run_start + 1))
                        if p is not None:
                            run_start = p
                    prev = p if p is not None else prev
                for pa_start, run in runs:
                    if run >= min_run:
                        s = pa_start - diag
                        raw.setdefault(b, []).append((s, s + run + n - 2))
    merged: dict[int, list[tuple[int, int]]] = {}
    for d, ivs in raw.items():
        out = []
        for s, e in sorted(ivs):
            if out and s <= out[-1][1] + 1:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        merged[d] = out
    stripped = {}
    for d, t in toks.items():
        cover = set()
        for s, e in merged.get(d, []):
            cover.update(range(s, e + 1))
        kept = [tok for i, tok in enumerate(t) if i not in cover]
        stripped[d] = (len(t), len(t) - len(kept), " ".join(kept))
    return merged, stripped


def test_dup_span_intervals_and_strip_vs_reference(spark):
    """Planted passages: full-duplicate, partial passage, three-way
    duplicate (keep-one must strip BOTH higher ids), and an overlap
    that forces the interval merge — all vs the pure-Python reference."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = {
        10: base,
        20: base,  # full duplicate of 10 -> fully stripped
        30: "prefix words here " + base + " suffix tail",  # contains 10
        40: base,  # three-way: stripped against 10 (not double-counted vs 20)
        50: "unrelated totally different tokens only once",
        60: "alpha beta gamma delta epsilon QQQ zeta eta theta iota kappa",
    }
    n, min_run = 3, 2
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    want_iv, want_strip = _ref_span_state(texts, n, min_run)
    got_iv: dict[int, list[tuple[int, int]]] = {}
    for r in D.dup_span_intervals(docs, n=n, min_run=min_run).collect():
        got_iv.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    got_iv = {d: sorted(v) for d, v in got_iv.items()}
    assert got_iv == {d: v for d, v in want_iv.items() if v}
    got_strip = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in D.strip_dup_spans(docs, n=n, min_run=min_run).collect()
    }
    assert got_strip == want_strip
    # keep-one: the lowest id keeps every token, every other full copy
    # is emptied
    assert got_strip[10][1] == 0
    assert got_strip[20][2] == "" and got_strip[40][2] == ""


def test_strip_dup_spans_fuzz_vs_reference(spark):
    """Seeded random corpora with planted shared slices: engine ==
    reference on intervals and stripped streams."""
    import random

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(4):
        texts = {}
        for d in range(8):
            texts[d] = " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 30)))
        # plant a shared slice into two random docs
        src = texts[rng.randrange(8)].split()
        if len(src) >= 6:
            s = rng.randrange(0, len(src) - 5)
            chunk = " ".join(src[s : s + 5])
            for d in rng.sample(range(8), 2):
                texts[d] = texts[d] + " " + chunk
        docs = spark.createDataFrame(
            [(d, t) for d, t in texts.items()], "doc_id long, text string"
        )
        _, want = _ref_span_state(texts, 3, 2)
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
            for r in D.strip_dup_spans(docs, n=3, min_run=2).collect()
        }
        assert got == want, trial


def test_containment_catches_quote_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment = 1.0,
    Jaccard far below any useful threshold — the asymmetric measure's
    reason to exist. Symmetric identical docs score 1.0 on both."""
    short = "alpha beta gamma delta epsilon"
    long_doc = " ".join(f"w{i}" for i in range(200)) + " " + short
    docs = spark.createDataFrame(
        [(1, short), (2, long_doc), (3, short)],
        "doc_id long, text string",
    )
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in D.ngram_containment_pairs(docs, threshold=0.9).collect()
    }
    assert cont[(1, 2)] == 1.0  # quote detected
    assert cont[(1, 3)] == 1.0  # identical short docs
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert jac[(1, 2)] < 0.05  # Jaccard blind to the embedded quote


def test_dup_span_char_offsets_slice_identity(spark):
    """Char offsets point at the ORIGINAL text: slicing
    text[char_start:char_end] and re-tokenizing (lowered) must equal
    the lowered tokens at [span_start, span_end] — including docs whose
    case and whitespace differ from the canonical stream the intervals
    were computed on."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = {
        10: base,
        20: "  ALPHA   Beta GAMMA  delta Epsilon zeta ETA theta iota KAPPA ",
        30: "prefix words here\t" + base.upper() + "  suffix tail",
        50: "unrelated totally different tokens only once",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    rows = D.dup_span_char_offsets(docs, n=3, min_run=2).collect()
    assert rows
    import re

    tok_re = re.compile(r"\S+", re.ASCII)
    for r in rows:
        text = texts[r["doc_id"]]
        toks = [m.group(0).lower() for m in tok_re.finditer(text)]
        sliced = [
            m.group(0).lower()
            for m in tok_re.finditer(text[r["char_start"]: r["char_end"]])
        ]
        assert sliced == toks[r["span_start"]: r["span_end"] + 1], r
        # offsets are tight: no whitespace at either edge
        assert not text[r["char_start"]].isspace()
        assert not text[r["char_end"] - 1].isspace()


def test_strip_dup_spans_exact_roundtrip(spark):
    """Original-byte surgery round trip: for every document,
    re-tokenizing text_clean gives exactly the ORIGINAL-CASE tokens
    whose indices survive dup_span_intervals, text outside the cuts is
    preserved byte-for-byte (prefix check), lowering the kept tokens
    reproduces strip_dup_spans' canonical stream, and non-victim docs
    pass through completely untouched."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = {
        10: base,
        20: "  ALPHA   Beta GAMMA  delta Epsilon zeta ETA theta iota KAPPA ",
        30: "Prefix, words? here\t" + base.upper() + "  suffix; tail!",
        50: "unrelated totally different tokens only once",
    }
    n, min_run = 3, 2
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    iv: dict[int, list[tuple[int, int]]] = {d: [] for d in texts}
    for r in D.dup_span_intervals(docs, n=n, min_run=min_run).collect():
        iv[r["doc_id"]].append((r["span_start"], r["span_end"]))
    canon = {
        r["doc_id"]: r["text_clean"]
        for r in D.strip_dup_spans(docs, n=n, min_run=min_run).collect()
    }
    got = {
        r["doc_id"]: r
        for r in D.strip_dup_spans_exact(docs, n=n, min_run=min_run).collect()
    }
    import re

    tok_re = re.compile(r"\S+", re.ASCII)
    for d, text in texts.items():
        toks = [m.group(0) for m in tok_re.finditer(text)]
        covered = {
            i for s, e in iv[d] for i in range(s, e + 1)
        }
        kept = [t for i, t in enumerate(toks) if i not in covered]
        row = got[d]
        clean_toks = [m.group(0) for m in tok_re.finditer(row["text_clean"])]
        assert clean_toks == kept, d
        assert " ".join(t.lower() for t in kept) == canon[d], d
        assert row["n_spans"] == len(iv[d]), d
        if not iv[d]:
            assert row["text_clean"] == text and row["n_chars_removed"] == 0, d
        else:
            # everything before the first cut survives byte-for-byte
            first_cs = min(
                r2["char_start"]
                for r2 in D.dup_span_char_offsets(
                    docs, n=n, min_run=min_run
                ).collect()
                if r2["doc_id"] == d
            )
            assert row["text_clean"].startswith(text[:first_cs]), d
            assert row["n_chars_removed"] > 0, d
