"""Semantics + plan-shape tests for the corpus-pipeline operators:
connected components, vocabulary/tf-idf, stratified sampling, length
outliers, SQ8 quantized ANN, interval join, and the CSV/JSONL formats.
(Bit-exact value checks live in test_oracle_parity.py; these cover the
properties an oracle can't — convergence, determinism, plan shape,
roundtrips.)"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectorsearch_with_hnsw_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)
from vectorsearch_with_hnsw_spark.operators.quantize import dim_ranges, quantize, sq8_knn
from vectorsearch_with_hnsw_spark.operators.relational import interval_join
from vectorsearch_with_hnsw_spark.operators.textpipe import (
    stratified_sample,
    tfidf_top_terms,
    vocab_top_tokens,
)
from vectorsearch_with_hnsw_spark.sources import load_table


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (one component), island pair 10-11, singleton edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "doc_a long, doc_b long"
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dedup_clusters_keeper_flags(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert all(r["cluster_id"] == 5 for r in rows.values())
    assert rows[5]["is_keeper"] and not rows[7]["is_keeper"] and not rows[9]["is_keeper"]


def test_connected_components_deep_chain_converges(spark):
    # diameter > a couple of iterations: 0-1-2-...-12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    got = connected_components(pairs).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == 13


def test_star_contraction_matches_label_propagation(spark):
    """connected_components_star == connected_components on chains,
    islands, cliques, and a random graph — same (node, cluster_id)
    relation, different round complexity."""
    import random

    from vectorsearch_with_hnsw_spark.operators.clusters import (
        connected_components_star,
    )

    cases = [
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)],
        [(i, i + 1) for i in range(12)],                      # deep chain
        [(i, j) for i in range(5) for j in range(i + 1, 5)],  # clique
        [(7, 7), (8, 9)],                                     # self-loop edge
    ]
    rng = random.Random(7)
    cases.append([(rng.randrange(40), rng.randrange(40)) for _ in range(60)])
    for pairs_list in cases:
        pairs = spark.createDataFrame(pairs_list, "doc_a long, doc_b long")
        want = {(r["node"], r["cluster_id"]) for r in connected_components(pairs).collect()}
        got = {(r["node"], r["cluster_id"]) for r in connected_components_star(pairs).collect()}
        assert got == want, pairs_list


def test_dedup_clusters_star_backend(spark):
    from vectorsearch_with_hnsw_spark.operators.clusters import dedup_clusters

    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    want = {(r["doc_id"], r["cluster_id"], r["is_keeper"]) for r in dedup_clusters(pairs).collect()}
    got = {
        (r["doc_id"], r["cluster_id"], r["is_keeper"])
        for r in dedup_clusters(pairs, algorithm="star").collect()
    }
    assert got == want


def test_vocab_and_tfidf_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "alpha gamma gamma delta"),
            (3, "alpha epsilon"),
        ],
        "doc_id long, text string",
    )
    vocab = {r["token"]: (r["rank"], r["doc_freq"]) for r in vocab_top_tokens(docs).collect()}
    assert vocab["alpha"] == (1, 3)  # in every doc, rank 1
    assert vocab["gamma"][1] == 2
    top = tfidf_top_terms(docs, per_doc=1, min_token_len=4).collect()
    by_doc = {r["doc_id"]: r["token"] for r in top}
    # 'alpha' has idf ln(1)=0 everywhere; doc 1's top term is 'beta' (tf 2)
    assert by_doc[1] == "beta"
    # delta: tf=1, idf=ln(3) beats gamma: tf=2, idf=ln(3/2)
    assert by_doc[2] == "delta"
    assert by_doc[3] == "epsilon"


def test_dataset_split_partitions_all_rows_map_only(spark, sf_smoke):
    from vectorsearch_with_hnsw_spark.operators.textpipe import dataset_split

    docs = load_table(spark, sf_smoke, "documents")
    out = dataset_split(docs)
    assert out.count() == docs.count()  # every row gets exactly one split
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side assignment
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted((r["doc_id"], r["split"]) for r in dataset_split(docs).collect())
    assert a == b


def test_training_shuffle_is_a_permutation(spark, sf_smoke):
    from vectorsearch_with_hnsw_spark.operators.textpipe import training_shuffle

    docs = load_table(spark, sf_smoke, "documents")
    out = training_shuffle(docs, n_shards=4).collect()
    assert len(out) == docs.count()
    assert len({r["doc_id"] for r in out}) == len(out)  # each doc once
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():  # contiguous 1..n within each shard
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_stratified_sample_deterministic_and_pushed_down(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    rates = {"en": 50}
    a = sorted(r["doc_id"] for r in stratified_sample(docs, rates).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(docs, rates).collect())
    assert a == b and len(a) > 0
    # map-only: no exchange in the plan
    plan = stratified_sample(docs, rates)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sq8_quantize_bounds_and_selfmatch(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    ranges = dim_ranges(emb)
    code_stats = (
        quantize(emb, ranges)
        .select(F.explode("code").alias("c"))
        .agg(F.min("c"), F.max("c"))
        .first()
    )
    assert code_stats[0] >= 0 and code_stats[1] <= 255
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = sq8_knn(emb, queries, k=5).collect()
    assert len(res) == 15
    for r in res:
        if r["rnk"] == 1:
            # identical codes -> qdist2 == 0; id tiebreak makes self rank 1
            assert r["neighbor_id"] == r["query_id"] and r["qdist2"] == 0


def test_interval_join_semantics_and_plan(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100), (2, "2024-01-01 12:00:00", 200)],
        "user_id long, ts string, purchase_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:30:00", 1.0),  # in window for purchase 100
            (1, "2024-01-01 08:59:59", 2.0),  # outside 1h lookback
            (1, "2024-01-01 10:00:00", 3.0),  # boundary: inclusive
            (2, "2024-01-01 11:30:00", 4.0),  # other user, in window
        ],
        "user_id long, ts string, view_value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    j = interval_join(left, right, key="user_id", lookback_sec=3600)
    got = sorted((r["purchase_id"], r["view_value"]) for r in j.collect())
    assert got == [(100, 1.0), (100, 3.0), (200, 4.0)]
    # equi-join on the key, never a nested loop over timestamps
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_csv_jsonl_roundtrip(spark, sf_smoke, tmp_path):
    from vectorsearch_with_hnsw_spark.sources.formats import (
        read_csv,
        read_jsonl,
        write_csv,
        write_jsonl,
        write_parquet_partitioned,
    )

    docs = load_table(spark, sf_smoke, "documents")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    want = sorted(
        (r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()
    )

    write_csv(docs, str(tmp_path / "csv"))
    got_csv = read_csv(spark, str(tmp_path / "csv"), schema)
    assert sorted((r["doc_id"], r["text"]) for r in got_csv.select("doc_id", "text").collect()) == want

    write_jsonl(docs, str(tmp_path / "jsonl"))
    got_json = read_jsonl(spark, str(tmp_path / "jsonl"), schema)
    assert sorted((r["doc_id"], r["text"]) for r in got_json.select("doc_id", "text").collect()) == want

    write_parquet_partitioned(docs, str(tmp_path / "pq"), "lang")
    back = spark.read.parquet(str(tmp_path / "pq"))
    assert back.count() == docs.count()
    # partition pruning: a lang filter scans one directory only
    pruned = back.filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()


@pytest.mark.parametrize("bad_iter", [1])
def test_connected_components_bounded_iterations(spark, bad_iter):
    # max_iter too small for the diameter -> labels not fully converged,
    # but still a valid partial labeling (every node present exactly once)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    got = connected_components(pairs, max_iter=bad_iter).collect()
    assert len(got) == 9


# -- hypothesis: connected components vs pure-Python union-find ----------

from hypothesis import given, settings, strategies as st  # noqa: E402

# small graphs: each example pays O(diameter) Spark iterations, so keep
# the node range tight (random graphs here converge in 2-4 rounds)
edge_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=16,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.fixture(scope="module")
def spark_holder(spark):
    # hypothesis forbids function-scoped fixtures interacting with @given;
    # module-scoped pass-through keeps one SparkSession across examples
    return spark


@settings(max_examples=5, deadline=None)
@given(edges=edge_strategy)
def test_connected_components_matches_union_find(spark_holder, edges):
    spark = spark_holder
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == _union_find_components(edges)


def test_curation_pipeline_single_shuffle_no_join(spark, sf_smoke):
    """The end-to-end curation plan: scoring/gating/sampling fuse into
    the scan stage; the ONLY exchange is the dedup-keeper window on the
    fingerprint, and there is no join anywhere."""
    from vectorsearch_with_hnsw_spark.registry import q_curation_pipeline

    df = q_curation_pipeline(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    # WindowGroupLimit: rank-1 keeper filter applied before the full sort
    assert "WindowGroupLimit" in plan
    assert df.count() > 0


def test_ivf_sq8_selfmatch(spark, sf_smoke):
    """The hybrid prober: a query that is itself indexed probes its own
    cell first (nearest centroid = assigned centroid), its code matches
    itself exactly -> rank 1, distance 0."""
    from vectorsearch_with_hnsw_spark.operators.quantize import ivf_sq8_knn
    from vectorsearch_with_hnsw_spark.registry import DIM

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = ivf_sq8_knn(emb, queries, dim=DIM, k=5).collect()
    assert len(res) == 15
    for r in res:
        if r["rnk"] == 1:
            assert r["neighbor_id"] == r["query_id"] and r["qdist2"] == 0


def test_new_ops_on_empty_inputs(spark):
    """Empty-input totality: every new operator returns an empty frame
    with the right schema instead of raising."""
    empty_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty_pairs).count() == 0
    assert dedup_clusters(empty_pairs).columns == ["doc_id", "cluster_id", "is_keeper"]

    empty_docs = spark.createDataFrame([], "doc_id long, text string, lang string, source string, n_chars long")
    assert vocab_top_tokens(empty_docs).count() == 0
    assert tfidf_top_terms(empty_docs).count() == 0
    assert stratified_sample(empty_docs, {"en": 50}).count() == 0

    from vectorsearch_with_hnsw_spark.operators.pipeline import curate
    from vectorsearch_with_hnsw_spark.operators.textpipe import doc_len_outliers

    assert curate(empty_docs).count() == 0
    assert doc_len_outliers(empty_docs).count() == 0


def test_chunk_documents_properties(spark):
    """Every token lands in >= 1 chunk, chunk_id 0 starts at 0, stride
    spacing holds, chunks cap at the window size, overlap region repeats
    the previous chunk's tail, and empty docs yield no chunks."""
    from vectorsearch_with_hnsw_spark.operators.textpipe import chunk_documents

    text = " ".join(f"w{i}" for i in range(300))
    docs = spark.createDataFrame(
        [(1, text), (2, "only three tokens"), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, window=128, stride=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}  # empty/whitespace docs -> no chunks
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert len(d1) == 5  # ceil(300/64)
    assert [r["start"] for r in d1] == [0, 64, 128, 192, 256]
    assert [r["n_chunk_tokens"] for r in d1] == [128, 128, 128, 108, 44]
    # full coverage: union of [start, start+n) covers 0..299
    covered = set()
    for r in d1:
        covered |= set(range(r["start"], r["start"] + r["n_chunk_tokens"]))
    assert covered == set(range(300))
    # overlap: chunk k repeats the last (window-stride) tokens of chunk k-1
    t0 = d1[0]["chunk_text"].split(" ")
    t1 = d1[1]["chunk_text"].split(" ")
    assert t0[64:] == t1[:64]
    (d2,) = by_doc[2]
    assert d2["n_chunk_tokens"] == 3 and d2["chunk_text"] == "only three tokens"


def test_pack_chunks_budget_invariants(spark, sf_smoke):
    """Greedy prefix packing: within a shard pack_ids are monotone over
    (doc_id, chunk_id); every pack's token total stays below
    budget + window (a chunk can straddle the boundary but never more);
    and every pack except the shard's last holds >= budget - window + 1
    tokens (no premature cut)."""
    from vectorsearch_with_hnsw_spark.operators.textpipe import pack_chunks
    from vectorsearch_with_hnsw_spark.sources import load_table

    budget, window = 512, 128
    rows = pack_chunks(
        load_table(spark, sf_smoke, "documents"),
        window=window,
        stride=64,
        budget=budget,
        n_shards=8,
    ).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 8
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r["doc_id"], r["chunk_id"]))
        packs = [r["pack_id"] for r in rs]
        assert packs == sorted(packs), f"shard {shard}: pack_id not monotone"
        totals = {}
        for r in rs:
            totals[r["pack_id"]] = totals.get(r["pack_id"], 0) + r["n_chunk_tokens"]
        last = max(totals)
        for pid, tot in totals.items():
            assert tot < budget + window, f"pack {pid} overflowed: {tot}"
            if pid != last:
                assert tot >= budget - window + 1, f"pack {pid} underfilled: {tot}"


def test_orc_roundtrip_with_pushdown(spark, sf_smoke, tmp_path):
    """ORC sink/source round-trip preserves schema+values; predicate
    pushdown reaches the ORC scan like Parquet."""
    from vectorsearch_with_hnsw_spark.sources import load_table
    from vectorsearch_with_hnsw_spark.sources.formats import read_orc, write_orc

    docs = load_table(spark, sf_smoke, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path, "doc_id long, text string, lang string, source string, n_chars long")
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    a = sorted(r["doc_id"] for r in docs.filter("n_chars > 100").collect())
    b = sorted(r["doc_id"] for r in back.filter("n_chars > 100").collect())
    assert a == b
    plan = back.filter("n_chars > 100")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_chars" in plan


def test_session_new_ops_on_empty_inputs(spark):
    """Empty-input totality for the newest operators: chunking, packing,
    repetition, keep-best dedup — empty in, empty (right-schema) out."""
    from vectorsearch_with_hnsw_spark.operators.dedup import dedup_keep_best
    from vectorsearch_with_hnsw_spark.operators.textpipe import (
        chunk_documents,
        doc_repetition,
        pack_chunks,
    )

    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert chunk_documents(empty_docs).count() == 0
    packed = pack_chunks(empty_docs)
    assert packed.count() == 0
    assert packed.columns == ["shard", "doc_id", "chunk_id", "n_chunk_tokens", "pack_id"]
    assert doc_repetition(empty_docs).count() == 0
    kb = dedup_keep_best(empty_docs)
    assert kb.count() == 0
    assert kb.columns == ["fp", "keeper_doc_id", "keeper_quality", "n_dups"]


def test_knn_pagerank_star_hub_and_mass_bounds(spark):
    """On a star geometry (center is every satellite's nearest
    neighbor) the center accumulates the highest rank; total mass is
    bounded by [N*teleport, N*scale] (integer floors only ever lose
    mass); and the run is bit-deterministic."""
    from vectorsearch_with_hnsw_spark.operators.clusters import knn_pagerank

    dim = 64
    rows = [(0, [0.0] * dim)]
    for i in range(1, 13):
        v = [0.0] * dim
        v[i] = 1.0
        rows.append((i, v))
    emb = spark.createDataFrame(
        [(i, v, 0) for i, v in rows], "vec_id long, embedding array<double>, label int"
    )
    out = {r.vec_id: r.pr for r in knn_pagerank(emb, k=3, iters=3).collect()}
    assert len(out) == 13
    assert out[0] == max(out.values()), "star center is the top hub"
    n, scale = 13, 10**12
    assert n * (scale * 15 // 100) <= sum(out.values()) <= n * scale
    out2 = {r.vec_id: r.pr for r in knn_pagerank(emb, k=3, iters=3).collect()}
    assert out == out2


def test_pagerank_mass_conservation(spark):
    """Dangling nodes (no out-edges) redistribute their damped mass
    uniformly: on a graph where half the nodes are dangling, total rank
    mass stays scale*N up to deterministic integer-floor losses (< N
    per div, 3 divs per iteration) — the redistribution the exact-kNN
    backend never needs (every node has k out-edges) but ANN backends
    do. Also pins: a dangling-free graph takes the redistribution-free
    path and conserves mass the same way."""
    from vectorsearch_with_hnsw_spark.operators.clusters import _pagerank_loop

    n, scale, iters, k = 10, 10**12, 3, 2
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id long")
    # nodes 0..4 each point at (i+1)%5 and 5+i; nodes 5..9 are dangling
    edges = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)] + [(i, 5 + i) for i in range(5)],
        "src_id long, dst_id long",
    )
    out = {r.node_id: r.pr for r in _pagerank_loop(nodes, edges, iters, 85, scale).collect()}
    assert len(out) == n and all(v > 0 for v in out.values())
    total = sum(out.values())
    # per iteration, floor losses: < n (damped share div), < n (per-edge
    # div by out_deg), < n (dangling redistribution div)
    assert scale * n - iters * 3 * n <= total <= scale * n
    # dangling-free control: a 2-regular ring conserves mass too
    ring = spark.createDataFrame(
        [(i, (i + j) % n) for i in range(n) for j in (1, 2)],
        "src_id long, dst_id long",
    )
    out_ring = {r.node_id: r.pr for r in _pagerank_loop(nodes, ring, iters, 85, scale).collect()}
    total_ring = sum(out_ring.values())
    assert scale * n - iters * 3 * n <= total_ring <= scale * n


def test_gopher_rules_flags(spark):
    """Each Gopher rule trips on a purpose-built document; a healthy
    document passes all of them."""
    from vectorsearch_with_hnsw_spark.operators.textpipe import gopher_rules

    healthy = "the quick brown fox and that dog have fun with lots of " + " ".join(
        f"word{i}" for i in range(50)
    )
    rows = [
        (0, healthy, "en", "web"),
        (1, "short doc", "en", "web"),  # word count
        (2, "### " * 80 + healthy, "en", "web"),  # symbol ratio
        (3, "\n".join("- bullet line" for _ in range(20)) + "\n" + healthy, "en", "web"),
        (4, "\n".join("trailing line..." for _ in range(20)) + "\n" + healthy, "en", "web"),
        (5, " ".join("123456" for _ in range(60)), "en", "web"),  # alpha + stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r["doc_id"]: r for r in gopher_rules(docs, min_words=20).collect()}
    assert got[0]["passes"] is True
    assert got[1]["rule_word_count"] is False and got[1]["passes"] is False
    assert got[2]["rule_symbol_ratio"] is False
    assert got[3]["rule_bullet_lines"] is False
    assert got[4]["rule_ellipsis_lines"] is False
    assert got[5]["rule_alpha_words"] is False and got[5]["rule_stopwords"] is False


def test_c4_clean_semantics(spark):
    """C4 line rules on crafted pages: terminal punctuation + word
    count gate lines; lorem-ipsum and curly braces flag pages; the
    page verdict needs min_kept_lines survivors and no flags."""
    from vectorsearch_with_hnsw_spark.operators.textpipe import c4_clean

    good = "\n".join(
        [
            "This is a perfectly reasonable sentence with enough words.",
            "Another complete sentence follows it right here as well.",
            "And a third one closes out the page quite nicely, thanks.",
        ]
    )
    rows = [
        (0, good, "en", "web"),
        (1, good + "\nlorem ipsum dolor sit amet filler text.", "en", "web"),
        (2, good + "\nfunction f() { return 1; }", "en", "web"),
        (3, "no terminal punctuation on this line at all", "en", "web"),
        (4, "Too short.\nAlso tiny.\nStill small.", "en", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert got[0]["keep"] is True and got[0]["n_lines_kept"] == 3
    assert got[0]["cleaned_text"] == good
    assert got[1]["has_lorem"] is True and got[1]["keep"] is False
    assert got[2]["has_brace"] is True and got[2]["keep"] is False
    assert got[3]["n_lines_kept"] == 0 and got[3]["keep"] is False
    assert got[4]["n_lines_kept"] == 0, "punctuated but under the word floor"


def test_dsir_gate_biases_toward_target(spark, sf_smoke):
    """The resampling gate is deterministic and ratio-biased: higher
    keep_per_million keeps a superset, the kept set is reproducible,
    and kept docs skew toward higher target_ppm than dropped ones."""
    from vectorsearch_with_hnsw_spark.operators.textpipe import dsir_scores

    docs = load_table(spark, sf_smoke, "documents")
    full = dsir_scores(docs).toPandas().set_index("doc_id")
    lo = {r["doc_id"] for r in dsir_scores(docs, keep_per_million=400_000).collect()}
    hi = {r["doc_id"] for r in dsir_scores(docs, keep_per_million=900_000).collect()}
    lo2 = {r["doc_id"] for r in dsir_scores(docs, keep_per_million=400_000).collect()}
    assert lo == lo2, "gate must be deterministic"
    assert lo <= hi, "higher budget keeps a superset"
    assert 0 < len(hi) < len(full)
    kept_mean = full.loc[sorted(hi)]["target_ppm"].mean()
    dropped = full.index.difference(list(hi))
    if len(dropped):
        assert kept_mean >= full.loc[dropped]["target_ppm"].mean()


def test_salted_hash_wrap_stable_at_huge_ids(spark):
    """ADVICE r12: the old ((id + salt) * MIX) % MOD overflowed int64
    once id + salt exceeded ~3.47e9 — Spark wrapped silently while
    DuckDB raised, so oracle parity quietly ended there. The reduced
    form must (a) agree with exact big-integer arithmetic at ANY int64
    id — checked against Python's unbounded ints — and (b) agree with
    DuckDB evaluating the same reduced SQL, right up to the int64 edge."""
    import duckdb
    import pandas as pd

    from vectorsearch_with_hnsw_spark.operators.textpipe import (
        SAMPLE_MIX,
        SAMPLE_MOD,
        dataset_split,
    )

    ids = [0, 1, 9_999, 3_469_999_999, 3_470_000_001, 2**40, 2**62, 2**63 - 9178]
    docs = spark.createDataFrame([(i, "en") for i in ids], "doc_id long, lang string")
    got = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}

    def py_split(i):
        mix = (i + 9176) * SAMPLE_MIX % SAMPLE_MOD % 100  # unbounded ints
        return "val" if mix < 5 else ("test" if mix < 10 else "train")

    assert got == {i: py_split(i) for i in ids}

    pdf = pd.DataFrame({"doc_id": ids, "lang": ["en"] * len(ids)})
    con = duckdb.connect()
    con.register("documents", pdf)
    from vectorsearch_with_hnsw_spark.registry import SQL_DATASET_SPLIT

    want = {
        int(r[0]): r[2]
        for r in con.execute(SQL_DATASET_SPLIT).fetchall()
    }
    assert got == want


def test_salted_hash_equals_naive_form_in_supported_range(spark):
    """The conversion identity: below the old overflow bound the
    reduced form returns EXACTLY what the naive multiply returned, so
    swapping every hash site changed no existing split/sample/shuffle
    assignment."""
    from pyspark.sql import functions as F

    from vectorsearch_with_hnsw_spark.operators.textpipe import (
        SAMPLE_MIX,
        SAMPLE_MOD,
        salted_hash,
    )

    ids = spark.range(0, 2000, 37).union(
        spark.range(3_400_000_000, 3_400_002_000, 41)
    )
    naive = ((F.col("id") + F.lit(9176)) * F.lit(SAMPLE_MIX)) % F.lit(SAMPLE_MOD)
    n_diff = (
        ids.select(
            salted_hash(F.col("id"), 9176).alias("a"), naive.alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert n_diff == 0


def test_skipgram_pairs_vs_reference(spark):
    """Engine skip-gram counts == a pure-Python window scan on a
    crafted corpus, including boundary positions, window>1 offsets,
    repeated tokens (self-pairs from distinct positions), and the
    min_count floor."""
    from collections import Counter

    from vectorsearch_with_hnsw_spark.operators.textpipe import skipgram_pairs

    texts = {
        0: "a b c a b",
        1: "x",
        2: "a a a",
        3: "b c d e f g",
    }
    window = 2
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    want = Counter()
    for t in texts.values():
        toks = t.split()
        for i, c in enumerate(toks):
            for o in range(-window, window + 1):
                if o and 0 <= i + o < len(toks):
                    want[(c, toks[i + o])] += 1
    got = {
        (r["center"], r["context"]): r["pair_count"]
        for r in skipgram_pairs(docs, window=window, min_count=1).collect()
    }
    assert got == dict(want)
    # min_count floor
    floored = {
        (r["center"], r["context"]): r["pair_count"]
        for r in skipgram_pairs(docs, window=window, min_count=3).collect()
    }
    assert floored == {k: v for k, v in want.items() if v >= 3}
    # directedness: every (a,b) has a matching (b,a) with equal count
    assert all(got[(b, a)] == n for (a, b), n in got.items())
