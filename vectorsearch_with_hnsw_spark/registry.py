"""Query registry: every implemented operator as a (Spark plan, DuckDB
oracle SQL) pair.

This backs the driver contract in ``__spark_entry__.py``: the driver runs
each Spark query and its oracle SQL side-by-side and compares row count +
schema + order-insensitive value hash. Both sides are written as the SAME
arithmetic shape — sequential double folds for distances, exact integer
hashing, decimal-exact money sums surfaced as double — so results match
bit-for-bit, with no rounding fudge.

Type harmonization rules used throughout (Spark <-> DuckDB):
  row_number()/size()/length()/bit_count() -> INT (cast INTEGER in SQL)
  count() -> BIGINT (native both sides)
  sum(int) -> BIGINT (DuckDB sums ints to HUGEINT; cast)
  money -> sum over DECIMAL(18,2) exact, cast DOUBLE at the end
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import text as T
from .functions.vector import (
    cosine_distance,
    l2_distance,
    l2_norm,
    l2_normalize,
    normalize_pixels,
    to_vec,
)
from .operators import dedup as D
from .operators.ann import lsh_knn_cosine
from .operators.knn import knn_exact, knn_with_labels
from .operators import relational as R
from .sources import load_table

DIM = 64  # embedding dimensionality of the testdata tables
N_QUERIES = 10  # query set = vec_id < N_QUERIES
IVF_PROBE = 3  # cells probed per query (of the ~10 label cells; recall@10 0.46 -> 0.55 on testdata)

# ---------------------------------------------------------------------------
# DuckDB SQL fragments mirroring the Spark expression shapes exactly
# ---------------------------------------------------------------------------

SQL_TOKS_LOWER = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '')"
SQL_TOKS_RAW = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')"


def sql_poly_hash(expr: str, mod: int = T.HASH_MOD) -> str:
    chars = f"list_transform(list_filter(string_split({expr}, ''), c -> c != ''), c -> CAST(ascii(c) AS BIGINT))"
    return (
        f"CASE WHEN len({chars}) = 0 THEN 0 "
        f"ELSE list_reduce({chars}, (a, c) -> (a * 31 + c) % {mod}) END"
    )


def sql_l2(a: str, b: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, (x, i) -> (x - {b}[i]) * (x - {b}[i])), "
        f"(s, u) -> s + u))"
    )


def sql_dot(a: str, b: str) -> str:
    return f"list_reduce(list_transform({a}, (x, i) -> x * {b}[i]), (s, u) -> s + u)"


def sql_sq_norm(a: str) -> str:
    return f"list_reduce(list_transform({a}, (x, i) -> x * x), (s, u) -> s + u)"


MONEY = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"


def _minhash_sql_terms() -> list[str]:
    out = []
    for i in range(D.NUM_MINHASH):
        a, b = 2 * i + 1, 7919 * i + 1
        out.append(f"MIN(({a} * h + {b}) % {T.MINHASH_MOD}) AS mh{i}")
    return out


def _hyperplane_sql(p: int) -> str:
    return (
        f"list_transform(range(0, {DIM}), j -> "
        f"CAST(((1103515245 * ({p} * {DIM} + j) + 12345) % 2147483648) % 2001 - 1000 AS DOUBLE))"
    )


def _bucket_sql(vec_expr: str) -> str:
    """Nested (((0*2+b0)*2+b1)...) exactly like the Spark fold."""
    acc = "0"
    for p in range(8):
        dot = sql_dot(vec_expr, _hyperplane_sql(p))
        bit = f"CASE WHEN {dot} >= 0.0 THEN 1 ELSE 0 END"
        acc = f"({acc} * 2 + {bit})"
    return acc


# ---------------------------------------------------------------------------
# Spark query callables
# ---------------------------------------------------------------------------


def _emb_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def q_knn_exact_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_exact(emb, _emb_queries(spark, sf_dir), k=10, metric="l2")


def q_knn_exact_l2_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized (mapInPandas partial-top-k) exact kNN — the 100 TB
    scale path — checked against the SAME oracle as the declarative one:
    its winners are rescored with the canonical fold, so even this BLAS
    path is bit-identical."""
    from .operators.knn import knn_exact_fast

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_exact_fast(emb, _emb_queries(spark, sf_dir), k=10, metric="l2")


def q_knn_exact_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_exact(emb, _emb_queries(spark, sf_dir), k=10, metric="cosine")


def q_knn_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN over the alive subset: delete-log anti-join semantics
    (reference tombstone skip, hsnw_trial.py:178-179; delete at :296-305).
    Deleted set = vec_id % 7 == 0."""
    emb = load_table(spark, sf_dir, "embeddings")
    deletes = emb.select("vec_id").filter(F.col("vec_id") % 7 == 0)
    alive = emb.join(deletes, "vec_id", "left_anti")
    return knn_exact(alive, _emb_queries(spark, sf_dir), k=10, metric="l2")


def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: top-k restricted by a metadata predicate
    (label < 5) — the pre-filter strategy: the predicate pushes into the
    parquet scan BEFORE any distance math, so cost scales with the
    selectivity, not the corpus. (The post-filter alternative — probe
    the full index with a larger ef, then filter — is the HNSW-path
    variant; tombstone skipping, hsnw_trial.py:178-179, is the same
    mechanism with deleted-ness as the predicate.)"""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("label") < 5)
    return knn_exact(emb, _emb_queries(spark, sf_dir), k=10, metric="cosine")


def q_knn_label_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIFAR-style kNN report: cosine top-5 + neighbor label + '<- QUERY'
    self-marker (CIFAR notebook cell 4)."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = knn_exact(emb, _emb_queries(spark, sf_dir), k=5, metric="cosine")
    return knn_with_labels(knn, emb).select(
        "query_id", "neighbor_id", "dist", "rnk", "label", "marker"
    )


def q_pair_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance expressions over consecutive-id pairs, plus a synthetic
    zero vector paired with vec 0 to pin the cosine zero-norm guard
    (reference returns exactly 1.0, hsnw_trial.py:51-52)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    zero = spark.range(1).select(
        F.lit(-1).cast("long").alias("vec_id"),
        F.array_repeat(F.lit(0.0), DIM).cast("array<float>").alias("embedding"),
    )
    base = emb.unionByName(zero)
    a = base.select(F.col("vec_id").alias("id_a"), to_vec("embedding").alias("va"))
    b = base.select(F.col("vec_id").alias("id_b"), to_vec("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") + 1 == F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            l2_distance(F.col("va"), F.col("vb")).alias("l2_dist"),
            cosine_distance(F.col("va"), F.col("vb")).alias("cos_dist"),
        )
    )


def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norms + dim validation + the /255 normalization projection head
    (FashionMNIST flatten+normalize, notebook cell 4)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_vec("embedding")
    return emb.select(
        "vec_id",
        l2_norm(v).alias("norm"),
        (F.size("embedding") == DIM).alias("dim_ok"),
        F.element_at(normalize_pixels(F.col("embedding")), 1).alias("head_norm"),
    )


def q_normalize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-sphere normalization (the standard prep before cosine ANN /
    embedding dedup) verified through scalar projections: the post-
    normalization norm and head element are engine-identical double
    folds, avoiding array-stringification compare ambiguity."""
    emb = load_table(spark, sf_dir, "embeddings")
    nv = l2_normalize(to_vec("embedding"))
    return emb.select(
        "vec_id",
        l2_norm(nv).alias("unit_norm"),
        F.element_at(nv, 1).alias("head0"),
    )


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-profiling rollup over orders: row/non-null counts,
    exact distinct cardinalities, value ranges — the data-quality gate a
    training pipeline runs before ingesting a new source. All aggregates
    reduce map-side except the two exact DISTINCTs (which Spark plans as
    expand + two-stage agg; the approx sketch variant for 100 TB is
    event_sketch_stats)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey_nonnull"),
        F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        F.count_distinct(F.col("o_orderstatus")).alias("n_statuses"),
        F.min("o_orderdate").alias("min_orderdate"),
        F.max("o_orderdate").alias("max_orderdate"),
        F.min("o_totalprice").alias("min_totalprice"),
        F.max("o_totalprice").alias("max_totalprice"),
    )


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment over documents (map-only,
    restart-stable; operators/textpipe.py::dataset_split)."""
    from .operators.textpipe import dataset_split

    return dataset_split(load_table(spark, sf_dir, "documents"))


def q_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible sharded training permutation
    (operators/textpipe.py::training_shuffle)."""
    from .operators.textpipe import training_shuffle

    return training_shuffle(load_table(spark, sf_dir, "documents"))


def q_lsh_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_knn_cosine(emb, _emb_queries(spark, sf_dir), dim=DIM, k=10)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_exact(load_table(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.2)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hamming <= 1: this synthetic corpus (tiny shared vocabulary) puts
    # ~17% of ALL pairs within hamming 3, so the classic threshold would
    # emit millions of rows; <=1 keeps the banded-join path meaningful
    return D.simhash_pairs(load_table(spark, sf_dir, "documents"), max_hamming=1)


MRL_PREFIX = 32  # matryoshka coarse-pass dimensions (half the signal on gaussian data)
MRL_REFINE = 200  # candidates surviving to the exact rescore (recall@10 0.9 on testdata)


def q_matryoshka_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ann import matryoshka_knn

    emb = load_table(spark, sf_dir, "embeddings")
    return matryoshka_knn(
        emb,
        _emb_queries(spark, sf_dir),
        dim=DIM,
        prefix_dim=MRL_PREFIX,
        refine=MRL_REFINE,
        k=10,
    )


def _sql_matryoshka() -> str:
    pre = (
        f"list_reduce(list_transform(e.v[1:{MRL_PREFIX}], "
        "(x, i) -> (x - q.qv[i]) * (x - q.qv[i])), (a, u) -> a + u)"
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < {N_QUERIES}
), coarse AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.v, q.qv, {pre} AS pre_d2
  FROM e CROSS JOIN q
), kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY pre_d2, neighbor_id) AS rn
    FROM coarse
  ) WHERE rn <= {MRL_REFINE}
), rescored AS (
  SELECT query_id, neighbor_id, {sql_l2("v", "qv")} AS dist FROM kept
)
SELECT query_id, neighbor_id, dist, CAST(rn AS INTEGER) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM rescored
) WHERE rn <= 10
"""


def q_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import lm_familiarity

    return lm_familiarity(load_table(spark, sf_dir, "documents"), ref_lang="en")


def _sql_lm_familiarity() -> str:
    bg_hash = sql_poly_hash("array_to_string(toks[i+1:i+2], ' ')")
    return f"""
WITH t AS (
  SELECT doc_id, lang, {SQL_TOKS_LOWER} AS toks FROM documents
), bg AS (
  SELECT doc_id, lang, {bg_hash} AS h
  FROM t, unnest(range(0, greatest(len(toks) - 1, 0))) AS u(i)
), model AS (
  SELECT h, count(*) AS cnt FROM bg WHERE lang = 'en' GROUP BY h
), scored AS (
  SELECT bg.doc_id,
         count(*) AS n_bigrams,
         CAST(sum(CASE WHEN m.cnt IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         CAST(sum(coalesce(m.cnt, 0)) AS BIGINT) AS fam
  FROM bg LEFT JOIN model m USING (h)
  GROUP BY bg.doc_id
)
SELECT d.doc_id, d.lang,
       coalesce(s.n_bigrams, 0) AS n_bigrams,
       coalesce(s.hits, 0) AS hits,
       coalesce(s.fam, 0) AS fam
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


DUP_SPAN_N = 8  # n-gram width for exact shared-passage detection
DUP_SPAN_MIN_RUN = 2


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import dup_span_pairs

    docs = load_table(spark, sf_dir, "documents")
    return dup_span_pairs(docs, n=DUP_SPAN_N, min_run=DUP_SPAN_MIN_RUN)


def _sql_dup_spans() -> str:
    """Gaps-and-islands over the positional-ngram self-join, hash-keyed
    exactly like the Spark side: per-token polynomial hashes combined
    with the same (acc*31 + h) % mod fold per n-gram."""
    n = DUP_SPAN_N
    acc = "CAST(0 AS BIGINT)"
    for j in range(n):
        acc = f"(({acc} * 31 + hs[i+{j + 1}]) % {T.HASH_MOD})"
    return f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKS_LOWER} AS toks FROM documents
), th AS (
  SELECT doc_id, list_transform(toks, tk -> {sql_poly_hash("tk")}) AS hs FROM t
), sh AS (
  SELECT doc_id, i AS pos, {acc} AS h
  FROM th, unnest(range(0, greatest(len(hs) - {n - 1}, 0))) AS u(i)
), j AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, a.pos - b.pos AS diag
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
), g AS (
  SELECT doc_a, doc_b, diag, pa,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
  FROM j
), runs AS (
  SELECT doc_a, doc_b, count(*) AS run FROM g GROUP BY doc_a, doc_b, diag, grp
), pairs AS (
  SELECT doc_a, doc_b, max(run) AS max_run FROM runs GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, max_run, max_run + {n - 1} AS span_tokens
FROM pairs WHERE max_run >= {DUP_SPAN_MIN_RUN}
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_neardup_pairs(spark, sf_dir, threshold=0.8)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        T.fingerprint(F.col("text")).alias("fp"),
    )


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", T.lang_id(F.col("text")).alias("lang_pred"))


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = T.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["mean_word_len"].alias("mean_word_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["quality_score"].alias("quality_score"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal.binary import extract_features

    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return extract_features(blobs)


def q_ivf_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ivf import ivf_knn_cosine

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_knn_cosine(emb, _emb_queries(spark, sf_dir), dim=DIM, k=10, n_probe=IVF_PROBE)


def q_knn_hnsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed HNSW build + probe (approximate — rows-only check;
    recall vs the exact oracle is asserted in tests)."""
    from .index.build import HnswParams, hnsw_build
    from .index.query import knn_hnsw

    emb = load_table(spark, sf_dir, "embeddings")
    idx = hnsw_build(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
        HnswParams(dim=DIM, metric="cosine"),
        num_partitions=4,
    )
    return knn_hnsw(idx, _emb_queries(spark, sf_dir), k=10)


# ---------------------------------------------------------------------------
# Oracle SQL
# ---------------------------------------------------------------------------

_KNN_SQL_TMPL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {nq}
), b AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v FROM embeddings {base_filter}
), pairs AS (
  SELECT q.query_id, b.neighbor_id, {dist} AS dist FROM b CROSS JOIN q
), ranked AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM pairs
)
SELECT query_id, neighbor_id, dist, CAST(rn AS INTEGER) AS rnk FROM ranked WHERE rn <= {k}
"""

_COS_DIST_SQL = (
    "CASE WHEN sqrt({na}) = 0 OR sqrt({nb}) = 0 THEN 1.0 "
    "ELSE CAST(1 AS DOUBLE) - {dot} / (sqrt({na}) * sqrt({nb})) END"
).format(na=sql_sq_norm("b.v"), nb=sql_sq_norm("q.qv"), dot=sql_dot("b.v", "q.qv"))


def _knn_sql(metric: str, k: int, base_filter: str = "") -> str:
    if metric == "l2":
        dist = sql_l2("b.v", "q.qv")
    else:
        dist = _COS_DIST_SQL
    return _KNN_SQL_TMPL.format(nq=N_QUERIES, k=k, dist=dist, base_filter=base_filter)


SQL_KNN_LABEL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), b AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v, label FROM embeddings
), pairs AS (
  SELECT q.query_id, b.neighbor_id, b.label, {_COS_DIST_SQL} AS dist FROM b CROSS JOIN q
), ranked AS (
  SELECT query_id, neighbor_id, label, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM pairs
)
SELECT query_id, neighbor_id, dist, CAST(rn AS INTEGER) AS rnk, label,
       CASE WHEN neighbor_id = query_id THEN '<- QUERY' ELSE '' END AS marker
FROM ranked WHERE rn <= 5
"""

SQL_PAIR_DISTANCES = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT CAST(-1 AS BIGINT) AS vec_id, list_transform(range(0, {DIM}), j -> CAST(0 AS DOUBLE)) AS v
), a AS (SELECT vec_id AS id_a, v AS va FROM base),
  b AS (SELECT vec_id AS id_b, v AS vb FROM base)
SELECT id_a, id_b,
  {sql_l2("a.va", "b.vb")} AS l2_dist,
  CASE WHEN sqrt({sql_sq_norm("a.va")}) = 0 OR sqrt({sql_sq_norm("b.vb")}) = 0 THEN 1.0
       ELSE CAST(1 AS DOUBLE) - {sql_dot("a.va", "b.vb")} / (sqrt({sql_sq_norm("a.va")}) * sqrt({sql_sq_norm("b.vb")})) END AS cos_dist
FROM a JOIN b ON a.id_a + 1 = b.id_b
"""

SQL_VECTOR_NORMS = f"""
SELECT vec_id,
  sqrt({sql_sq_norm("embedding::DOUBLE[]")}) AS norm,
  len(embedding) = {DIM} AS dim_ok,
  (embedding::DOUBLE[])[1] / CAST(255.0 AS DOUBLE) AS head_norm
FROM embeddings
"""

SQL_LSH_ANN = f"""
WITH b AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v,
         {_bucket_sql("embedding::DOUBLE[]")} AS bucket
  FROM embeddings
), q0 AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
         {_bucket_sql("embedding::DOUBLE[]")} AS bucket
  FROM embeddings WHERE vec_id < {N_QUERIES}
), q AS (
  -- multi-probe: home bucket + every bucket within Hamming distance 2
  SELECT query_id, qv, unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8), xor(bucket, 16), xor(bucket, 32), xor(bucket, 64), xor(bucket, 128), xor(bucket, 3), xor(bucket, 5), xor(bucket, 9), xor(bucket, 17), xor(bucket, 33), xor(bucket, 65), xor(bucket, 129), xor(bucket, 6), xor(bucket, 10), xor(bucket, 18), xor(bucket, 34), xor(bucket, 66), xor(bucket, 130), xor(bucket, 12), xor(bucket, 20), xor(bucket, 36), xor(bucket, 68), xor(bucket, 132), xor(bucket, 24), xor(bucket, 40), xor(bucket, 72), xor(bucket, 136), xor(bucket, 48), xor(bucket, 80), xor(bucket, 144), xor(bucket, 96), xor(bucket, 160), xor(bucket, 192)]) AS bucket
  FROM q0
), cand AS (
  SELECT q.query_id, b.neighbor_id, {_COS_DIST_SQL} AS dist
  FROM b JOIN q USING (bucket)
), ranked AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM cand
)
SELECT query_id, neighbor_id, dist, CAST(rn AS INTEGER) AS rnk FROM ranked WHERE rn <= 10
"""

_COS_GENERIC = (
    "CASE WHEN sqrt({na}) = 0 OR sqrt({nb}) = 0 THEN 1.0 "
    "ELSE CAST(1 AS DOUBLE) - {dot} / (sqrt({na}) * sqrt({nb})) END"
)


def _cos_sql(a: str, b: str) -> str:
    return _COS_GENERIC.format(na=sql_sq_norm(a), nb=sql_sq_norm(b), dot=sql_dot(a, b))


SQL_IVF_ANN = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), perdim AS (
  SELECT label AS cell, pos, CAST(SUM(CAST(v[pos] AS DECIMAL(28,10))) AS DOUBLE) AS s, COUNT(*) AS n
  FROM e CROSS JOIN (SELECT unnest(range(1, {DIM + 1})) AS pos) p
  GROUP BY 1, 2
), cents AS (
  SELECT cell, list(s / n ORDER BY pos) AS centroid FROM perdim GROUP BY cell
), assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_cos_sql('e.v', 'c.centroid')}, c.cell) AS crnk
    FROM e CROSS JOIN cents c
  ) WHERE crnk = 1
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY {_cos_sql('q.qv', 'c.centroid')}, c.cell) AS crnk
    FROM q CROSS JOIN cents c
  ) WHERE crnk <= {IVF_PROBE}
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {_cos_sql('a.v', 'p.qv')} AS dist
  FROM assigned a JOIN probes p USING (cell)
), ranked AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM cand
)
SELECT query_id, neighbor_id, dist, CAST(rn AS INTEGER) AS rnk FROM ranked WHERE rn <= 10
"""

_FP_SQL = sql_poly_hash(f"array_to_string({SQL_TOKS_LOWER}, ' ')")

SQL_DEDUP_EXACT = f"""
SELECT {_FP_SQL} AS fp, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1
"""

def _sql_dedup_ngram_jaccard() -> str:
    """Jaccard over DISTINCT two-level shingle hashes — same key the
    Spark join shuffles on (collisions merge shingles identically in
    both engines)."""
    return f"""
WITH {_hashed_shingle_cte()},
tok AS (SELECT DISTINCT doc_id, h AS shingle FROM hashed),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM tok a JOIN tok b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
), jac AS (
  SELECT doc_a, doc_b, common, sa.n AS na, sb.n AS nb,
         CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) AS jaccard
  FROM common
  JOIN sizes sa ON common.doc_a = sa.doc_id
  JOIN sizes sb ON common.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, common, na, nb, jaccard FROM jac WHERE jaccard >= 0.2
"""


def _hashed_shingle_cte() -> str:
    """hashed(doc_id, h): two-level 3-gram hash mirroring
    minhash_signatures — per-token polynomial hash, then the
    (acc*31 + h) % mod fold over the 3 token hashes. No DISTINCT:
    min() is duplicate-insensitive on both engines."""
    acc = "CAST(0 AS BIGINT)"
    for j in range(3):
        acc = f"(({acc} * 31 + hs[i+{j + 1}]) % {T.HASH_MOD})"
    return f"""th AS (
  SELECT doc_id, list_transform({SQL_TOKS_LOWER}, tk -> {sql_poly_hash("tk")}) AS hs
  FROM documents
),
hashed AS (
  SELECT doc_id, {acc} AS h
  FROM th, unnest(range(0, greatest(len(hs) - 2, 0))) AS u(i)
)"""


def _sql_dedup_minhash() -> str:
    sig_terms = ",\n         ".join(_minhash_sql_terms())
    rpb = D.NUM_MINHASH // D.MINHASH_BANDS
    band_defs = []
    for b in range(D.MINHASH_BANDS):
        parts = " || '_' || ".join(
            f"CAST(mh{i} AS VARCHAR)" for i in range(b * rpb, (b + 1) * rpb)
        )
        band_defs.append(f"{parts} AS band{b}")
    mh_cols = ", ".join(f"mh{i}" for i in range(D.NUM_MINHASH))
    band_unions = []
    for b in range(D.MINHASH_BANDS):
        a_cols = ", ".join(f"a.mh{i} AS a_mh{i}" for i in range(D.NUM_MINHASH))
        b_cols = ", ".join(f"b.mh{i} AS b_mh{i}" for i in range(D.NUM_MINHASH))
        band_unions.append(
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {a_cols}, {b_cols} "
            f"FROM banded a JOIN banded b ON a.band{b} = b.band{b} WHERE a.doc_id < b.doc_id"
        )
    matches = " + ".join(
        f"CASE WHEN a_mh{i} = b_mh{i} THEN 1 ELSE 0 END" for i in range(D.NUM_MINHASH)
    )
    return f"""
WITH {_hashed_shingle_cte()},
sig AS (SELECT doc_id, {sig_terms} FROM hashed GROUP BY doc_id),
banded AS (SELECT doc_id, {mh_cols}, {', '.join(band_defs)} FROM sig),
pairs AS (SELECT DISTINCT * FROM ({' UNION ALL '.join(band_unions)}))
SELECT doc_a, doc_b, CAST({matches} AS DOUBLE) / CAST({D.NUM_MINHASH} AS DOUBLE) AS est_jaccard
FROM pairs
"""


def _sql_dedup_simhash(max_hamming: int = 1) -> str:
    bits = D.SIMHASH_BITS
    bands = D.SIMHASH_BANDS
    bpb = bits // bands
    votes = ",\n         ".join(
        f"CAST(SUM(CASE WHEN (h >> {b}) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v{b}"
        for b in range(bits)
    )
    packed = " + ".join(f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(bits))
    band_cols = ", ".join(
        f"(simhash >> {b * bpb}) % {1 << bpb} AS sb{b}" for b in range(bands)
    )
    unions = " UNION ALL ".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sh_a, b.simhash AS sh_b "
        f"FROM banded a JOIN banded b ON a.sb{b} = b.sb{b} WHERE a.doc_id < b.doc_id"
        for b in range(bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({SQL_TOKS_LOWER}) AS token FROM documents
),
hashed AS (
  SELECT doc_id, (h0 * (h0 + {T.SIMHASH_MIX_C1}) + {T.SIMHASH_MIX_C2}) % {T.SIMHASH_SPACE} AS h
  FROM (SELECT doc_id, {sql_poly_hash('token', T.MINHASH_MOD)} AS h0 FROM toks)
),
agg AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM agg),
banded AS (SELECT doc_id, simhash, {band_cols} FROM sig),
pairs AS (SELECT DISTINCT * FROM ({unions}))
SELECT doc_a, doc_b, sh_a, sh_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
"""


SQL_EMBEDDING_NEARDUP = f"""
WITH e AS (SELECT label AS blk, vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT a.blk, a.vec_id AS id_a, b.vec_id AS id_b,
         CASE WHEN sqrt({sql_sq_norm("a.v")}) = 0 OR sqrt({sql_sq_norm("b.v")}) = 0 THEN CAST(0 AS DOUBLE)
              ELSE CAST(1 AS DOUBLE) - (CASE WHEN sqrt({sql_sq_norm("a.v")}) = 0 OR sqrt({sql_sq_norm("b.v")}) = 0 THEN 1.0
                   ELSE CAST(1 AS DOUBLE) - {sql_dot("a.v", "b.v")} / (sqrt({sql_sq_norm("a.v")}) * sqrt({sql_sq_norm("b.v")})) END) END AS cos_sim
  FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
)
SELECT blk, id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.8
"""

SQL_TEXT_STATS = f"""
SELECT doc_id,
  CAST(len({SQL_TOKS_RAW}) AS INTEGER) AS n_tokens,
  CAST(length(text) AS INTEGER) AS n_chars_measured,
  {_FP_SQL} AS fp
FROM documents
"""


def _sql_langid() -> str:
    score_defs = []
    for lang in T.LANG_PRIORITY:
        words = ", ".join(f"'{w}'" for w in T.LANG_STOPWORDS[lang])
        score_defs.append(
            f"len(list_filter(toks, t -> list_contains([{words}], t))) AS s_{lang}"
        )
    best = "greatest(" + ", ".join(f"s_{l}" for l in T.LANG_PRIORITY) + ")"
    cases = " ".join(
        f"WHEN s_{l} > 0 AND s_{l} = {best} THEN '{l}'" for l in T.LANG_PRIORITY
    )
    return f"""
WITH t AS (SELECT doc_id, lang, {SQL_TOKS_LOWER} AS toks FROM documents),
s AS (SELECT doc_id, lang, {', '.join(score_defs)} FROM t)
SELECT doc_id, lang, CASE {cases} ELSE 'und' END AS lang_pred FROM s
"""


def _sql_doc_quality() -> str:
    stop = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)
    return f"""
WITH t AS (
  SELECT doc_id, text, {SQL_TOKS_RAW} AS toks,
         CAST(len({SQL_TOKS_RAW}) AS INTEGER) AS n_tok,
         CAST(length(text) AS INTEGER) AS n_char,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INTEGER) AS n_alpha,
         CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS INTEGER) AS n_punct
  FROM documents
), f AS (
  SELECT doc_id, n_tok,
    CASE WHEN n_tok > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS mean_word_len,
    CASE WHEN n_char > 0 THEN CAST(n_punct AS DOUBLE) / CAST(n_char AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS punct_ratio,
    CASE WHEN n_tok > 0 THEN CAST(len(list_filter(list_transform(toks, x -> lower(x)), t -> list_contains([{stop}], t))) AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS stopword_ratio
  FROM t
)
SELECT doc_id, n_tok AS n_tokens, mean_word_len, punct_ratio, stopword_ratio,
  (((CASE WHEN n_tok >= 5 AND n_tok <= 5000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
   + CASE WHEN mean_word_len >= 2.0 AND mean_word_len <= 12.0 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
   + CASE WHEN stopword_ratio >= 0.05 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
   + CASE WHEN punct_ratio <= 0.2 THEN CAST(0.1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) AS quality_score
FROM f
"""


SQL_MULTIMODAL = f"""
WITH h AS (SELECT doc_id, {sql_poly_hash('text')} AS h FROM documents)
SELECT doc_id,
  CAST((h * 1) % 1009 AS DOUBLE) / CAST(1009 AS DOUBLE) AS f0,
  CAST((h * 2) % 1009 AS DOUBLE) / CAST(1009 AS DOUBLE) AS f1,
  CAST((h * 3) % 1009 AS DOUBLE) / CAST(1009 AS DOUBLE) AS f2,
  CAST((h * 4) % 1009 AS DOUBLE) / CAST(1009 AS DOUBLE) AS f3
FROM h
"""

SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM({MONEY}) AS DOUBLE) AS sum_disc_price,
  COUNT(*) AS count_order,
  MIN(l_quantity) AS min_qty,
  MAX(l_quantity) AS max_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

SQL_TOP_CUSTOMERS = f"""
WITH po AS (
  SELECT l_orderkey, SUM({MONEY}) AS order_rev FROM lineitem GROUP BY l_orderkey
)
SELECT c_custkey, c_name, CAST(SUM(order_rev) AS DOUBLE) AS revenue, COUNT(*) AS n_orders
FROM orders
JOIN po ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""

SQL_REGION_REVENUE = f"""
SELECT r_name, CAST(SUM({MONEY}) AS DOUBLE) AS revenue, COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

SQL_PRICING_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

SQL_EVENTS_ASOF = """
WITH p0 AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, ts, 0 AS tag, CAST(NULL AS BIGINT) AS event_id,
         CAST(NULL AS DOUBLE) AS ev_value, ts AS r_ts, value AS r_value
  FROM p0 WHERE rn = 1
), l AS (
  SELECT user_id, ts, 1 AS tag, event_id, value AS ev_value,
         CAST(NULL AS TIMESTAMP) AS r_ts, CAST(NULL AS DOUBLE) AS r_value
  FROM events WHERE event_type = 'click'
), u AS (
  SELECT * FROM r UNION ALL SELECT * FROM l
), w AS (
  SELECT *,
    last_value(r_ts IGNORE NULLS) OVER win AS last_purchase_ts,
    last_value(r_value IGNORE NULLS) OVER win AS last_purchase_value
  FROM u
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, tag, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, ts, ev_value AS value, last_purchase_ts, last_purchase_value
FROM w WHERE tag = 1
"""

SQL_BRAND_SUPPLIER_REVENUE = f"""
SELECT p_brand, n_name AS supp_nation,
  CAST(SUM({MONEY}) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY p_brand, supp_nation
"""

SQL_VIEW_DAYS_NO_PURCHASE = """
WITH v AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_views
  FROM events WHERE event_type = 'view' GROUP BY user_id, day
), p AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, v.day, v.n_views FROM v ANTI JOIN p USING (user_id, day)
"""

SQL_CUSTOMER_ORDER_RANK = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice AS totalprice, CAST(rn AS INTEGER) AS rnk
FROM ranked WHERE rn <= 3
"""

SQL_EVENTS_TUMBLING = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY bucket, event_type
"""

SQL_EVENTS_PROPS_JSON = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
) WHERE k IS NOT NULL
GROUP BY event_type
"""

SQL_EVENTS_SESSIONIZE = """
WITH w AS (
  SELECT user_id, event_id, ts, value, epoch_us(ts) AS ep,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ep
  FROM events
), flagged AS (
  SELECT *, CASE WHEN (ep - prev_ep) > 1800000000 THEN 1 ELSE 0 END AS new_session FROM w
), sid AS (
  SELECT *, CAST(SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sid GROUP BY user_id, session_seq
"""

# ---------------------------------------------------------------------------
# Corpus pipeline: clusters, vocabulary, tf-idf, sampling, outliers,
# SQ8 ANN, range join
# ---------------------------------------------------------------------------

SAMPLE_RATES = {"de": 30, "en": 5}  # per-stratum keep %, default 10


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.clusters import dedup_clusters

    pairs = D.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))
    return dedup_clusters(pairs)


def q_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import vocab_top_tokens

    return vocab_top_tokens(load_table(spark, sf_dir, "documents"), top_n=50)


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import tfidf_top_terms

    # ln() differs by 1 ULP between JVM and libm, so the raw score can't
    # be hash-compared; rank/tf/df are integer-exact (ordering is stable:
    # a flip would need two different (tf, df) pairs within 1 ULP).
    return tfidf_top_terms(load_table(spark, sf_dir, "documents")).drop("tfidf")


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import stratified_sample

    return stratified_sample(load_table(spark, sf_dir, "documents"), SAMPLE_RATES)


def q_doc_len_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import doc_len_outliers

    return doc_len_outliers(load_table(spark, sf_dir, "documents"))


def q_sq8_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quantize import sq8_knn

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sq8_knn(emb, queries, k=10)


def _sql_dedup_clusters() -> str:
    """Connected components over the minhash pair list as a recursive
    CTE — min-reachable-id per node is exactly the Spark label-propagation
    fixpoint."""
    minhash = _sql_dedup_minhash()
    return f"""
WITH RECURSIVE mh AS (
{minhash}
),
e AS (SELECT doc_a AS src, doc_b AS dst FROM mh UNION SELECT doc_b, doc_a FROM mh),
nd AS (SELECT DISTINCT src AS node FROM e),
reach(node, label) AS (
  SELECT node, node FROM nd
  UNION
  SELECT e.src, r.label FROM e JOIN reach r ON r.node = e.dst
)
SELECT node AS doc_id, MIN(label) AS cluster_id,
       (node = MIN(label)) AS is_keeper
FROM reach GROUP BY node
"""


SQL_FUNNEL_STEPS = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT s1.user_id,
  CAST(floor(epoch(s1.t1)) AS BIGINT) AS t1_epoch,
  CAST(floor(epoch(s2.t2)) AS BIGINT) AS t2_epoch,
  CAST(floor(epoch(s3.t3)) AS BIGINT) AS t3_epoch,
  CAST(1 + (CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END)
         + (CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) AS steps_completed
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


SQL_SIGNUP_COHORTS = """
WITH cohorts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), activity AS (
  SELECT user_id, date_trunc('week', ts) AS act_week FROM events
)
SELECT CAST(c.cohort_week AS DATE) AS cohort_week,
       CAST(floor(date_diff('day', c.cohort_week, a.act_week) / 7) AS INTEGER) AS week_offset,
       count(DISTINCT a.user_id) AS active_users
FROM activity a JOIN cohorts c USING (user_id)
WHERE a.act_week >= c.cohort_week
GROUP BY 1, 2
"""


TOKEN_BUDGET = 600  # binds at gate scale: ~25 docs x ~50 tokens per source


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import token_budget_sample

    return token_budget_sample(
        load_table(spark, sf_dir, "documents"), budget_per_source=TOKEN_BUDGET
    )


def _sql_token_budget_sample() -> str:
    from .operators.textpipe import SAMPLE_MIX, SAMPLE_MOD

    return f"""
WITH b AS (
  SELECT doc_id, source, CAST(len({SQL_TOKS_RAW}) AS BIGINT) AS n_tokens,
         (doc_id * {SAMPLE_MIX}) % {SAMPLE_MOD} AS h
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM b
)
SELECT doc_id, source, n_tokens, cum_tokens FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
"""


def q_doc_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed document vectors, projected to oracle-friendly
    scalars: the unit norm, the first component, and an index-weighted
    checksum that pins every element (same sequential-fold shape both
    engines)."""
    from .operators.textpipe import hashed_doc_vectors

    v = hashed_doc_vectors(load_table(spark, sf_dir, "documents"), dim=DIM)
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("vec"), lambda x: x * x),
            F.lit(0.0),
            lambda s, u: s + u,
        )
    )
    chk = F.aggregate(
        F.zip_with(
            F.col("vec"),
            F.sequence(F.lit(1), F.lit(DIM)).cast("array<double>"),
            lambda x, i: x * i,
        ),
        F.lit(0.0),
        lambda s, u: s + u,
    )
    return v.select(
        "doc_id",
        norm.alias("unit_norm"),
        F.element_at("vec", 1).alias("head0"),
        chk.alias("chk"),
    )


def _doc_hash_vec_ctes() -> str:
    """CTE chain ending in ``normed(doc_id, nv)`` — the feature-hashed
    unit vectors, shared by the doc_hash_vectors oracle and the
    semantic near-dup oracle."""
    dim = DIM
    tok_hash = sql_poly_hash("token")
    return f"""tok AS (
  SELECT doc_id, unnest({SQL_TOKS_LOWER}) AS token FROM documents
), hh AS (
  SELECT doc_id, {tok_hash} AS h FROM tok
), sb AS (
  SELECT doc_id, CAST(h % {dim} AS INTEGER) AS bucket,
         CASE WHEN (h // {dim}) % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM hh
), vals AS (
  SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS val FROM sb GROUP BY 1, 2
), grid AS (
  SELECT d.doc_id, g.i AS bucket
  FROM documents d CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) g
), cells AS (
  SELECT g.doc_id, g.bucket, CAST(coalesce(v.val, 0) AS DOUBLE) AS x
  FROM grid g LEFT JOIN vals v ON v.doc_id = g.doc_id AND v.bucket = g.bucket
), raw AS (
  SELECT doc_id, list(x ORDER BY bucket) AS v FROM cells GROUP BY doc_id
), normed AS (
  SELECT doc_id,
    CASE WHEN sqrt(list_reduce(list_transform(v, (x, i) -> x * x), (s, u) -> s + u)) = 0
         THEN v
         ELSE list_transform(v, (x, i) -> x / sqrt(list_reduce(list_transform(v, (y, j) -> y * y), (s, u) -> s + u)))
    END AS nv
  FROM raw
)"""


def _sql_doc_hash_vectors() -> str:
    return f"""
WITH {_doc_hash_vec_ctes()}
SELECT doc_id,
  sqrt(list_reduce(list_transform(nv, (x, i) -> x * x), (s, u) -> s + u)) AS unit_norm,
  nv[1] AS head0,
  list_reduce(list_transform(nv, (x, i) -> x * i), (s, u) -> s + u) AS chk
FROM normed
"""


SEMANTIC_NEARDUP_T = 0.8


def q_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.semantic_neardup_pairs(
        load_table(spark, sf_dir, "documents"), dim=DIM, threshold=SEMANTIC_NEARDUP_T
    )


def _sql_semantic_neardup() -> str:
    dot = "list_reduce(list_transform(a.nv, (x, i) -> x * b.nv[i]), (s, u) -> s + u)"
    return f"""
WITH {_doc_hash_vec_ctes()},
vl AS (
  SELECT d.lang, n.doc_id, n.nv FROM normed n JOIN documents d USING (doc_id)
)
SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b, {dot} AS cos_sim
FROM vl a JOIN vl b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE {dot} >= {SEMANTIC_NEARDUP_T}
"""


def q_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.fuzzy_dedup(load_table(spark, sf_dir, "documents"))


def _sql_fuzzy_dedup() -> str:
    """End-to-end fuzzy-dedup ground truth: the recursive-CTE closure
    over the minhash pair list + the doc_quality score, keeper = best
    (quality desc, doc_id asc) per cluster — equivalent to the Spark
    max(struct(q, -id)) aggregation."""
    minhash = _sql_dedup_minhash()
    quality = _sql_doc_quality()
    return f"""
WITH RECURSIVE mh AS (
{minhash}
),
e AS (SELECT doc_a AS src, doc_b AS dst FROM mh UNION SELECT doc_b, doc_a FROM mh),
nd AS (SELECT DISTINCT src AS node FROM e),
reach(node, label) AS (
  SELECT node, node FROM nd
  UNION
  SELECT e.src, r.label FROM e JOIN reach r ON r.node = e.dst
),
cc AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node),
q AS (SELECT doc_id, quality_score FROM ({quality})),
labeled AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id, q.quality_score
  FROM documents d JOIN q USING (doc_id) LEFT JOIN cc ON cc.node = d.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_id ORDER BY quality_score DESC, doc_id ASC
  ) AS rn
  FROM labeled
)
SELECT doc_id, cluster_id, quality_score, (rn = 1) AS is_keeper FROM ranked
"""


SQL_VOCAB_TOP = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest({SQL_TOKS_LOWER}) AS token FROM documents
  )
),
dfreq AS (SELECT token, COUNT(*) AS doc_freq FROM tok GROUP BY token),
ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY doc_freq DESC, token) AS INTEGER) AS rank,
         token, doc_freq
  FROM dfreq
)
SELECT rank, token, doc_freq FROM ranked WHERE rank <= 50
"""

SQL_TFIDF_TOP = f"""
WITH tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest({SQL_TOKS_LOWER}) AS token FROM documents
  ) WHERE length(token) >= 4
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (
  SELECT token, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token
),
nn AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         CAST(tf.tf AS DOUBLE) * ln(CAST(nn.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS tfidf
  FROM tf JOIN dfreq USING (token) CROSS JOIN nn
),
ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INTEGER) AS rnk,
         token, tf, df, tfidf
  FROM scored
)
SELECT doc_id, rnk, token, tf, df FROM ranked WHERE rnk <= 3
"""


def _sql_sample_stratified() -> str:
    from .operators.textpipe import SAMPLE_MIX, SAMPLE_MOD

    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in sorted(SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, lang, source FROM documents
WHERE (doc_id * {SAMPLE_MIX}) % {SAMPLE_MOD} % 100 < CASE {cases} ELSE 10 END
"""


SQL_DOC_LEN_OUTLIERS = """
WITH m AS (
  SELECT COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS s1,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents
)
SELECT doc_id, n_chars,
  (CAST(n_chars AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
    / sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS z
FROM documents CROSS JOIN m
WHERE abs((CAST(n_chars AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
    / sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))) > 2.0
"""

SQL_SQ8_ANN = f"""
WITH st AS (
  SELECT i, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
  FROM (SELECT unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i FROM embeddings)
  GROUP BY i
),
rng AS (SELECT list(mn ORDER BY i) AS qmin, list(mx ORDER BY i) AS qmax FROM st),
enc AS (
  SELECT vec_id, list_transform(embedding, (x, i) ->
    CASE WHEN qmax[i] = qmin[i] THEN 0
         ELSE CAST(least(255, greatest(0, floor((CAST(x AS DOUBLE) - qmin[i]) * 256.0 / (qmax[i] - qmin[i])))) AS BIGINT)
    END) AS code
  FROM embeddings CROSS JOIN rng
),
q AS (SELECT vec_id AS query_id, code AS qcode FROM enc WHERE vec_id < {N_QUERIES}),
b AS (SELECT vec_id AS neighbor_id, code AS bcode FROM enc),
pairs AS (
  SELECT query_id, neighbor_id,
    list_reduce(list_transform(qcode, (a, i) -> (a - bcode[i]) * (a - bcode[i])), (s, u) -> s + u) AS qdist2
  FROM b CROSS JOIN q
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY qdist2, neighbor_id) AS INTEGER) AS rnk,
         neighbor_id, qdist2
  FROM pairs
)
SELECT query_id, rnk, neighbor_id, qdist2 FROM ranked WHERE rnk <= 10
"""

SQL_PURCHASE_VIEW_WINDOW = """
WITH p AS (
  SELECT user_id, ts, event_id AS purchase_id FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts, value AS view_value FROM events WHERE event_type = 'view'
),
j AS (
  SELECT p.purchase_id, v.view_value
  FROM p JOIN v ON p.user_id = v.user_id
   AND v.ts > p.ts - INTERVAL 3600 SECOND AND v.ts <= p.ts
)
SELECT purchase_id, COUNT(*) AS n_views,
  CAST(SUM(CAST(view_value AS DECIMAL(18,2))) AS DOUBLE) AS views_value
FROM j GROUP BY purchase_id
"""

def q_ivf_sq8_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quantize import ivf_sq8_knn

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_sq8_knn(emb, queries, dim=DIM, k=10, n_probe=IVF_PROBE)


_SQ8_ENC_SQL = """list_transform({vec}, (x, i) ->
    CASE WHEN qmax[i] = qmin[i] THEN 0
         ELSE CAST(least(255, greatest(0, floor((CAST(x AS DOUBLE) - qmin[i]) * 256.0 / (qmax[i] - qmin[i])))) AS BIGINT)
    END)"""

SQL_IVF_SQ8_ANN = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), perdim AS (
  SELECT label AS cell, pos, CAST(SUM(CAST(v[pos] AS DECIMAL(28,10))) AS DOUBLE) AS s, COUNT(*) AS n
  FROM e CROSS JOIN (SELECT unnest(range(1, {DIM + 1})) AS pos) p
  GROUP BY 1, 2
), cents AS (
  SELECT cell, list(s / n ORDER BY pos) AS centroid FROM perdim GROUP BY cell
), assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {{cosva}}, c.cell) AS crnk
    FROM e CROSS JOIN cents c
  ) WHERE crnk = 1
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY {{cosqa}}, c.cell) AS crnk
    FROM q CROSS JOIN cents c
  ) WHERE crnk <= {IVF_PROBE}
), st AS (
  SELECT i, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
  FROM (SELECT unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i FROM embeddings)
  GROUP BY i
), rng AS (SELECT list(mn ORDER BY i) AS qmin, list(mx ORDER BY i) AS qmax FROM st),
benc AS (
  SELECT a.vec_id AS neighbor_id, a.cell, {_SQ8_ENC_SQL.format(vec='a.v')} AS bcode
  FROM assigned a CROSS JOIN rng
), qenc AS (
  SELECT p.query_id, p.cell, {_SQ8_ENC_SQL.format(vec='p.qv')} AS qcode
  FROM probes p CROSS JOIN rng
), cand AS (
  SELECT qenc.query_id, benc.neighbor_id,
    list_reduce(list_transform(qcode, (a, i) -> (a - bcode[i]) * (a - bcode[i])), (s, u) -> s + u) AS qdist2
  FROM benc JOIN qenc USING (cell)
), ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY qdist2, neighbor_id) AS INTEGER) AS rnk,
         neighbor_id, qdist2
  FROM cand
)
SELECT query_id, rnk, neighbor_id, qdist2 FROM ranked WHERE rnk <= 10
"""


SQL_QUANTITY_ORDER_STATS = """
SELECT l_returnflag, COUNT(*) AS n,
  MIN(l_quantity) AS min_qty,
  quantile_disc(l_quantity, 0.5) AS p50_qty,
  quantile_disc(l_quantity, 0.9) AS p90_qty,
  MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
"""

SQL_CUSTOMER_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
  CAST(row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
FROM orders
"""

SQL_NATION_TRADE_VOLUME = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(SUM({MONEY}) AS DOUBLE) AS revenue, COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name != nc.n_name
GROUP BY 1, 2
"""

SQL_SHIPPING_PRIORITY = f"""
WITH agg AS (
  SELECT l_orderkey, o_orderdate, CAST(SUM({MONEY}) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND l_shipdate > TIMESTAMP '1995-03-15'
    AND o_orderdate < TIMESTAMP '1995-03-15'
  GROUP BY 1, 2
), ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS INTEGER) AS rnk,
         l_orderkey, o_orderdate, revenue
  FROM agg
)
SELECT rnk, l_orderkey, o_orderdate, revenue FROM ranked WHERE rnk <= 10
"""

SQL_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""

SQL_CUSTOMER_ORDER_DISTRIBUTION = """
WITH pc AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS n_customers FROM pc GROUP BY c_count
"""

SQL_LARGE_ORDERS = """
WITH oq AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS tq
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(300 AS DECIMAL(18,2))
)
SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, CAST(tq AS DOUBLE) AS total_qty
FROM oq JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
"""

SQL_PRIORITY_LINESTATUS = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_count,
  COUNT(*) AS n_lineitems
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
"""

SQL_BRAND_SUPPLIER_DISTINCT = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt, COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_size
"""

SQL_SMALL_QUANTITY_REVENUE = """
WITH pp AS (
  SELECT l_partkey AS pp_key, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq, COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand, COUNT(*) AS n_small,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
FROM lineitem
JOIN pp ON l_partkey = pp_key
JOIN part ON l_partkey = p_partkey
WHERE l_quantity < CAST(0.2 AS DOUBLE) * (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
GROUP BY p_brand
"""

SQL_WEALTHY_INACTIVE = """
WITH a AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
), recent AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
)
SELECT c_nationkey, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer CROSS JOIN a
ANTI JOIN recent ON c_custkey = o_custkey
WHERE c_acctbal > avg_bal
GROUP BY c_nationkey
"""

SQL_EVENTS_SLIDING = """
SELECT bucket, event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS bucket,
         event_type, value
  FROM events
)
GROUP BY bucket, event_type
"""

SQL_DOC_REPETITION = f"""
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({SQL_TOKS_LOWER}) AS token FROM documents)
  GROUP BY doc_id, token
), pd AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct, MAX(tf) AS max_tf
  FROM tf GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(n_tokens, 0) AS n_tokens,
  COALESCE(n_distinct, 0) AS n_distinct,
  COALESCE(max_tf, 0) AS max_tf,
  CASE WHEN COALESCE(n_tokens, 0) > 0
       THEN CAST(max_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS top_token_ratio,
  CASE WHEN COALESCE(n_tokens, 0) > 0
       THEN CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS unique_ratio
FROM documents d LEFT JOIN pd USING (doc_id)
"""


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import doc_repetition

    return doc_repetition(load_table(spark, sf_dir, "documents"))


SQL_USER_DAY_ACTIVITY = """
WITH v AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_views,
         SUM(CAST(value AS DECIMAL(18,2))) AS vv
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
), p AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_purchases,
         SUM(CAST(value AS DECIMAL(18,2))) AS pv
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT COALESCE(v.user_id, p.user_id) AS user_id,
  COALESCE(v.day, p.day) AS day,
  COALESCE(n_views, 0) AS n_views,
  COALESCE(n_purchases, 0) AS n_purchases,
  CAST(COALESCE(vv, 0) AS DOUBLE) AS views_value,
  CAST(COALESCE(pv, 0) AS DOUBLE) AS purchases_value
FROM v FULL JOIN p ON v.user_id = p.user_id AND v.day = p.day
"""

SQL_VIEWING_PURCHASERS = """
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""

SQL_CHUNK_DOCUMENTS = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS_LOWER} AS toks FROM documents),
s AS (
  SELECT doc_id, toks, CAST(i AS INTEGER) AS chunk_id, CAST(i * 64 AS INTEGER) AS start
  FROM t, unnest(range(0, CAST(ceil(len(toks) / 64.0) AS BIGINT))) AS u(i)
)
SELECT doc_id, chunk_id, start,
  CAST(len(toks[start + 1 : start + 128]) AS INTEGER) AS n_chunk_tokens,
  array_to_string(toks[start + 1 : start + 128], ' ') AS chunk_text
FROM s
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import chunk_documents

    return chunk_documents(load_table(spark, sf_dir, "documents"), window=128, stride=64)


SQL_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name, CAST(SUM({MONEY}) AS DOUBLE) AS revenue, COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""

SQL_PROMO_REVENUE_RATIO = f"""
SELECT date_trunc('month', o_orderdate) AS order_month,
  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {MONEY} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
  CAST(SUM({MONEY}) AS DOUBLE) AS total_revenue,
  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {MONEY} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(SUM({MONEY}) AS DOUBLE) AS promo_ratio,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""

SQL_PRICING_CUBE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

SQL_WAITING_SUPPLIER_ORDERS = """
WITH l1 AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
), ns AS (
  SELECT l_orderkey AS nok, COUNT(DISTINCT l_suppkey) AS n_suppliers
  FROM lineitem GROUP BY 1
)
SELECT l1.l_orderkey, l1.l_suppkey, ns.n_suppliers
FROM l1 JOIN ns ON l1.l_orderkey = ns.nok
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey != l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey != l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
"""

SQL_VIEWERS_NEVER_PURCHASING = """
SELECT user_id FROM events
WHERE event_type = 'view' AND ts >= TIMESTAMP '2024-01-25'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-25'
"""

SQL_USER_DAILY_TIMELINE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,2))) AS dv
  FROM events WHERE user_id < 50 GROUP BY 1, 2
), spans AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id, CAST(d AS DATE) AS day
  FROM spans, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS t(d)
)
SELECT spine.user_id, spine.day,
  COALESCE(n_events, 0) AS n_events,
  CAST(COALESCE(dv, 0) AS DOUBLE) AS day_value
FROM spine LEFT JOIN daily ON spine.user_id = daily.user_id AND spine.day = daily.day
"""

SQL_EVENTS_TIME_BREAKDOWN = """
SELECT CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m,
  CAST(dayofweek(ts) AS INTEGER) AS dow, CAST(hour(ts) AS INTEGER) AS hod,
  date_trunc('week', ts) AS week_start,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3, 4, 5
"""

SQL_DOC_SLUGS = r"""
SELECT doc_id,
  substring(regexp_replace(trim(lower(source)), '[^a-z0-9]+', '-', 'g'), 1, 12) AS source_slug,
  upper(lang) AS lang_code,
  CAST(length(trim(text)) AS INTEGER) AS trimmed_chars,
  substring(text, 1, 20) AS head,
  CAST(position('the' IN lower(text)) AS INTEGER) AS first_the,
  lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id
FROM documents
"""


def q_doc_slugs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: normalization (lower/trim), regexp
    slugify, substring, position, padding — all JVM intrinsics, one
    map-only pass (no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.trim(F.lower(F.col("source"))), "[^a-z0-9]+", "-"), 1, 12
        ).alias("source_slug"),
        F.upper("lang").alias("lang_code"),
        F.length(F.trim(F.col("text"))).alias("trimmed_chars"),
        F.substring("text", 1, 20).alias("head"),
        F.instr(F.lower(F.col("text")), "the").alias("first_the"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
    )


SQL_LANG_EXEMPLARS = """
WITH r AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
SELECT lang, CAST(rn AS INTEGER) AS rnk, doc_id, n_chars
FROM r WHERE rn <= 3
"""


def q_lang_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group exemplar sampling: the N longest
    documents per language (group-limit via ranking window) — how a
    curation run pulls review samples per stratum. One shuffle on the
    stratum key; Spark 4 pushes the rank<=N filter into the window sort
    (WindowGroupLimit), so each group materializes only N rows."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("lang", "rnk", "doc_id", "n_chars")
    )


SQL_USER_EVENT_PIVOT = """
SELECT user_id,
  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click_value,
  CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error_value,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup_value,
  CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view_value
FROM events GROUP BY user_id
"""

SQL_CUSTOMER_ORDER_GAPS = """
SELECT o_custkey, o_orderkey,
  CAST(date_diff('day',
    CAST(lag(o_orderdate) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
  lead(o_orderkey) OVER w AS next_orderkey,
  CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS price_quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

SQL_EMBEDDING_DIM_STATS = f"""
WITH x AS (
  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
)
SELECT pos, COUNT(*) AS n, MIN(v) AS dim_min, MAX(v) AS dim_max,
  CAST(SUM(CAST(floor(v * 10000000.0) AS BIGINT)) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) / 10000000.0 AS dim_mean
FROM x GROUP BY pos
"""

SQL_MULTIMODAL_FRAMES = """
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS olen FROM documents)
SELECT doc_id,
  CAST(i AS INTEGER) AS frame_no,
  CAST(least(64, olen - i * 640) AS INTEGER) AS frame_bytes
FROM d, unnest(range(0, CAST(ceil(olen / 640.0) AS BIGINT))) AS t(i)
"""


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics over the embedding array column —
    the array-analytics shape (posexplode -> groupBy position) that also
    trains the SQ8 quantizer ranges.

    Mean is FIXED-POINT at 1e-7 resolution: floor(v*1e7) integer sums.
    Exact-integer accumulation keeps the result order-independent AND
    engine-identical — the earlier double->DECIMAL cast diverged from
    DuckDB by 1 unit on a rounding tie at sf0.01 (half-up vs half-even),
    while floor() ties never exist. Still map-side aggregable, so the
    plan survives 100 TB (a sequential fold would not)."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(F.posexplode(to_vec("embedding")).alias("pos", "v"))
    fx = F.floor(F.col("v") * F.lit(10000000.0)).cast("long")
    n_d = F.count(F.lit(1)).cast("double")
    return x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("dim_min"),
        F.max("v").alias("dim_max"),
        (F.sum(fx).cast("double") / n_d / F.lit(10000000.0)).alias("dim_mean"),
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing: 1 payload row -> N frame rows
    through an Arrow-batched mapInPandas kernel (multimodal/binary.py);
    the oracle mirrors the byte-window arithmetic exactly."""
    from .multimodal.binary import frame_sample

    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    frames = frame_sample(blobs, id_col="doc_id", every_n=10)
    return frames.select(
        "doc_id", "frame_no", F.length("frame_payload").cast("int").alias("frame_bytes")
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_keep_best(load_table(spark, sf_dir, "documents"))


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus report card: per (source, lang) document counts, size, and
    decimal-exact mean quality — the rollout summary a curation run
    publishes. One shuffle on the tiny (source, lang) key."""
    docs = load_table(spark, sf_dir, "documents")
    q = T.quality_features(F.col("text"))["quality_score"]
    return (
        docs.select("source", "lang", "n_chars", q.alias("q"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum(F.col("q").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias(
                "mean_quality"
            ),
            F.sum(F.when(F.col("q") >= 0.5, 1).otherwise(0)).alias("n_high_quality"),
        )
        .orderBy("source", "lang")
    )


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import pack_chunks

    return pack_chunks(load_table(spark, sf_dir, "documents"))


_QUALITY_CTE = """
  SELECT doc_id, text, source, lang, n_chars,
         CAST(len({toks_raw}) AS INTEGER) AS n_tok,
         CAST(length(text) AS INTEGER) AS n_char,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INTEGER) AS n_alpha,
         CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS INTEGER) AS n_punct,
         CAST(len(list_filter(list_transform({toks_raw}, x -> lower(x)),
                              t2 -> list_contains([{stop}], t2))) AS INTEGER) AS n_stop
  FROM documents
"""

_QSCORE = """
    (((CASE WHEN n_tok >= 5 AND n_tok <= 5000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
     + CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
     + CASE WHEN sr >= 0.05 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
     + CASE WHEN pr <= 0.2 THEN CAST(0.1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
"""


def _sql_quality_scored() -> str:
    """CTE chain `qt -> qs` ending with (doc_id, source, lang, n_chars,
    fp, q) — the shared prefix of the keep-best and report oracles."""
    stop = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)
    return f"""
qt AS ({_QUALITY_CTE.format(toks_raw=SQL_TOKS_RAW, stop=stop)}),
qs AS (
  SELECT doc_id, source, lang, n_chars, {_FP_SQL} AS fp,
    {_QSCORE.format()} AS q
  FROM (
    SELECT *,
      CASE WHEN n_tok > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS mwl,
      CASE WHEN n_char > 0 THEN CAST(n_punct AS DOUBLE) / CAST(n_char AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS pr,
      CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS sr
    FROM qt
  )
)
"""


def _sql_dedup_keep_best() -> str:
    return f"""
WITH {_sql_quality_scored()},
r AS (
  SELECT fp, doc_id, q,
         row_number() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY fp) AS n_dups
  FROM qs
)
SELECT fp, doc_id AS keeper_doc_id, q AS keeper_quality, n_dups FROM r WHERE rn = 1
"""


def _sql_corpus_report() -> str:
    return f"""
WITH {_sql_quality_scored()}
SELECT source, lang, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_quality,
  CAST(SUM(CASE WHEN q >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality
FROM qs GROUP BY source, lang
"""


SQL_PACK_CHUNKS = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS_LOWER} AS toks FROM documents),
s AS (
  SELECT doc_id, toks, CAST(i AS INTEGER) AS chunk_id, CAST(i * 64 AS INTEGER) AS start
  FROM t, unnest(range(0, CAST(ceil(len(toks) / 64.0) AS BIGINT))) AS u(i)
), ch AS (
  SELECT CAST(doc_id % 32 AS INTEGER) AS shard, doc_id, chunk_id,
         CAST(len(toks[start + 1 : start + 128]) AS INTEGER) AS n_chunk_tokens
  FROM s
), packed AS (
  SELECT shard, doc_id, chunk_id, n_chunk_tokens,
    COALESCE(CAST(SUM(n_chunk_tokens) OVER (
      PARTITION BY shard ORDER BY doc_id, chunk_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
  FROM ch
)
SELECT shard, doc_id, chunk_id, n_chunk_tokens,
  CAST(shard AS BIGINT) * 1000000 + CAST(floor(cum_before / 2048) AS BIGINT) AS pack_id
FROM packed
"""

PII_SUFFIX_CASE = (
    "CASE WHEN doc_id % 7 = 0 THEN ' contact: user' || CAST(doc_id AS VARCHAR) "
    "|| '@example.com 555-123-4567 10.0.0.1' ELSE '' END"
)


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents (emails/phones/IPs -> placeholders,
    with per-class counts). The corpus is synthetic, so deterministic
    PII is injected into every 7th document first — the injection is
    part of the query on BOTH sides, so the oracle checks real
    replacements, not a no-op. Map-only: regexp passes fuse into the
    scan stage."""
    docs = load_table(spark, sf_dir, "documents")
    suffix = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com 555-123-4567 10.0.0.1"),
        ),
    ).otherwise(F.lit(""))
    seeded = docs.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))
    red = T.redact_pii(F.col("text"))
    seeded = seeded.withColumn("clean_text", red["clean_text"])
    return seeded.select(
        "doc_id",
        red["n_emails"].alias("n_emails"),
        red["n_phones"].alias("n_phones"),
        red["n_ips"].alias("n_ips"),
        F.length(red["clean_text"]).alias("clean_chars"),
        F.expr(
            "substring(clean_text, greatest(length(clean_text) - 39, 1), 40)"
        ).alias("clean_tail"),
    )


def _sql_redact_pii() -> str:
    email, phone, ip = T.PII_EMAIL, T.PII_PHONE, T.PII_IP
    clean = (
        f"regexp_replace(regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'), "
        f"'{phone}', '<PHONE>', 'g'), '{ip}', '<IP>', 'g')"
    )
    return f"""
WITH seeded AS (
  SELECT doc_id, text || {PII_SUFFIX_CASE} AS text FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{email}')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(text, '{phone}')) AS INTEGER) AS n_phones,
  CAST(len(regexp_extract_all(text, '{ip}')) AS INTEGER) AS n_ips,
  CAST(length({clean}) AS INTEGER) AS clean_chars,
  substring({clean}, greatest(length({clean}) - 39, 1), 40) AS clean_tail
FROM seeded
"""


SQL_SHINGLES8 = (
    "CASE WHEN len(toks) >= 8 THEN "
    "list_transform(range(0, len(toks) - 7), i -> array_to_string(toks[i+1:i+8], ' ')) "
    "ELSE []::VARCHAR[] END"
)

SQL_DECONTAMINATE = f"""
WITH d AS (SELECT doc_id, {SQL_TOKS_LOWER} AS toks FROM documents),
doc_sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest({SQL_SHINGLES8}) AS shingle FROM d
  )
),
bench_sh AS (
  SELECT DISTINCT shingle FROM (
    SELECT unnest({SQL_SHINGLES8}) AS shingle FROM d WHERE doc_id % 97 = 0
  )
)
SELECT doc_id, COUNT(*) AS n_leaked_ngrams
FROM doc_sh SEMI JOIN bench_sh USING (shingle)
GROUP BY doc_id
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination vs a fake held-out set (every 97th document
    plays the benchmark): flag training docs sharing any 8-gram."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return D.decontaminate(docs, bench, n=8)


SQL_SPECIAL_REVENUE = f"""
SELECT COUNT(*) AS n_lineitems, CAST(SUM({MONEY}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_type IN ('PROMO', 'ECONOMY') AND l_quantity BETWEEN 25 AND 50)
"""


def q_special_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive predicate: revenue from line items
    matching ANY of three (brand, size, quantity) conjunct bundles. The
    OR-of-ANDs stays ONE join with a composite residual — the naive
    translation (three joins unioned) would scan lineitem three times.
    Catalyst extracts the common sub-predicates it can push (quantity
    bounds to the lineitem scan, brand/size/type to the broadcast part
    scan) and evaluates the rest post-join."""
    from .operators.relational import DEC

    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    disc_price = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    )
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & qty.between(10, 30))
        | (F.col("p_type").isin("PROMO", "ECONOMY") & qty.between(25, 50))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(disc_price).cast("double").alias("revenue"),
        )
    )


SQL_LENGTH_TOKEN_CORRELATION = f"""
WITH x AS (
  SELECT n_chars AS a, CAST(len({SQL_TOKS_RAW}) AS BIGINT) AS b FROM documents
), m AS (
  SELECT COUNT(*) AS n,
    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
    CAST(SUM(a * b) AS BIGINT) AS sab,
    CAST(SUM(a * a) AS BIGINT) AS saa, CAST(SUM(b * b) AS BIGINT) AS sbb
  FROM x
)
SELECT n, sa, sb,
  (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
    / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
       * sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
    AS corr_chars_tokens
FROM m
"""


def q_length_token_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics: Pearson correlation between document length
    and token count, computed from EXACT integer moment sums (n, Σx, Σy,
    Σxy, Σx², Σy²) so the one final float expression is engine-identical
    — Spark's built-in corr() is Welford-streaming and cannot be
    mirrored bit-for-bit. One map-side-combined aggregation pass."""
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        F.col("n_chars").alias("a"),
        F.size(T.tokens(F.col("text"))).cast("long").alias("b"),
    )
    m = x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    corr = (d("n") * d("sab") - d("sa") * d("sb")) / (
        F.sqrt(d("n") * d("saa") - d("sa") * d("sa"))
        * F.sqrt(d("n") * d("sbb") - d("sb") * d("sb"))
    )
    return m.select("n", "sa", "sb", corr.alias("corr_chars_tokens"))


SQL_DOC_LENGTH_HISTOGRAM = """
SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket,
  CAST(floor(n_chars / 100) * 100 AS BIGINT) AS bucket_lo,
  COUNT(*) AS n_docs,
  CAST(MIN(n_chars) AS BIGINT) AS min_chars, CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY 1, 2
"""


def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of document lengths (100-char bins) — the
    binning aggregation every corpus report needs; integer bucket math,
    one shuffle on the tiny bucket key."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / 100)
    return (
        docs.groupBy(
            bucket.alias("bucket"), (bucket * 100).alias("bucket_lo")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("bucket")
    )


CURATE_RATES = {"de": 60, "en": 40}  # sample %, default 20
CURATE_MIN_QUALITY = 0.5


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pipeline import curate

    return curate(
        load_table(spark, sf_dir, "documents"),
        rates_pct=CURATE_RATES,
        min_quality=CURATE_MIN_QUALITY,
    )


def q_pretrain_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pipeline import pretrain_sequences

    return pretrain_sequences(
        load_table(spark, sf_dir, "documents"),
        rates_pct=CURATE_RATES,
        min_quality=CURATE_MIN_QUALITY,
    )


def _curation_ctes() -> str:
    """WITH-body of the curation composition (score -> gate ->
    dedup-keeper -> sample), ending in a ``curated`` CTE of surviving
    doc_ids — shared by the standalone pipeline oracle and the
    end-to-end pretrain_sequences oracle."""
    from .operators.textpipe import SAMPLE_MIX, SAMPLE_MOD

    stop = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)
    score_defs = []
    for lang in T.LANG_PRIORITY:
        words = ", ".join(f"'{w}'" for w in T.LANG_STOPWORDS[lang])
        score_defs.append(
            f"len(list_filter(ltoks, t -> list_contains([{words}], t))) AS s_{lang}"
        )
    best = "greatest(" + ", ".join(f"s_{l}" for l in T.LANG_PRIORITY) + ")"
    lang_cases = " ".join(
        f"WHEN s_{l} > 0 AND s_{l} = {best} THEN '{l}'" for l in T.LANG_PRIORITY
    )
    rate_cases = " ".join(
        f"WHEN lang_pred = '{lang}' THEN {pct}" for lang, pct in sorted(CURATE_RATES.items())
    )
    return f"""
WITH t AS (
  SELECT doc_id, text, {SQL_TOKS_LOWER} AS ltoks,
         CAST(len({SQL_TOKS_RAW}) AS INTEGER) AS n_tok,
         CAST(length(text) AS INTEGER) AS n_char,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INTEGER) AS n_alpha,
         CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS INTEGER) AS n_punct,
         CAST(len(list_filter(list_transform({SQL_TOKS_RAW}, x -> lower(x)),
                              t2 -> list_contains([{stop}], t2))) AS INTEGER) AS n_stop
  FROM documents
), s AS (
  SELECT doc_id, text, n_tok, {', '.join(score_defs)},
    CASE WHEN n_tok > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS mean_word_len,
    CASE WHEN n_char > 0 THEN CAST(n_punct AS DOUBLE) / CAST(n_char AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS punct_ratio,
    CASE WHEN n_tok > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS stopword_ratio
  FROM t
), scored AS (
  SELECT doc_id, text, CASE {lang_cases} ELSE 'und' END AS lang_pred,
    n_tok AS n_tokens,
    (((CASE WHEN n_tok >= 5 AND n_tok <= 5000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
     + CASE WHEN mean_word_len >= 2.0 AND mean_word_len <= 12.0 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
     + CASE WHEN stopword_ratio >= 0.05 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
     + CASE WHEN punct_ratio <= 0.2 THEN CAST(0.1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) AS quality_score
  FROM s
), gated AS (
  SELECT * FROM scored WHERE quality_score >= {CURATE_MIN_QUALITY} AND lang_pred != 'und'
), keyed AS (
  SELECT doc_id, lang_pred, n_tokens, quality_score,
         row_number() OVER (PARTITION BY {_FP_SQL} ORDER BY doc_id) AS rn
  FROM gated
), curated AS (
  SELECT doc_id, lang_pred, n_tokens, quality_score
  FROM keyed
  WHERE rn = 1
    AND (doc_id * {SAMPLE_MIX}) % {SAMPLE_MOD} % 100 < CASE {rate_cases} ELSE 20 END
)"""


def _sql_curation_pipeline() -> str:
    return (
        _curation_ctes()
        + "\nSELECT doc_id, lang_pred, n_tokens, quality_score FROM curated"
    )


def _sql_pretrain_sequences() -> str:
    """curate -> chunk -> pack, one statement: the curated doc_ids feed
    the tokenizer, and the chunk/pack CTEs are the same shapes as the
    standalone oracles."""
    return f"""{{ctes}},
pt AS (
  SELECT d.doc_id, {{toks}} AS toks
  FROM documents d JOIN curated USING (doc_id)
), ps AS (
  SELECT doc_id, toks, CAST(i AS INTEGER) AS chunk_id, CAST(i * 64 AS INTEGER) AS start
  FROM pt, unnest(range(0, CAST(ceil(len(toks) / 64.0) AS BIGINT))) AS u(i)
), pch AS (
  SELECT CAST(doc_id % 32 AS INTEGER) AS shard, doc_id, chunk_id,
         CAST(len(toks[start + 1 : start + 128]) AS INTEGER) AS n_chunk_tokens
  FROM ps
), ppacked AS (
  SELECT shard, doc_id, chunk_id, n_chunk_tokens,
    COALESCE(CAST(SUM(n_chunk_tokens) OVER (
      PARTITION BY shard ORDER BY doc_id, chunk_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
  FROM pch
)
SELECT shard, doc_id, chunk_id, n_chunk_tokens,
  CAST(shard AS BIGINT) * 1000000 + CAST(floor(cum_before / 2048) AS BIGINT) AS pack_id
FROM ppacked
""".format(ctes=_curation_ctes(), toks="{SQL_TOKS_LOWER}").format(SQL_TOKS_LOWER=SQL_TOKS_LOWER)


SQL_DATASET_SPLIT = """
SELECT doc_id, lang,
  CASE WHEN ((doc_id + 9176) * 2654435761) % 2147483647 % 100 < 5 THEN 'val'
       WHEN ((doc_id + 9176) * 2654435761) % 2147483647 % 100 < 10 THEN 'test'
       ELSE 'train' END AS split
FROM documents
"""

SQL_TRAINING_SHUFFLE = """
WITH keyed AS (
  SELECT doc_id,
    CAST((doc_id * 2654435761) % 2147483647 % 8 AS INTEGER) AS shard,
    ((doc_id + 40503) * 2654435761) % 2147483647 AS ord
  FROM documents
)
SELECT doc_id, shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS INTEGER) AS pos
FROM keyed
"""

SQL_NORMALIZE_EMBEDDINGS = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), normed AS (
  SELECT vec_id,
    CASE WHEN sqrt(list_reduce(list_transform(v, (x, i) -> x * x), (s, u) -> s + u)) = 0
         THEN v
         ELSE list_transform(v, (x, i) -> x / sqrt(list_reduce(list_transform(v, (y, j) -> y * y), (s, u) -> s + u)))
    END AS nv
  FROM base
)
SELECT vec_id,
  sqrt(list_reduce(list_transform(nv, (x, i) -> x * x), (s, u) -> s + u)) AS unit_norm,
  nv[1] AS head0
FROM normed
"""

SQL_TABLE_PROFILE = """
SELECT COUNT(*) AS n_rows,
  COUNT(o_custkey) AS n_custkey_nonnull,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT o_orderstatus) AS n_statuses,
  MIN(o_orderdate) AS min_orderdate,
  MAX(o_orderdate) AS max_orderdate,
  MIN(o_totalprice) AS min_totalprice,
  MAX(o_totalprice) AS max_totalprice
FROM orders
"""

SQL_CUSTOMER_TRAILING_REVENUE = """
SELECT o_orderkey, o_custkey, o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_revenue,
  COUNT(*) OVER w AS n_orders_window
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate
  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
)
"""

SQL_USER_TOP_EVENT = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
), ranked AS (
  SELECT user_id, event_type, n,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rnk
  FROM counts
)
SELECT user_id, event_type AS top_event, n AS n_events FROM ranked WHERE rnk = 1
"""

SQL_FORECAST_REVENUE_CHANGE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

SQL_RETURNED_ITEM_CUSTOMERS = f"""
WITH agg AS (
  SELECT o_custkey, CAST(SUM({MONEY}) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01'
    AND o_orderdate < TIMESTAMP '1996-10-01' + INTERVAL 3 MONTH
  GROUP BY 1
), ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS INTEGER) AS rnk,
    c_custkey, c_name, revenue, c_acctbal, n_name
  FROM agg
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT * FROM ranked WHERE rnk <= 20
"""

SQL_NATION_MARKET_SHARE = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
  CAST(SUM(CASE WHEN n2.n_name = 'CHINA' THEN {MONEY} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_revenue,
  CAST(SUM({MONEY}) AS DOUBLE) AS total_revenue,
  CAST(SUM(CASE WHEN n2.n_name = 'CHINA' THEN {MONEY} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(SUM({MONEY}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY 1
"""

SQL_TOP_REVENUE_SUPPLIER = f"""
WITH revenue AS (
  SELECT l_suppkey, CAST(SUM({MONEY}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-01-01' + INTERVAL 3 MONTH
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""

# Q2 shape: the correlated MIN stays LITERAL here (per-part regional
# minimum as a correlated scalar subquery); the Spark side decorrelates
# it manually — the oracle proves the rewrite.
SQL_MIN_COST_SUPPLIER = """
WITH offers AS (
  SELECT l_partkey AS pk, l_suppkey AS sk, MIN(l_extendedprice) AS supply_cost
  FROM lineitem GROUP BY 1, 2
),
regional AS (
  SELECT pk, sk, supply_cost, s_name, s_acctbal, n_name
  FROM offers
  JOIN supplier ON sk = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM part JOIN regional ON p_partkey = pk
WHERE p_size <= 25 AND p_type = 'STANDARD'
  AND supply_cost = (
    SELECT MIN(r2.supply_cost) FROM regional r2 WHERE r2.pk = p_partkey
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

SQL_NATION_PROFIT = """
SELECT
  n_name AS nation,
  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
  CAST(SUM(
    CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))
  ) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""

# Q11 shape: the global scalar stays a LITERAL scalar subquery here.
SQL_IMPORTANT_PARTS = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM per_part
WHERE part_value > (SELECT CAST(SUM(part_value) AS DECIMAL(18,2)) FROM per_part)
                   * CAST('0.001' AS DECIMAL(8,6))
ORDER BY part_value DESC, l_partkey
"""

# Q20 shape: LITERAL nested IN with a correlated per-part scalar.
SQL_DOMINANT_SUPPLIERS = """
WITH pair AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS pair_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'large%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-01-01' + INTERVAL 1 YEAR
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT sk FROM pair p1
  WHERE pair_qty > (SELECT CAST(SUM(p2.pair_qty) AS DECIMAL(18,2))
                    FROM pair p2 WHERE p2.pk = p1.pk)
                   * CAST('0.3' AS DECIMAL(2,1))
)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Retrieval surface: radius search, kNN graph, BM25, hybrid RRF, MMR
# ---------------------------------------------------------------------------

RANGE_RADIUS = 1.25  # ~ the 3rd percentile of pairwise L2 on the testdata
BM25_TERMS = ("spark", "hash", "window", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
MMR_NQ = 5  # mmr query set = vec_id < MMR_NQ
MMR_NCAND = 20
MMR_K = 5
MMR_LAM = 0.5
HYBRID_DEPTH = 30  # per-family list depth fused by RRF


def q_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.retrieval import range_search

    emb = load_table(spark, sf_dir, "embeddings")
    return range_search(emb, _emb_queries(spark, sf_dir), radius=RANGE_RADIUS, metric="l2")


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.retrieval import knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_graph(emb, k=5, metric="l2")


def q_bm25_doc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.retrieval import bm25_rank

    docs = load_table(spark, sf_dir, "documents")
    return bm25_rank(docs, list(BM25_TERMS), k=20, k1=BM25_K1, b=BM25_B)


def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: per-query vector ranking (exact cosine kNN)
    fused with a shared keyword ranking (BM25 over the aligned documents
    table — doc_id and vec_id are the same key space) via reciprocal-
    rank fusion."""
    from .operators.retrieval import bm25_rank, rrf_fuse

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    vec_hits = knn_exact(
        emb, _emb_queries(spark, sf_dir), k=HYBRID_DEPTH, metric="cosine"
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rnk")
    kw = bm25_rank(docs, list(BM25_TERMS), k=HYBRID_DEPTH, k1=BM25_K1, b=BM25_B)
    qids = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id")
    )
    kw_hits = kw.crossJoin(F.broadcast(qids)).select("query_id", "doc_id", "rnk")
    return rrf_fuse(vec_hits, kw_hits, k=10)


def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification of the top cosine candidates per query —
    declarative greedy re-ranking (operators/retrieval.mmr_rerank)."""
    from pyspark.sql import Window

    from .functions.vector import dot, l2_norm
    from .operators.retrieval import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    qs = F.broadcast(
        emb.filter(F.col("vec_id") < MMR_NQ).select(
            F.col("vec_id").alias("query_id"), to_vec("embedding").alias("_qv")
        )
    )
    b = emb.select(F.col("vec_id").alias("doc_id"), to_vec("embedding").alias("vec"))
    sim = dot(F.col("vec"), F.col("_qv")) / (
        l2_norm(F.col("vec")) * l2_norm(F.col("_qv"))
    )
    scored = b.crossJoin(qs).select("query_id", "doc_id", sim.alias("rel"), "vec")
    w = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("doc_id"))
    cand = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= MMR_NCAND)
        .select("query_id", "doc_id", "rel", "vec")
    )
    return mmr_rerank(cand, k=MMR_K, lam=MMR_LAM)


SQL_RANGE_SEARCH = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), b AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS v FROM embeddings
), pairs AS (
  SELECT q.query_id, b.neighbor_id, {sql_l2("b.v", "q.qv")} AS dist FROM b CROSS JOIN q
)
SELECT query_id, neighbor_id, dist FROM pairs WHERE dist <= {RANGE_RADIUS!r}
"""

SQL_KNN_GRAPH = f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), pairs AS (
  SELECT a.vec_id AS src_id, c.vec_id AS dst_id, {sql_l2("a.v", "c.v")} AS dist
  FROM b a CROSS JOIN b c WHERE a.vec_id != c.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY dist, dst_id) AS rn FROM pairs
)
SELECT src_id, dst_id, dist, CAST(rn AS INTEGER) AS rnk FROM ranked WHERE rn <= 5
"""


def q_doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways the north star asks for: whitespace
    tokens AND BPE-ish pretokens (the budget currency real pipelines
    use — punctuation-heavy text costs more BPE tokens than whitespace
    counting admits). Map-only; both counts from one scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("ws_tokens"),
        T.bpe_token_count(F.col("text")).alias("bpe_tokens"),
        (
            T.bpe_token_count(F.col("text")).cast("double")
            / T.token_count(F.col("text")).cast("double")
        ).alias("bpe_per_word"),
    ).filter(F.col("ws_tokens") > 0)


def _sql_doc_token_counts() -> str:
    from .functions.text import BPE_PRETOKEN_RE

    ws = r"len(list_filter(regexp_split_to_array(text, '\s+'), x -> x != ''))"
    bpe = f"len(regexp_extract_all(text, '{BPE_PRETOKEN_RE.replace(chr(39), chr(39) * 2)}'))"
    return f"""
SELECT doc_id,
       CAST({ws} AS INTEGER) AS ws_tokens,
       CAST({bpe} AS INTEGER) AS bpe_tokens,
       CAST({bpe} AS DOUBLE) / CAST({ws} AS DOUBLE) AS bpe_per_word
FROM documents WHERE {ws} > 0
"""


def q_customer_value_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank windows (PERCENT_RANK + CUME_DIST) per nation:
    where each customer's balance sits within their nation — the two
    ranking-window shapes the rest of the surface doesn't cover. Both
    are rational functions of integer ranks, so cross-engine float
    equality is exact."""
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("bal_percent_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


SQL_CUSTOMER_VALUE_PERCENTILE = """
SELECT c_custkey, c_nationkey, c_acctbal,
       percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS bal_percent_rank,
       cume_dist() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS bal_cume_dist
FROM customer
"""


def q_user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered behavior sequences: the first 10 event types in
    (ts, event_id) order as one array column — the sequence-mining /
    next-event-model training prep. Determinism without a sort-within-
    groups shuffle trick: collect structs, array_sort (struct ordering =
    field order), then project the type — one groupBy shuffle total."""
    ev = load_table(spark, sf_dir, "events")
    seq = F.slice(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts").cast("long").alias("ep"),
                        "event_id",
                        "event_type",
                    )
                )
            ),
            lambda s: s["event_type"],
        ),
        1,
        10,
    )
    return ev.groupBy("user_id").agg(
        F.array_join(seq, "|").alias("first_events"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_USER_EVENT_SEQUENCES = """
SELECT user_id,
       array_to_string((list(event_type ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id))[1:10], '|') AS first_events,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


def q_knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.clusters import knn_triangles

    return knn_triangles(load_table(spark, sf_dir, "embeddings"), k=5)


SQL_KNN_TRIANGLES = f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), pairs AS (
  SELECT a.vec_id AS src_id, c.vec_id AS dst_id, {sql_l2("a.v", "c.v")} AS dist
  FROM b a CROSS JOIN b c WHERE a.vec_id != c.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY dist, dst_id) AS rn FROM pairs
), g AS (
  SELECT src_id, dst_id FROM ranked WHERE rn <= 5
), und AS (
  SELECT DISTINCT least(src_id, dst_id) AS a, greatest(src_id, dst_id) AS bb FROM g
), tri AS (
  SELECT e1.a AS x, e1.bb AS y, e2.bb AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.bb
  JOIN und e3 ON e3.a = e1.a AND e3.bb = e2.bb
), nodes AS (
  SELECT unnest([x, y, z]) AS vec_id FROM tri
)
SELECT b.vec_id, CAST(COALESCE(t.n, 0) AS BIGINT) AS n_triangles
FROM b LEFT JOIN (SELECT vec_id, COUNT(*) AS n FROM nodes GROUP BY 1) t USING (vec_id)
"""


def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-classifier sweep over the whole embeddings table: every
    vector's label predicted by majority vote of its 5 nearest
    neighbors (self excluded), reported against its true label — the
    standard embedding-quality evaluation (the reference eyeballs
    label coherence of top-5 results, CIFAR notebook cell 4/5; this is
    that check made exhaustive and exact). Vote ties break to the
    smaller label id. Plan: kNN graph (BLAS partial top-k) -> broadcast
    label lookup -> one (vec, label) count shuffle -> per-vec argmax
    window over <= k rows."""
    from pyspark.sql.window import Window

    from .operators.retrieval import knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    g = knn_graph(emb, k=5).select("src_id", "dst_id")
    votes = (
        g.join(
            F.broadcast(emb.select(F.col("vec_id").alias("dst_id"), "label")),
            "dst_id",
        )
        .groupBy("src_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("src_id").orderBy(F.col("votes").desc(), F.col("label"))
    pred = (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("src_id").alias("vec_id"),
            F.col("label").alias("predicted_label"),
            "votes",
        )
    )
    return (
        emb.select("vec_id", "label")
        .join(pred, "vec_id")
        .select(
            "vec_id",
            "label",
            "predicted_label",
            "votes",
            (F.col("label") == F.col("predicted_label")).alias("correct"),
        )
    )


SQL_KNN_LABEL_VOTE = f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), pairs AS (
  SELECT a.vec_id AS src_id, c.vec_id AS dst_id, {sql_l2("a.v", "c.v")} AS dist
  FROM b a CROSS JOIN b c WHERE a.vec_id != c.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY dist, dst_id) AS rn FROM pairs
), g AS (
  SELECT src_id, dst_id FROM ranked WHERE rn <= 5
), votes AS (
  SELECT g.src_id, b.label, COUNT(*) AS votes
  FROM g JOIN b ON b.vec_id = g.dst_id
  GROUP BY 1, 2
), pred AS (
  SELECT src_id AS vec_id, label AS predicted_label, votes FROM (
    SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY votes DESC, label) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT e.vec_id, e.label, p.predicted_label, p.votes,
       e.label = p.predicted_label AS correct
FROM b e JOIN pred p USING (vec_id)
"""


PAGERANK_ITERS = 3
PAGERANK_SCALE = 10**12
PAGERANK_DAMP = 85


def q_knn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.clusters import knn_pagerank

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_pagerank(
        emb, k=5, iters=PAGERANK_ITERS, damping_pct=PAGERANK_DAMP, scale=PAGERANK_SCALE
    )


def _sql_knn_pagerank() -> str:
    """Unrolled integer PageRank over the same kNN-graph CTE as
    SQL_KNN_GRAPH (k=5). DuckDB's // is floor division — identical to
    Spark's div for the non-negative operands here; sums CAST back to
    BIGINT from HUGEINT."""
    base = (PAGERANK_SCALE * (100 - PAGERANK_DAMP)) // 100
    parts = [
        f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), pairs AS (
  SELECT a.vec_id AS src_id, c.vec_id AS dst_id, {sql_l2("a.v", "c.v")} AS dist
  FROM b a CROSS JOIN b c WHERE a.vec_id != c.vec_id
), edges AS (
  SELECT src_id, dst_id FROM (
    SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY dist, dst_id) AS rn FROM pairs
  ) WHERE rn <= 5
), p0 AS (
  SELECT vec_id AS node_id, CAST({PAGERANK_SCALE} AS BIGINT) AS pr FROM embeddings
)"""
    ]
    prev = "p0"
    for it in range(1, PAGERANK_ITERS + 1):
        parts.append(f""",
p{it} AS (
  SELECT n.node_id,
         CAST({base} + coalesce(s.c, 0) AS BIGINT) AS pr
  FROM p0 n LEFT JOIN (
    SELECT e.dst_id AS node_id,
           CAST(SUM(((p.pr * {PAGERANK_DAMP}) // 100) // 5) AS BIGINT) AS c
    FROM edges e JOIN {prev} p ON p.node_id = e.src_id GROUP BY e.dst_id
  ) s ON s.node_id = n.node_id
)""")
        prev = f"p{it}"
    parts.append(f"\nSELECT node_id AS vec_id, pr FROM {prev}")
    return "".join(parts)


def _sql_bm25_hits(terms: tuple[str, ...], k1: float, b: float) -> str:
    """The (doc_id, score, n_terms_hit) relation, mirroring
    operators/retrieval.bm25_rank float-op for float-op. Shared by the
    bm25 oracle and the hybrid-RRF oracle."""
    tf_defs = ", ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS INTEGER) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_defs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    parts = []
    for i in range(len(terms)):
        idf = (
            f"(CAST(s.n AS DOUBLE) - CAST(s.df{i} AS DOUBLE) + 0.5)"
            f" / (CAST(s.df{i} AS DOUBLE) + 0.5)"
        )
        parts.append(
            f"(({idf}) * (CAST(t.tf{i} AS DOUBLE) * {k1 + 1.0!r}))"
            f" / (CAST(t.tf{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r}"
            f" * (CAST(t.dl AS DOUBLE) / (CAST(s.sumdl AS DOUBLE) / CAST(s.n AS DOUBLE)))))"
        )
    score = " + ".join(parts)
    hits = " + ".join(
        f"CASE WHEN t.tf{i} > 0 THEN 1 ELSE 0 END" for i in range(len(terms))
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKS_LOWER} AS toks FROM documents
), t AS (
  SELECT doc_id, CAST(len(toks) AS INTEGER) AS dl, {tf_defs} FROM tok
), s AS (
  SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl, {df_defs} FROM t
), h AS (
  SELECT t.doc_id, {score} AS score, CAST({hits} AS INTEGER) AS n_terms_hit
  FROM t CROSS JOIN s
)
SELECT doc_id, score, n_terms_hit FROM h WHERE n_terms_hit > 0
"""


def _sql_bm25_rank(terms: tuple[str, ...], k1: float, b: float, k: int) -> str:
    return f"""
WITH hits AS ({_sql_bm25_hits(terms, k1, b)}),
top AS (
  SELECT * FROM hits ORDER BY score DESC, doc_id LIMIT {k}
)
SELECT doc_id, score, n_terms_hit,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
FROM top
"""


def _sql_hybrid_rrf() -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), b AS (
  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings
), vpairs AS (
  SELECT q.query_id, b.doc_id, {_cos_sql("b.v", "q.qv")} AS dist FROM b CROSS JOIN q
), vrank AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, doc_id) AS rv
  FROM vpairs
), v AS (
  SELECT query_id, doc_id, rv FROM vrank WHERE rv <= {HYBRID_DEPTH}
), kwhits AS ({_sql_bm25_hits(BM25_TERMS, BM25_K1, BM25_B)}),
kwtop AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM (SELECT * FROM kwhits ORDER BY score DESC, doc_id LIMIT {HYBRID_DEPTH})
), kw AS (
  SELECT query_id, doc_id, rk FROM kwtop
  CROSS JOIN (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < {N_QUERIES})
), fused AS (
  SELECT COALESCE(v.query_id, kw.query_id) AS query_id,
         COALESCE(v.doc_id, kw.doc_id) AS doc_id,
         COALESCE(1.0 / (60.0 + CAST(v.rv AS DOUBLE)), 0.0)
           + COALESCE(1.0 / (60.0 + CAST(kw.rk AS DOUBLE)), 0.0) AS rrf_score
  FROM v FULL JOIN kw ON v.query_id = kw.query_id AND v.doc_id = kw.doc_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rn
  FROM fused
)
SELECT query_id, doc_id, rrf_score, CAST(rn AS INTEGER) AS rnk FROM ranked WHERE rn <= 10
"""


def _sql_cos_sim(a: str, b: str) -> str:
    """Unguarded cosine similarity, mirroring retrieval._cos_sim
    (dot / (|a| * |b|))."""
    return f"{sql_dot(a, b)} / (sqrt({sql_sq_norm(a)}) * sqrt({sql_sq_norm(b)}))"


def _sql_mmr() -> str:
    """Unrolled greedy MMR (MMR_K rounds), float-shape-identical to
    operators/retrieval.mmr_rerank."""
    lam, one_minus = repr(MMR_LAM), repr(1.0 - MMR_LAM)
    head = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {MMR_NQ}
), b AS (
  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings
), scored AS (
  SELECT q.query_id, b.doc_id, {_sql_cos_sim("b.v", "q.qv")} AS rel, b.v AS v
  FROM b CROSS JOIN q
), cand AS (
  SELECT query_id, doc_id, rel, v FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
    FROM scored
  ) WHERE rn <= {MMR_NCAND}
), psim AS (
  SELECT a.query_id, a.doc_id AS ida, b2.doc_id AS idb, {_sql_cos_sim("a.v", "b2.v")} AS s
  FROM cand a JOIN cand b2 USING (query_id) WHERE a.doc_id != b2.doc_id
), sel1 AS (
  SELECT query_id, CAST(1 AS INTEGER) AS pos, doc_id, rel FROM (
    SELECT query_id, doc_id, rel,
           row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
    FROM cand
  ) WHERE rn = 1
), all1 AS (SELECT * FROM sel1)"""
    steps = []
    for t in range(2, MMR_K + 1):
        steps.append(f""",
rem{t} AS (
  SELECT c.* FROM cand c
  LEFT JOIN all{t - 1} s ON s.query_id = c.query_id AND s.doc_id = c.doc_id
  WHERE s.doc_id IS NULL
), mx{t} AS (
  SELECT p.query_id, p.ida AS doc_id, MAX(p.s) AS maxsim
  FROM psim p
  JOIN rem{t} r ON r.query_id = p.query_id AND r.doc_id = p.ida
  JOIN all{t - 1} s ON s.query_id = p.query_id AND s.doc_id = p.idb
  GROUP BY 1, 2
), sc{t} AS (
  SELECT r.query_id, r.doc_id, r.rel, {lam} * r.rel - {one_minus} * m.maxsim AS mmr
  FROM rem{t} r JOIN mx{t} m ON m.query_id = r.query_id AND m.doc_id = r.doc_id
), sel{t} AS (
  SELECT query_id, CAST({t} AS INTEGER) AS pos, doc_id, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY mmr DESC, doc_id) AS rn
    FROM sc{t}
  ) WHERE rn = 1
), all{t} AS (SELECT * FROM all{t - 1} UNION ALL SELECT * FROM sel{t})""")
    return head + "".join(steps) + f"\nSELECT query_id, pos, doc_id, rel FROM all{MMR_K}"


PQ_M = 8  # subspaces for product quantization (DIM 64 -> 8 dims each)
PQ_ANCHORS = 64  # sampled codebook size per subspace


def q_pq_adc_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pq import pq_adc_knn

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_knn(emb, _emb_queries(spark, sf_dir), dim=DIM, m=PQ_M, k=10)


def q_pq_refine_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pq import pq_refine_knn

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_refine_knn(emb, _emb_queries(spark, sf_dir), dim=DIM, m=PQ_M, k=10)


def _pq_adc_ctes() -> str:
    """Shared WITH-body for the PQ oracles: everything through the per-
    (query, neighbor) ``adc`` distances. Codes here carry the *anchor
    vec_id* where the Spark side stores the *position* in the id-ordered
    codebook — ids are dense from 0 in the testdata, so both resolve to
    the same centroid and the ADC sums agree bit-for-bit."""
    d = DIM // PQ_M
    sub_d2 = (
        "list_reduce(list_transform({v}[{s}*%d+1 : {s}*%d+%d], "
        "(x, i) -> (x - {cs}[i]) * (x - {cs}[i])), (a, u) -> a + u)" % (d, d, d)
    )
    enc_d2 = sub_d2.format(v="e.v", s="c.s", cs="c.cs")
    q_d2 = sub_d2.format(v="q.qv", s="c.s", cs="c.cs")
    return f"""e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), anch AS (
  SELECT vec_id AS cell, v AS centroid FROM e ORDER BY vec_id LIMIT {PQ_ANCHORS}
), subs AS (
  SELECT unnest(range(0, {PQ_M})) AS s
), cellsub AS (
  SELECT cell, s, centroid[s*{d}+1 : s*{d}+{d}] AS cs FROM anch CROSS JOIN subs
), enc AS (
  SELECT e.vec_id, c.s, c.cell, {enc_d2} AS d2
  FROM e CROSS JOIN cellsub c
), codes AS (
  SELECT vec_id, s, cell AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cell) AS rn FROM enc
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < {N_QUERIES}
), qlut AS (
  SELECT q.query_id, c.s, c.cell, {q_d2} AS d2
  FROM q CROSS JOIN cellsub c
), adc AS (
  SELECT l.query_id, cd.vec_id AS neighbor_id,
    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(l.d2 ORDER BY l.s)),
                (a, u) -> a + u) AS adc_d2
  FROM codes cd JOIN qlut l ON l.s = cd.s AND l.cell = cd.code
  GROUP BY 1, 2
)"""


def _sql_pq_adc() -> str:
    return f"""
WITH {_pq_adc_ctes()}
SELECT query_id, CAST(rn AS INTEGER) AS rnk, neighbor_id, adc_d2 FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rn
  FROM adc
) WHERE rn <= 10
"""


PQ_REFINE_EXPAND = 20


def _sql_pq_refine() -> str:
    """ADC shortlist of expand*k, exact-L2 re-rank — mirror of
    pq.pq_refine_knn."""
    dist = sql_l2("e.v", "q.qv")
    return f"""
WITH {_pq_adc_ctes()}, shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {PQ_REFINE_EXPAND * 10}
), resc AS (
  SELECT s.query_id, s.neighbor_id, {dist} AS dist
  FROM shortlist s
  JOIN e ON e.vec_id = s.neighbor_id
  JOIN q ON q.query_id = s.query_id
)
SELECT query_id, neighbor_id, dist, CAST(rn AS INTEGER) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM resc
) WHERE rn <= 10
"""


KMEANS_K = 8
KMEANS_ITERS = 2
MAXSIM_TOKENS = 4  # late-interaction: 64-d vector = 4 token-vectors of 16


def q_maxsim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.retrieval import maxsim_search

    emb = load_table(spark, sf_dir, "embeddings")
    return maxsim_search(
        emb, _emb_queries(spark, sf_dir), dim=DIM, n_tokens=MAXSIM_TOKENS, k=10
    )


def _sql_maxsim() -> str:
    """Late-interaction oracle: outer lambda vars named ti/tj so the
    (x, i) params inside the dot/norm folds cannot shadow them."""
    d = DIM // MAXSIM_TOKENS
    sim = _sql_cos_sim(
        f"q.qv[ti*{d}+1 : ti*{d}+{d}]", f"b.v[tj*{d}+1 : tj*{d}+{d}]"
    )
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < {N_QUERIES}
), b AS (
  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings
), scored AS (
  SELECT q.query_id, b.doc_id,
    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      list_transform(range(0, {MAXSIM_TOKENS}), ti ->
        list_max(list_transform(range(0, {MAXSIM_TOKENS}), tj -> {sim})))),
      (a, u) -> a + u) AS maxsim
  FROM b CROSS JOIN q
)
SELECT query_id, doc_id, maxsim, CAST(rn AS INTEGER) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY maxsim DESC, doc_id) AS rn
  FROM scored
) WHERE rn <= 10
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import weighted_sample

    return weighted_sample(load_table(spark, sf_dir, "documents"))


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ivf import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fit(emb, dim=DIM, k=KMEANS_K, iters=KMEANS_ITERS)


SQL_WEIGHTED_SAMPLE = """
WITH p AS (
  SELECT doc_id, lang, n_chars AS weight,
    CAST(n_chars AS DOUBLE)
      / (CAST(((doc_id + 77617) * 2654435761) % 2147483647 + 1 AS DOUBLE)
         / CAST(2147483647 AS DOUBLE)) AS priority
  FROM documents
)
SELECT doc_id, lang, weight, priority, CAST(rn AS INTEGER) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY priority DESC, doc_id) AS rn
  FROM p
) WHERE rn <= 25
"""


def _kmeans_ctes() -> tuple[str, str]:
    """Unrolled Lloyd CTEs mirroring ivf._kmeans_impl: anchor init,
    KMEANS_ITERS x (assign, fixed-point mean update), final assignment
    ``af``. Returns (cte_block, final_centroid_cte_name)."""
    def fold(c: str) -> str:
        return (
            f"list_reduce(list_transform(e.v, (x, i) -> (x - {c}.centroid[i])"
            f" * (x - {c}.centroid[i])), (a, u) -> a + u)"
        )

    def assign(name: str, cents: str) -> str:
        return f"""
{name} AS (
  SELECT vec_id, cell, d2 FROM (
    SELECT t.*, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM (
      SELECT e.vec_id, c.cell, {fold("c")} AS d2 FROM e CROSS JOIN {cents} c
    ) t
  ) WHERE rn = 1
)"""

    def update(name: str, assigned: str) -> str:
        # fixed-point 1e-7 integer sums (see ivf.kmeans_fit docstring):
        # floor() has no rounding ties, so the mean is engine-identical
        return f"""
{name} AS (
  SELECT cell, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 10000000.0 ORDER BY pos)
           AS centroid
  FROM (
    SELECT a.cell, p.pos,
           CAST(SUM(CAST(floor(e.v[p.pos] * 10000000.0) AS BIGINT)) AS BIGINT) AS s,
           COUNT(*) AS n
    FROM {assigned} a JOIN e USING (vec_id)
    CROSS JOIN (SELECT unnest(range(1, {DIM + 1})) AS pos) p
    GROUP BY 1, 2
  ) GROUP BY cell
)"""

    parts = [
        f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, v AS centroid
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT {KMEANS_K})
)"""
    ]
    cents = "c0"
    for it in range(1, KMEANS_ITERS + 1):
        parts.append("," + assign(f"a{it}", cents))
        parts.append("," + update(f"m{it}", f"a{it}"))
        cents = f"m{it}"
    parts.append("," + assign("af", cents))
    return "".join(parts), cents


def _sql_kmeans() -> str:
    ctes, _ = _kmeans_ctes()
    return ctes + "\nSELECT vec_id, cell, d2 FROM af"


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ivf import embedding_outliers

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_outliers(emb, dim=DIM, k=KMEANS_K, iters=KMEANS_ITERS, top_n=5)


def _sql_embedding_outliers(top_n: int = 5) -> str:
    ctes, _ = _kmeans_ctes()
    return f"""{ctes}
SELECT cell, CAST(rn AS INTEGER) AS rnk, vec_id, d2 FROM (
  SELECT *, row_number() OVER (PARTITION BY cell ORDER BY d2 DESC, vec_id) AS rn
  FROM af
) WHERE rn <= {top_n}
"""


def _sql_ivf_kmeans(n_probe: int = 2, k: int = 10) -> str:
    """IVF probe over the trained (kmeans) centroids: queries rank
    cells by the same squared-L2 fold, candidates come from the probed
    cells' final assignment, ranked by exact L2."""
    ctes, cents = _kmeans_ctes()
    qfold = (
        "list_reduce(list_transform(q.qv, (x, i) -> (x - c.centroid[i])"
        " * (x - c.centroid[i])), (a, u) -> a + u)"
    )
    dist = (
        "sqrt(list_reduce(list_transform(e.v, (x, i) -> (x - qc.qv[i])"
        " * (x - qc.qv[i])), (a, u) -> a + u))"
    )
    return f"""{ctes},
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < {N_QUERIES}
), qc AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell, {qfold} AS d2,
           row_number() OVER (PARTITION BY q.query_id ORDER BY {qfold}, c.cell) AS rn
    FROM q CROSS JOIN {cents} c
  ) WHERE rn <= {n_probe}
), cand AS (
  SELECT qc.query_id, a.vec_id AS neighbor_id, {dist} AS dist
  FROM af a JOIN e USING (vec_id) JOIN qc ON qc.cell = a.cell
)
SELECT query_id, neighbor_id, dist, CAST(rn AS INTEGER) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM cand
) WHERE rn <= {k}
"""


IVFPQ_PROBE = 2


def q_ivf_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pq import ivf_pq_knn

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_knn(
        emb,
        _emb_queries(spark, sf_dir),
        dim=DIM,
        m=PQ_M,
        k=10,
        n_probe=IVFPQ_PROBE,
        n_cells=KMEANS_K,
        iters=KMEANS_ITERS,
    )


def _ivf_pq_ctes() -> str:
    """Shared WITH-body for the IVF-PQ oracles: unrolled-Lloyd coarse
    cells, residual vectors, sampled residual codebook (codes carry the
    anchor vec_id = position in the id-ordered codebook, ids dense from
    0 — same equivalence as _sql_pq_adc), per-(query, probed-cell) LUTs
    over the query residual, ADC sums in subspace order."""
    d = DIM // PQ_M
    sub_d2 = (
        "list_reduce(list_transform({v}[{s}*%d+1 : {s}*%d+%d], "
        "(x, i) -> (x - {cs}[i]) * (x - {cs}[i])), (a, u) -> a + u)" % (d, d, d)
    )
    enc_d2 = sub_d2.format(v="r.rv", s="c.s", cs="c.cs")
    q_d2 = sub_d2.format(v="qr.qrv", s="c.s", cs="c.cs")
    ctes, cents = _kmeans_ctes()
    qfold = (
        "list_reduce(list_transform(q.qv, (x, i) -> (x - c.centroid[i])"
        " * (x - c.centroid[i])), (a, u) -> a + u)"
    )
    return f"""{ctes},
r AS (
  SELECT a.vec_id, a.cell,
         list_transform(e.v, (x, i) -> x - c.centroid[i]) AS rv
  FROM af a JOIN e USING (vec_id) JOIN {cents} c ON c.cell = a.cell
), anch AS (
  SELECT vec_id AS code_id, rv FROM r ORDER BY vec_id LIMIT {PQ_ANCHORS}
), subs AS (
  SELECT unnest(range(0, {PQ_M})) AS s
), cellsub AS (
  SELECT code_id, s, rv[s*{d}+1 : s*{d}+{d}] AS cs FROM anch CROSS JOIN subs
), enc AS (
  SELECT r.vec_id, c.s, c.code_id, {enc_d2} AS d2
  FROM r CROSS JOIN cellsub c
), codes AS (
  SELECT vec_id, s, code_id AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code_id) AS rn
    FROM enc
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < {N_QUERIES}
), qc AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell, {qfold} AS d2,
           row_number() OVER (PARTITION BY q.query_id ORDER BY {qfold}, c.cell) AS rn
    FROM q CROSS JOIN {cents} c
  ) WHERE rn <= {IVFPQ_PROBE}
), qr AS (
  SELECT qc.query_id, qc.cell,
         list_transform(qc.qv, (x, i) -> x - c.centroid[i]) AS qrv
  FROM qc JOIN {cents} c USING (cell)
), qlut AS (
  SELECT qr.query_id, qr.cell, c.s, c.code_id, {q_d2} AS d2
  FROM qr CROSS JOIN cellsub c
), adc AS (
  SELECT l.query_id, cd.vec_id AS neighbor_id,
    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(l.d2 ORDER BY l.s)),
                (a, u) -> a + u) AS adc_d2
  FROM (SELECT c2.*, a.cell FROM codes c2 JOIN af a USING (vec_id)) cd
  JOIN qlut l ON l.cell = cd.cell AND l.s = cd.s AND l.code_id = cd.code
  GROUP BY 1, 2
)"""


def _sql_ivf_pq(k: int = 10) -> str:
    return f"""
{_ivf_pq_ctes()}
SELECT query_id, CAST(rn AS INTEGER) AS rnk, neighbor_id, adc_d2 FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rn
  FROM adc
) WHERE rn <= {k}
"""


IVFPQ_REFINE_EXPAND = 10


def _sql_ivf_pq_refine(k: int = 10) -> str:
    """Residual-ADC shortlist of expand*k (within the probed cells),
    exact-L2 re-rank — mirror of pq.ivf_pq_refine_knn."""
    dist = sql_l2("e.v", "q.qv")
    return f"""
{_ivf_pq_ctes()}, shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {IVFPQ_REFINE_EXPAND * k}
), resc AS (
  SELECT s.query_id, s.neighbor_id, {dist} AS dist
  FROM shortlist s
  JOIN e ON e.vec_id = s.neighbor_id
  JOIN q ON q.query_id = s.query_id
)
SELECT query_id, neighbor_id, dist, CAST(rn AS INTEGER) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM resc
) WHERE rn <= {k}
"""


def q_ivf_pq_refine_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pq import ivf_pq_refine_knn

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_refine_knn(
        emb,
        _emb_queries(spark, sf_dir),
        dim=DIM,
        m=PQ_M,
        k=10,
        n_probe=IVFPQ_PROBE,
        n_cells=KMEANS_K,
        iters=KMEANS_ITERS,
        expand=IVFPQ_REFINE_EXPAND,
    )


def q_hnsw_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index observability rollup over a freshly built index — rows-only
    check (index internals are not SQL-derivable from the base tables)."""
    from .index.build import HnswParams, hnsw_build, hnsw_stats

    emb = load_table(spark, sf_dir, "embeddings")
    idx = hnsw_build(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
        HnswParams(dim=DIM, metric="cosine"),
        num_partitions=4,
    )
    return hnsw_stats(idx)


def q_approx_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters — approximate (partition-order
    dependent estimates), so rows-only check; error bound proven in
    tests against the exact vocabulary."""
    from .operators.textpipe import approx_top_tokens

    return approx_top_tokens(load_table(spark, sf_dir, "documents"), k=10, capacity=16)


INCR_SPLIT = 250  # doc_id < INCR_SPLIT = existing corpus; >= = new batch


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import dedup_incremental

    docs = load_table(spark, sf_dir, "documents")
    return dedup_incremental(
        docs.filter(F.col("doc_id") >= INCR_SPLIT),
        docs.filter(F.col("doc_id") < INCR_SPLIT),
    )


def _sql_dedup_incremental() -> str:
    sig_terms = ",\n         ".join(_minhash_sql_terms())
    rpb = D.NUM_MINHASH // D.MINHASH_BANDS
    band_selects = []
    for b in range(D.MINHASH_BANDS):
        parts = " || '_' || ".join(
            f"CAST(mh{i} AS VARCHAR)" for i in range(b * rpb, (b + 1) * rpb)
        )
        band_selects.append(
            f"SELECT doc_id, '{b}' || '_' || {parts} AS bucket FROM sig"
        )
    return f"""
WITH {_hashed_shingle_cte()},
sig AS (SELECT doc_id, {sig_terms} FROM hashed GROUP BY doc_id),
buckets AS ({' UNION ALL '.join(band_selects)}),
flagged AS (
  SELECT DISTINCT n.doc_id
  FROM (SELECT * FROM buckets WHERE doc_id >= {INCR_SPLIT}) n
  JOIN (SELECT DISTINCT bucket FROM buckets WHERE doc_id < {INCR_SPLIT}) c
    USING (bucket)
), fpn AS (
  SELECT doc_id, lang, source, {_FP_SQL} AS fp FROM documents
  WHERE doc_id >= {INCR_SPLIT}
), fpc AS (
  SELECT DISTINCT {_FP_SQL} AS fp FROM documents WHERE doc_id < {INCR_SPLIT}
)
SELECT doc_id, lang, source FROM fpn
WHERE fp NOT IN (SELECT fp FROM fpc)
  AND doc_id NOT IN (SELECT doc_id FROM flagged)
"""


MIX_TARGETS = {"src0": 40, "src1": 30, "src2": 20, "src3": 10}


def q_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import mix_corpus

    return mix_corpus(load_table(spark, sf_dir, "documents"), MIX_TARGETS)


def _sql_mix_corpus() -> str:
    f_case = (
        "CASE "
        + " ".join(
            f"WHEN source = '{s}' THEN {p}" for s, p in sorted(MIX_TARGETS.items())
        )
        + " ELSE 0 END"
    )
    return f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n, {f_case} AS f
  FROM documents GROUP BY source
), eligible AS (
  SELECT * FROM counts WHERE f > 0
), binding AS (
  SELECT n AS nb, f AS fb FROM (
    SELECT *, row_number() OVER (
      ORDER BY CAST(n AS DOUBLE) / CAST(f AS DOUBLE), source) AS rn
    FROM eligible
  ) WHERE rn = 1
), rates AS (
  SELECT source,
    CAST(LEAST(1000000, floor(
      (CAST(f AS DOUBLE) * CAST(nb AS DOUBLE) * 1000000.0)
        / (CAST(fb AS DOUBLE) * CAST(n AS DOUBLE)))) AS BIGINT) AS ppm
  FROM eligible CROSS JOIN binding
)
SELECT doc_id, source, lang
FROM documents JOIN rates USING (source)
WHERE ((doc_id + 424243) * 2654435761) % 2147483647 % 1000000 < ppm
"""


def q_binary_sign_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ann import binary_sign_knn

    emb = load_table(spark, sf_dir, "embeddings")
    return binary_sign_knn(emb, _emb_queries(spark, sf_dir), dim=DIM, k=10)


_BINARY_CTES = f"""e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), codes AS (
  SELECT vec_id, list_transform(range(0, {DIM // 32}), b ->
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(v[b*32+1 : b*32+32], (x, j) -> CASE WHEN x >= CAST(0 AS DOUBLE)
        THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE CAST(0 AS BIGINT) END)),
      (a, u) -> a + u)) AS bc
  FROM e
), q AS (
  SELECT vec_id AS query_id, bc AS qc FROM codes WHERE vec_id < {N_QUERIES}
), pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    CAST(list_reduce(list_prepend(CAST(0 AS INTEGER),
      list_transform(range(0, {DIM // 32}), b ->
        CAST(bit_count(xor(c.bc[b+1], q.qc[b+1])) AS INTEGER))),
      (a, u) -> a + u) AS INTEGER) AS hamming
  FROM codes c CROSS JOIN q
)"""

SQL_BINARY_SIGN_ANN = f"""
WITH {_BINARY_CTES}
SELECT query_id, neighbor_id, hamming, CAST(rn AS INTEGER) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rn
  FROM pairs
) WHERE rn <= 10
"""

BINARY_REFINE_EXPAND = 10


def _sql_binary_refine() -> str:
    """Hamming shortlist of expand*k, exact-cosine re-rank — mirror of
    ann.binary_refine_knn."""
    dist = _cos_sql("e.v", "qv.v")
    return f"""
WITH {_BINARY_CTES}, shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rn
    FROM pairs
  ) WHERE rn <= {BINARY_REFINE_EXPAND * 10}
), resc AS (
  SELECT s.query_id, s.neighbor_id, {dist} AS dist
  FROM shortlist s
  JOIN e ON e.vec_id = s.neighbor_id
  JOIN e qv ON qv.vec_id = s.query_id
)
SELECT query_id, neighbor_id, dist, CAST(rn AS INTEGER) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
  FROM resc
) WHERE rn <= 10
"""


def q_binary_refine_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ann import binary_refine_knn

    emb = load_table(spark, sf_dir, "embeddings")
    return binary_refine_knn(
        emb, _emb_queries(spark, sf_dir), dim=DIM, k=10, expand=BINARY_REFINE_EXPAND
    )


def q_ivf_kmeans_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ivf import ivf_kmeans_knn

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_kmeans_knn(
        emb,
        _emb_queries(spark, sf_dir),
        dim=DIM,
        k=10,
        n_probe=2,
        n_cells=KMEANS_K,
        iters=KMEANS_ITERS,
    )


def q_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order spend of high-balance BUILDING customers, with the orders
    fact side Bloom-pruned by the tiny customer key set before the join
    (plans/bloom.py). Exact: the bitmap admits every true match and the
    broadcast join drops false positives — the oracle is the plain join.
    At 100 TB the bitmap kills non-matching fact rows at the scan, so the
    shuffle/join only ever sees the matching slice."""
    from .plans.bloom import bloom_pruned_join

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000))
        .select("c_custkey", "c_name")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    joined = bloom_pruned_join(orders, cust, fact_key="o_custkey", dim_key="c_custkey")
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


SQL_BLOOM_PRUNED_REVENUE = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
       COUNT(*) AS order_count
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
GROUP BY c_custkey, c_name
"""


def q_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import cms_token_estimates

    return cms_token_estimates(load_table(spark, sf_dir, "documents"))


def _sql_cms_token_counts() -> str:
    from .operators.textpipe import CMS_DEPTH, CMS_MOD, CMS_WIDTH

    def bucket(h: str) -> str:
        return f"((({h}) * (2*r + 1) + (7919*r + 1)) % {CMS_MOD}) % {CMS_WIDTH}"

    return f"""
WITH tok AS (
  SELECT unnest({SQL_TOKS_LOWER}) AS token FROM documents
), th AS (
  SELECT {sql_poly_hash('token')} AS h FROM tok
), rows_ AS (
  SELECT unnest(range(0, {CMS_DEPTH})) AS r
), sketch AS (
  SELECT CAST(r AS INTEGER) AS row, {bucket('h')} AS bucket, COUNT(*) AS cnt
  FROM th CROSS JOIN rows_
  GROUP BY 1, 2
), ptok AS (
  SELECT DISTINCT unnest({SQL_TOKS_LOWER}) AS token FROM documents WHERE doc_id < 20
), pb AS (
  SELECT token, CAST(r AS INTEGER) AS row, {bucket(sql_poly_hash('token'))} AS bucket
  FROM ptok CROSS JOIN rows_
)
SELECT pb.token, MIN(s.cnt) AS est_count
FROM pb JOIN sketch s ON s.row = pb.row AND s.bucket = pb.bucket
GROUP BY pb.token
"""


def q_doc_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textpipe import doc_sentences

    return doc_sentences(load_table(spark, sf_dir, "documents"))


SQL_DOC_SENTENCES = r"""
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '[.!?]+\s+'),
                                    x -> trim(x)), x -> x != '') AS sents
  FROM documents
)
SELECT doc_id,
       CAST(generate_subscripts(sents, 1) - 1 AS INTEGER) AS sent_idx,
       unnest(sents) AS sentence,
       CAST(len(list_filter(regexp_split_to_array(unnest(sents), '\s+'),
                            x -> x != '')) AS INTEGER) AS n_tokens
FROM s
"""


def q_user_activity_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-rate anomaly days: a user's daily event count
    z-scored against their own history, mean/std from EXACT integer
    moment sums (the doc_len_outliers shape, grouped) so the only float
    ops are a fixed divide/sqrt/subtract expression. The integer guard
    ``s2*nd > s1*s1`` excludes zero-variance users without ever touching
    float equality. Both aggregations shuffle on user_id — the second is
    a near-free re-use of the first's partitioning."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    mom = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("nd").cast("double")
    var = F.col("s2").cast("double") / F.col("nd").cast("double") - mean * mean
    z = (F.col("n_events").cast("double") - mean) / F.sqrt(var)
    return (
        daily.join(mom, "user_id")
        .filter(
            (F.col("nd") >= 3)
            & (F.col("s2") * F.col("nd") > F.col("s1") * F.col("s1"))
        )
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2.0)
        .select("user_id", "day", "n_events", "z")
    )


SQL_USER_ACTIVITY_ANOMALIES = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), mom AS (
  SELECT user_id, COUNT(*) AS nd,
         CAST(SUM(n_events) AS BIGINT) AS s1,
         CAST(SUM(n_events * n_events) AS BIGINT) AS s2
  FROM daily GROUP BY 1
), scored AS (
  SELECT d.user_id, d.day, d.n_events,
    (CAST(d.n_events AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))
      / sqrt(CAST(s2 AS DOUBLE) / CAST(nd AS DOUBLE)
             - (CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))) AS z
  FROM daily d JOIN mom USING (user_id)
  WHERE nd >= 3 AND s2 * nd > s1 * s1
)
SELECT user_id, day, n_events, z FROM scored WHERE abs(z) > 2.0
"""


def q_boilerplate_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate: sentences (lowercased) shared by >= 3
    distinct documents — the sentence-level dedup signal (license
    headers, navigation chrome, templated intros) that doc-level
    near-dup misses. Composes doc_sentences; one count shuffle keyed by
    the sentence text (at 100 TB: key by fingerprint hash instead —
    same plan shape, 8-byte keys)."""
    from .operators.textpipe import doc_sentences

    sents = doc_sentences(load_table(spark, sf_dir, "documents"))
    return (
        sents.select("doc_id", F.lower(F.col("sentence")).alias("sent"))
        .groupBy("sent")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 3)
    )


SQL_BOILERPLATE_SENTENCES = r"""
WITH s AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '[.!?]+\s+'),
                                    x -> trim(x)), x -> x != '') AS sents
  FROM documents
), flat AS (
  SELECT doc_id, lower(unnest(sents)) AS sent FROM s
)
SELECT sent, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM flat GROUP BY sent HAVING COUNT(DISTINCT doc_id) >= 3
"""


def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering key over events(user_id, epoch-day):
    the integer bit-interleave that plans/layout.py::zorder_write sorts
    files by, so range predicates on EITHER column prune parquet
    row-groups. Exposed as a query so the bit math itself is
    oracle-checked; the file-envelope property is asserted in
    tests/test_layout.py."""
    from .plans.layout import zorder_value

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("epoch_day"),
    )
    return ev.select(
        "event_id",
        "user_id",
        "epoch_day",
        zorder_value(F.col("user_id"), F.col("epoch_day")).alias("zval"),
    )


def _sql_zorder_events() -> str:
    from .plans.layout import zorder_sql

    z = zorder_sql("user_id", "epoch_day")
    return f"""
SELECT event_id, user_id, epoch_day, {z} AS zval FROM (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS epoch_day
  FROM events)
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    # relational surface
    "pricing_summary": (R.pricing_summary, SQL_PRICING_SUMMARY),
    "top_customers": (R.top_customers_by_revenue, SQL_TOP_CUSTOMERS),
    "region_revenue": (R.region_revenue, SQL_REGION_REVENUE),
    "customer_order_rank": (R.customer_order_rank, SQL_CUSTOMER_ORDER_RANK),
    "pricing_rollup": (R.pricing_rollup, SQL_PRICING_ROLLUP),
    "brand_supplier_revenue": (R.brand_supplier_revenue, SQL_BRAND_SUPPLIER_REVENUE),
    "view_days_no_purchase": (R.view_days_without_purchase, SQL_VIEW_DAYS_NO_PURCHASE),
    "events_asof": (R.events_asof_purchase, SQL_EVENTS_ASOF),
    "events_tumbling": (R.events_tumbling, SQL_EVENTS_TUMBLING),
    "funnel_steps": (R.funnel_steps, SQL_FUNNEL_STEPS),
    "signup_cohorts": (R.signup_cohorts, SQL_SIGNUP_COHORTS),
    "events_sessionize": (R.events_sessionize, SQL_EVENTS_SESSIONIZE),
    "events_props_json": (R.events_props_json, SQL_EVENTS_PROPS_JSON),
    # vector surface (reference parity)
    "knn_exact_l2": (q_knn_exact_l2, _knn_sql("l2", 10)),
    "knn_exact_l2_fast": (q_knn_exact_l2_fast, _knn_sql("l2", 10)),
    "knn_exact_cosine": (q_knn_exact_cosine, _knn_sql("cosine", 10)),
    "knn_tombstone": (q_knn_tombstone, _knn_sql("l2", 10, "WHERE vec_id % 7 != 0")),
    "knn_filtered": (q_knn_filtered, _knn_sql("cosine", 10, "WHERE label < 5")),
    "knn_label_lookup": (q_knn_label_lookup, SQL_KNN_LABEL),
    "pair_distances": (q_pair_distances, SQL_PAIR_DISTANCES),
    "vector_norms": (q_vector_norms, SQL_VECTOR_NORMS),
    "lsh_ann_cosine": (q_lsh_ann_cosine, SQL_LSH_ANN),
    "ivf_ann_cosine": (q_ivf_ann_cosine, SQL_IVF_ANN),
    "knn_hnsw": (q_knn_hnsw, None),  # approximate: rows-only check
    # training-data pipeline surface
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, _sql_dedup_ngram_jaccard()),
    "dedup_minhash": (q_dedup_minhash, _sql_dedup_minhash()),
    "dedup_simhash": (q_dedup_simhash, _sql_dedup_simhash()),
    "dup_spans": (q_dup_spans, _sql_dup_spans()),
    "lm_familiarity": (q_lm_familiarity, _sql_lm_familiarity()),
    "matryoshka_ann": (q_matryoshka_ann, _sql_matryoshka()),
    "embedding_neardup": (q_embedding_neardup, SQL_EMBEDDING_NEARDUP),
    "text_stats": (q_text_stats, SQL_TEXT_STATS),
    "text_langid": (q_text_langid, _sql_langid()),
    "doc_quality": (q_doc_quality, _sql_doc_quality()),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL),
    # corpus pipeline: clusters / vocab / tf-idf / sampling / outliers /
    # SQ8 / range join
    "dedup_clusters": (q_dedup_clusters, _sql_dedup_clusters()),
    "fuzzy_dedup": (q_fuzzy_dedup, _sql_fuzzy_dedup()),
    "doc_hash_vectors": (q_doc_hash_vectors, _sql_doc_hash_vectors()),
    "token_budget_sample": (q_token_budget_sample, _sql_token_budget_sample()),
    "semantic_neardup": (q_semantic_neardup, _sql_semantic_neardup()),
    "vocab_top_tokens": (q_vocab_top_tokens, SQL_VOCAB_TOP),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP),
    "sample_stratified": (q_sample_stratified, _sql_sample_stratified()),
    "doc_len_outliers": (q_doc_len_outliers, SQL_DOC_LEN_OUTLIERS),
    "sq8_ann": (q_sq8_ann, SQL_SQ8_ANN),
    "ivf_sq8_ann": (
        q_ivf_sq8_ann,
        SQL_IVF_SQ8_ANN.format(
            cosva=_cos_sql("e.v", "c.centroid"), cosqa=_cos_sql("q.qv", "c.centroid")
        ),
    ),
    "purchase_view_window": (R.purchase_view_window, SQL_PURCHASE_VIEW_WINDOW),
    "curation_pipeline": (q_curation_pipeline, _sql_curation_pipeline()),
    "pretrain_sequences": (q_pretrain_sequences, _sql_pretrain_sequences()),
    "quantity_order_stats": (R.quantity_order_stats, SQL_QUANTITY_ORDER_STATS),
    "customer_running_total": (R.customer_running_total, SQL_CUSTOMER_RUNNING_TOTAL),
    "nation_trade_volume": (R.nation_trade_volume, SQL_NATION_TRADE_VOLUME),
    "shipping_priority": (R.shipping_priority, SQL_SHIPPING_PRIORITY),
    "order_priority_check": (R.order_priority_check, SQL_ORDER_PRIORITY_CHECK),
    "customer_order_distribution": (
        R.customer_order_distribution,
        SQL_CUSTOMER_ORDER_DISTRIBUTION,
    ),
    "large_orders": (R.large_orders, SQL_LARGE_ORDERS),
    "priority_linestatus_counts": (R.priority_linestatus_counts, SQL_PRIORITY_LINESTATUS),
    "brand_supplier_distinct": (R.brand_supplier_distinct, SQL_BRAND_SUPPLIER_DISTINCT),
    "small_quantity_revenue": (R.small_quantity_revenue, SQL_SMALL_QUANTITY_REVENUE),
    "wealthy_inactive_customers": (R.wealthy_inactive_customers, SQL_WEALTHY_INACTIVE),
    "events_sliding": (R.events_sliding, SQL_EVENTS_SLIDING),
    "doc_repetition": (q_doc_repetition, SQL_DOC_REPETITION),
    "customer_order_gaps": (R.customer_order_gaps, SQL_CUSTOMER_ORDER_GAPS),
    "user_event_pivot": (R.user_event_pivot, SQL_USER_EVENT_PIVOT),
    "user_day_activity": (R.user_day_activity, SQL_USER_DAY_ACTIVITY),
    "viewing_purchasers": (R.viewing_purchasers, SQL_VIEWING_PURCHASERS),
    "viewers_never_purchasing": (R.viewers_never_purchasing, SQL_VIEWERS_NEVER_PURCHASING),
    "event_sketch_stats": (R.event_sketch_stats, None),  # sketches: rows-only check; error bounded in tests
    "dedup_keep_best": (q_dedup_keep_best, _sql_dedup_keep_best()),
    "corpus_report": (q_corpus_report, _sql_corpus_report()),
    "pack_chunks": (q_pack_chunks, SQL_PACK_CHUNKS),
    "pricing_cube": (R.pricing_cube, SQL_PRICING_CUBE),
    "promo_revenue_ratio": (R.promo_revenue_ratio, SQL_PROMO_REVENUE_RATIO),
    "local_supplier_volume": (R.local_supplier_volume, SQL_LOCAL_SUPPLIER_VOLUME),
    "forecast_revenue_change": (R.forecast_revenue_change, SQL_FORECAST_REVENUE_CHANGE),
    "returned_item_customers": (R.returned_item_customers, SQL_RETURNED_ITEM_CUSTOMERS),
    "nation_market_share": (R.nation_market_share, SQL_NATION_MARKET_SHARE),
    "top_revenue_supplier": (R.top_revenue_supplier, SQL_TOP_REVENUE_SUPPLIER),
    "customer_trailing_revenue": (R.customer_trailing_revenue, SQL_CUSTOMER_TRAILING_REVENUE),
    "user_top_event": (R.user_top_event, SQL_USER_TOP_EVENT),
    "normalize_embeddings": (q_normalize_embeddings, SQL_NORMALIZE_EMBEDDINGS),
    "table_profile": (q_table_profile, SQL_TABLE_PROFILE),
    "dataset_split": (q_dataset_split, SQL_DATASET_SPLIT),
    "training_shuffle": (q_training_shuffle, SQL_TRAINING_SHUFFLE),
    "redact_pii": (q_redact_pii, _sql_redact_pii()),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "special_revenue": (q_special_revenue, SQL_SPECIAL_REVENUE),
    "length_token_correlation": (q_length_token_correlation, SQL_LENGTH_TOKEN_CORRELATION),
    "doc_length_histogram": (q_doc_length_histogram, SQL_DOC_LENGTH_HISTOGRAM),
    "events_time_breakdown": (R.events_time_breakdown, SQL_EVENTS_TIME_BREAKDOWN),
    "doc_slugs": (q_doc_slugs, SQL_DOC_SLUGS),
    "lang_exemplars": (q_lang_exemplars, SQL_LANG_EXEMPLARS),
    "waiting_supplier_orders": (R.waiting_supplier_orders, SQL_WAITING_SUPPLIER_ORDERS),
    "user_daily_timeline": (R.user_daily_timeline, SQL_USER_DAILY_TIMELINE),
    "chunk_documents": (q_chunk_documents, SQL_CHUNK_DOCUMENTS),
    "embedding_dim_stats": (q_embedding_dim_stats, SQL_EMBEDDING_DIM_STATS),
    "multimodal_frames": (q_multimodal_frames, SQL_MULTIMODAL_FRAMES),
    "min_cost_supplier": (R.min_cost_supplier, SQL_MIN_COST_SUPPLIER),
    "nation_profit": (R.nation_profit, SQL_NATION_PROFIT),
    "important_parts": (R.important_parts, SQL_IMPORTANT_PARTS),
    "dominant_suppliers": (R.dominant_suppliers, SQL_DOMINANT_SUPPLIERS),
    # retrieval surface: radius search, kNN graph, keyword + hybrid + MMR
    "range_search": (q_range_search, SQL_RANGE_SEARCH),
    "knn_graph": (q_knn_graph, SQL_KNN_GRAPH),
    "knn_pagerank": (q_knn_pagerank, _sql_knn_pagerank()),
    "knn_triangles": (q_knn_triangles, SQL_KNN_TRIANGLES),
    "knn_label_vote": (q_knn_label_vote, SQL_KNN_LABEL_VOTE),
    "customer_value_percentile": (q_customer_value_percentile, SQL_CUSTOMER_VALUE_PERCENTILE),
    "doc_token_counts": (q_doc_token_counts, _sql_doc_token_counts()),
    "user_event_sequences": (q_user_event_sequences, SQL_USER_EVENT_SEQUENCES),
    "bm25_doc_rank": (
        q_bm25_doc_rank,
        _sql_bm25_rank(BM25_TERMS, BM25_K1, BM25_B, 20),
    ),
    "hybrid_search_rrf": (q_hybrid_search_rrf, _sql_hybrid_rrf()),
    "mmr_diversify": (q_mmr_diversify, _sql_mmr()),
    "pq_adc_ann": (q_pq_adc_ann, _sql_pq_adc()),
    "pq_refine_ann": (q_pq_refine_ann, _sql_pq_refine()),
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "kmeans_clusters": (q_kmeans_clusters, _sql_kmeans()),
    "embedding_outliers": (q_embedding_outliers, _sql_embedding_outliers()),
    "maxsim_search": (q_maxsim_search, _sql_maxsim()),
    "ivf_kmeans_ann": (q_ivf_kmeans_ann, _sql_ivf_kmeans()),
    "ivf_pq_ann": (q_ivf_pq_ann, _sql_ivf_pq()),
    "ivf_pq_refine_ann": (q_ivf_pq_refine_ann, _sql_ivf_pq_refine()),
    "binary_sign_ann": (q_binary_sign_ann, SQL_BINARY_SIGN_ANN),
    "binary_refine_ann": (q_binary_refine_ann, _sql_binary_refine()),
    "mix_corpus": (q_mix_corpus, _sql_mix_corpus()),
    "dedup_incremental": (q_dedup_incremental, _sql_dedup_incremental()),
    "bloom_pruned_revenue": (q_bloom_pruned_revenue, SQL_BLOOM_PRUNED_REVENUE),
    "zorder_events": (q_zorder_events, _sql_zorder_events()),
    "doc_sentences": (q_doc_sentences, SQL_DOC_SENTENCES),
    "cms_token_counts": (q_cms_token_counts, _sql_cms_token_counts()),
    "boilerplate_sentences": (q_boilerplate_sentences, SQL_BOILERPLATE_SENTENCES),
    "user_activity_anomalies": (q_user_activity_anomalies, SQL_USER_ACTIVITY_ANOMALIES),
    "hnsw_stats": (q_hnsw_stats, None),  # index internals: rows-only check
    "approx_top_tokens": (q_approx_top_tokens, None),  # sketch: rows-only; bound in tests
}


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
