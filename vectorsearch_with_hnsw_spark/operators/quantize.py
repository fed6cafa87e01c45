"""Scalar-quantized (SQ8) approximate kNN.

The third ANN family next to LSH (operators/ann.py) and IVF
(operators/ivf.py): compress each float32 dimension to an 8-bit code
against per-dimension global [min, max] ranges, then run top-k on
integer distances. At 100 TB this is the memory-bound win — 4x smaller
scan than float32, integer SIMD distance kernels — and the standard
companion to IVF (IVF+SQ8) in every production vector store. The
reference stores raw float32 only (hsnw_trial.py:103,201); this is the
scale path it lacks.

Everything is exact integer arithmetic after quantization, so the DuckDB
oracle matches bit-for-bit (the quantization itself uses floor(), whose
semantics are identical in every engine — round() half-way ties are not).

Plan shape: the range stats are one posexplode + groupBy(pos) with
map-side combine (dim × P partial rows shuffled, a few KB), collapsed to
a single broadcastable row; encode is map-only; the probe is the same
broadcast-queries × index scan as exact kNN but over 8-bit codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LEVELS = 256


def dim_ranges(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Single-row frame (qmin array<double>, qmax array<double>): global
    per-dimension min/max, ordered by dimension."""
    stats = (
        emb.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
    )
    return stats.agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "mn"))
        ).alias("_mn_s"),
        F.array_sort(
            F.collect_list(F.struct("pos", "mx"))
        ).alias("_mx_s"),
    ).select(
        F.transform("_mn_s", lambda s: s["mn"]).alias("qmin"),
        F.transform("_mx_s", lambda s: s["mx"]).alias("qmax"),
    )


def _quantize_expr(vec_col, qmin, qmax):
    """floor((x - mn) * 256 / (mx - mn)) clamped to [0, 255]; degenerate
    dims (mx == mn) encode as 0."""
    def enc(x, i):
        mn = F.element_at(qmin, i + 1)
        mx = F.element_at(qmax, i + 1)
        code = F.floor((x.cast("double") - mn) * F.lit(float(LEVELS)) / (mx - mn))
        return (
            F.when(mx == mn, F.lit(0))
            .otherwise(F.least(F.lit(LEVELS - 1), F.greatest(F.lit(0), code)))
            .cast("long")
        )

    # transform's lambda index is 0-based; element_at is 1-based
    return F.transform(vec_col, enc)


def quantize(
    emb: DataFrame,
    ranges: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, code array<long>[, extras]) — map-only encode against
    broadcast ranges."""
    return emb.crossJoin(F.broadcast(ranges)).select(
        F.col(id_col),
        _quantize_expr(F.col(vec_col), F.col("qmin"), F.col("qmax")).alias("code"),
        *[F.col(c) for c in (extra_cols or [])],
    )


def _sq8_score(
    base: DataFrame,
    ranges: DataFrame,
    queries: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Integer-L2 top-k over an existing (neighbor_id, bcode) relation —
    the probe half of SQ8, shared verbatim by the one-shot ``sq8_knn``
    and the persisted ``Sq8Index.search`` so a loaded index answers
    bit-identically to the inline operator. Queries are quantized
    against the SAME ranges as the codes (the symmetric-distance SQ
    scheme); the scan is map-only against the broadcast query codes and
    the only shuffle is the final per-query top-k window."""
    qcode = quantize(queries, ranges, query_id_col, query_vec_col).select(
        F.col(query_id_col).alias("query_id"), F.col("code").alias("qcode")
    )
    dist2 = F.aggregate(
        F.zip_with(F.col("qcode"), F.col("bcode"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = base.crossJoin(F.broadcast(qcode)).select(
        "query_id", "neighbor_id", dist2.alias("qdist2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdist2").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "qdist2")
    )


def sq8_knn(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Top-k by squared L2 over SQ8 codes (integer-exact). Ties broken by
    neighbor id for a total order. Queries are quantized against the SAME
    ranges as the index — the standard symmetric-distance SQ scheme."""
    ranges = dim_ranges(emb, vec_col)
    base = quantize(emb, ranges, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("code").alias("bcode")
    )
    return _sq8_score(base, ranges, queries, k, query_id_col, query_vec_col)


def sq8_refine_knn(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    expand: int = 10,
    metric: str = "l2",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ8 full-scan shortlist + exact re-rank — the deployed form of
    the plain SQ8 scan, completing the refine family (pq_refine,
    binary_refine, ivf_sq8_refine, ivf_pq_refine): the integer-exact
    quantized ranking picks ``expand * k`` candidates reading 4x fewer
    bytes, then only those rows are rescored with the exact fold in the
    caller's metric. Before round 11, ``similarity_search(method=
    "sq8")`` was the one sketch family served raw (its mild 8-bit loss
    made that defensible — 0.88 recall@10 — but inconsistent with the
    never-serve-a-shortlist principle); the refine lifts it to ~1.0 at
    a per-query-constant full-precision read cost. Deterministic
    ((qdist2, neighbor_id)) shortlist selection keeps the hybrid
    DuckDB-oracle-checkable.

    ``metric`` picks the RE-RANK distance (cosine or l2); the coarse
    SQ8 shortlist ranks by integer L2 EITHER WAY — it is the pruning
    stage, and the kept rows are rescored exactly in the caller's
    metric (same contract as ivf_sq8_refine_knn). On an UNNORMALIZED
    corpus an L2 shortlist can exclude true cosine top-k (a far-but-
    aligned vector); normalize the vectors first
    (functions.vector.l2_normalize) when cosine fidelity matters, or
    raise ``expand``. Measured on the testdata (unnormalized):
    cosine-metric recall@10 >= 0.9 at the expand=10 default (pinned by
    tests/test_retrieval.py)."""
    from ..functions.vector import cosine_distance, l2_distance, to_vec
    from .knn import topk_per_group

    if metric not in ("cosine", "l2"):
        raise ValueError(f"unsupported metric {metric!r}; expected cosine or l2")
    dist_fn = cosine_distance if metric == "cosine" else l2_distance

    shortlist = sq8_knn(
        emb, queries, k=expand * k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    base = emb.select(
        F.col(id_col).alias("neighbor_id"), to_vec(vec_col).alias("_v")
    )
    q = F.broadcast(
        queries.select(F.col("query_id"), to_vec("query_vec").alias("_q"))
    )
    rescored = (
        shortlist.join(base, "neighbor_id")
        .join(q, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            dist_fn(F.col("_v"), F.col("_q")).alias("dist"),
        )
    )
    return topk_per_group(rescored, ["query_id"], ["dist", "neighbor_id"], k).select(
        "query_id", "neighbor_id", "dist", F.col("rnk").cast("int").alias("rnk")
    )


def ivf_sq8_knn(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_probe: int = 5,
) -> DataFrame:
    """IVF routing + SQ8 distances — the production vector-store shape
    (FAISS's IVF,SQ8): centroids prune the candidate set to ``n_probe``
    cells, then candidates rank by integer SQ8 L2 instead of float
    cosine. At 100 TB the scan reads 4x less (codes, not floats) over
    1/cells of the data; both prunings compose multiplicatively.

    Entirely deterministic integer/fixed-expression arithmetic after the
    centroid assignment, so the full hybrid is DuckDB-oracle-checkable.

    One-shot shape (round 15): the centroid aggregation is collected
    ONCE (bounded n_cells x dim artifact) and reused on both sides —
    the corpus assignment runs through the map-only
    :func:`~.ivf.assign_frozen_cosine` kernel (bit-identical to the
    crossJoin + cosine HOF + vec_id-window shape it replaces, with the
    embedding column passed through for the SQ8 encode), and the
    query-side probe selection joins a LOCAL recreation of the
    collected table instead of re-embedding the corpus-wide aggregation
    under the broadcast. Pre-r15, every action paid the centroid
    aggregation twice plus a corpus-wide window shuffle.
    """
    from pyspark.sql.window import Window as W

    from .ivf import _collect_cents, assign_frozen_cosine, label_centroids

    cells_np, C = _collect_cents(label_centroids(emb, dim))
    cents_local = emb.sparkSession.createDataFrame(
        [(int(c), [float(x) for x in row]) for c, row in zip(cells_np, C)],
        "cell int, centroid array<double>",
    )
    assigned = assign_frozen_cosine(emb.select("vec_id", "embedding"), cells_np, C)
    ranges = dim_ranges(emb)
    bcode = quantize(assigned, ranges, extra_cols=["cell"]).select(
        F.col("vec_id").alias("neighbor_id"), F.col("code").alias("bcode"), "cell"
    )

    from ..functions.vector import cosine_distance, to_vec

    qcells = queries.crossJoin(F.broadcast(cents_local)).select(
        "query_id",
        "query_vec",
        "cell",
        cosine_distance(to_vec("query_vec"), F.col("centroid")).alias("cdist"),
    )
    wq = W.partitionBy("query_id").orderBy("cdist", "cell")
    probes = (
        qcells.withColumn("crnk", F.row_number().over(wq))
        .filter(F.col("crnk") <= n_probe)
        .select("query_id", "query_vec", "cell")
    )
    qcode = quantize(
        probes, ranges, id_col="query_id", vec_col="query_vec", extra_cols=["cell"]
    ).select("query_id", F.col("code").alias("qcode"), "cell")

    dist2 = F.aggregate(
        F.zip_with(F.col("qcode"), F.col("bcode"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cand = bcode.join(F.broadcast(qcode), "cell").select(
        "query_id", "neighbor_id", dist2.alias("qdist2")
    )
    w = W.partitionBy("query_id").orderBy(F.col("qdist2").asc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "qdist2")
    )


def ivf_sq8_refine_knn(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_probe: int = 5,
    expand: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """IVF-SQ8 shortlist + exact cosine re-rank — how the quantized scan
    is actually deployed (same contract as binary_refine_knn /
    pq_refine_knn: the coarse pass reads 4x fewer bytes over
    n_probe/cells of the data; the full-precision reads are an
    ``expand * k`` per-query constant). Recall within the probed cells
    recovers the SQ8 ranking loss entirely — the residual miss is cell
    coverage, the n_probe knob. Shortlist selection is deterministic
    ((qdist2, neighbor_id) order), so the whole hybrid stays
    DuckDB-oracle-checkable. ``metric`` picks the RE-RANK distance
    (cosine or l2); the coarse SQ8 shortlist ranks by integer L2
    either way — it is the pruning stage, and the kept rows are
    rescored exactly in the caller's metric."""
    from ..functions.vector import cosine_distance, l2_distance, to_vec
    from .knn import topk_per_group

    if metric not in ("cosine", "l2"):
        raise ValueError(f"unsupported metric {metric!r}; expected cosine or l2")
    dist_fn = cosine_distance if metric == "cosine" else l2_distance

    shortlist = ivf_sq8_knn(emb, queries, dim=dim, k=expand * k, n_probe=n_probe).select(
        "query_id", "neighbor_id"
    )
    base = emb.select(F.col("vec_id").alias("neighbor_id"), to_vec("embedding").alias("_v"))
    q = F.broadcast(
        queries.select(F.col("query_id"), to_vec("query_vec").alias("_q"))
    )
    rescored = (
        shortlist.join(base, "neighbor_id")
        .join(q, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            dist_fn(F.col("_v"), F.col("_q")).alias("dist"),
        )
    )
    return topk_per_group(rescored, ["query_id"], ["dist", "neighbor_id"], k).select(
        "query_id", "neighbor_id", "dist", F.col("rnk").cast("int").alias("rnk")
    )


class Sq8Index:
    """Persisted SQ8 artifact: per-dimension [min, max] ranges + 8-bit
    codes as parquet tables — completing the save/load family next to
    HnswIndex, PqIndex, IvfIndex, and IvfPqIndex (all mirroring the
    reference's save/load contract, hsnw_trial.py:310-376). The ranges
    are the trained state (one broadcastable row); the codes table is
    the 4x-compressed corpus at rest. A loaded index probes without
    re-scanning the float corpus: queries only need the ranges row to
    quantize themselves, so search shares ``_sq8_score`` with the
    one-shot ``sq8_knn`` and answers BIT-IDENTICALLY to it at equal
    build input (pinned by tests/test_retrieval.py)."""

    def __init__(
        self,
        codes: DataFrame,
        ranges: DataFrame,
        dim: int,
        tombstones: DataFrame | None = None,
    ):
        self.codes = codes    # (vec_id, bcode array<long>)
        self.ranges = ranges  # single row (qmin, qmax)
        self.dim = dim
        self.tombstones = tombstones

    @classmethod
    def build(
        cls,
        emb: DataFrame,
        dim: int,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "Sq8Index":
        # collapse the trained state to a DRIVER-LOCAL single row at
        # build time: ranges is one (qmin, qmax) row, so collecting it
        # once means the encode plan, every search, and save() all
        # reference a local relation instead of re-running the
        # corpus-wide posexplode range aggregation per consumer (at
        # 100 TB that aggregation is a full corpus pass)
        r = dim_ranges(emb, vec_col).collect()[0]
        ranges = emb.sparkSession.createDataFrame(
            [(list(r["qmin"]), list(r["qmax"]))],
            "qmin array<double>, qmax array<double>",
        )
        codes = quantize(emb, ranges, id_col, vec_col).select(
            F.col(id_col).alias("vec_id"), F.col("code").alias("bcode")
        )
        return cls(codes, ranges, dim)

    def add(
        self,
        emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "Sq8Index":
        """Incremental insert: quantize the new vectors with the FROZEN
        per-dimension ranges (train once, add many) and union the
        codes — the reference's insert (hsnw_trial.py:197-265) on the
        at-rest layout. Out-of-range values clip exactly as at build
        time (the quantizer saturates); existing codes are untouched.
        Ids must be fresh — re-adding a tombstoned id does not clear
        its tombstone (``compact`` first). A vector-bearing index
        (loaded from a ``save(path, emb)`` layout) carries the new
        batch's vectors into the union so the corpus-free refine
        contract survives incremental insert."""
        fresh = quantize(emb, self.ranges, id_col, vec_col).select(
            F.col(id_col).alias("vec_id"), F.col("code").alias("bcode")
        )
        if "v" in self.codes.columns:
            from ..functions.vector import to_vec

            pts = emb.select(
                F.col(id_col).alias("vec_id"), to_vec(vec_col).alias("v")
            )
            fresh = fresh.join(pts, "vec_id").select("vec_id", "bcode", "v")
        return Sq8Index(
            self.codes.unionByName(fresh), self.ranges, self.dim,
            tombstones=self.tombstones,
        )

    def delete(self, ids_df: DataFrame) -> "Sq8Index":
        """Tombstone the given ids (delete-log semantics: codes stay at
        rest, probes skip the log — hsnw_trial.py:296-305)."""
        from .knn import merge_tombstones

        return Sq8Index(
            self.codes, self.ranges, self.dim,
            tombstones=merge_tombstones(self.tombstones, ids_df),
        )

    def compact(self) -> "Sq8Index":
        """Physically drop tombstoned codes and clear the log — the
        reference's rebuild compaction (hsnw_trial.py:381-389) without
        retraining (the ranges are frozen, so compaction is a pure
        filter: searches are bit-identical before and after)."""
        from .knn import live_rows

        return Sq8Index(live_rows(self.codes, self.tombstones), self.ranges, self.dim)

    def save(self, path: str, emb: DataFrame | None = None) -> None:
        """Pass ``emb`` (vec_id, embedding) to store the raw vectors
        NEXT TO the codes (``v`` column in the codes files): a
        refine_search of the loaded index then runs with ``emb=None`` —
        the shortlist's exact re-rank reads the index's own files and
        the corpus table is never scanned at probe time (the
        IvfIndex.save(path, emb) layout applied to the refine family).
        Parquet is columnar, so the coarse integer scan still reads
        only (vec_id, bcode); ``v`` is touched only by the expand*k
        re-rank join. The routing-only form remains for callers who
        co-locate vectors elsewhere."""
        if emb is not None:
            from ..functions.vector import to_vec

            pts = emb.select("vec_id", to_vec("embedding").alias("v"))
            codes = (
                self.codes.select("vec_id", "bcode")
                .join(pts, "vec_id")
                .select("vec_id", "bcode", "v")
            )
        elif "v" in self.codes.columns:
            codes = self.codes.select("vec_id", "bcode", "v")
        else:
            codes = self.codes.select("vec_id", "bcode")
        codes.write.mode("overwrite").parquet(f"{path}/codes")
        self.ranges.withColumn("dim", F.lit(self.dim)).withColumn(
            "tombs", F.lit(self.tombstones is not None)
        ).write.mode("overwrite").parquet(f"{path}/ranges")
        if self.tombstones is not None:
            self.tombstones.write.mode("overwrite").parquet(f"{path}/tombstones")

    @classmethod
    def load(cls, spark, path: str) -> "Sq8Index":
        codes = spark.read.parquet(f"{path}/codes")
        ranges_raw = spark.read.parquet(f"{path}/ranges")
        meta = ranges_raw.first()
        tombs = (
            spark.read.parquet(f"{path}/tombstones")
            if "tombs" in ranges_raw.columns and meta["tombs"]
            else None
        )
        return cls(
            codes, ranges_raw.select("qmin", "qmax"), int(meta["dim"]),
            tombstones=tombs,
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        predicate=None,
        allowed_ids: DataFrame | None = None,
    ) -> DataFrame:
        """Integer-L2 top-k over the stored codes (no float-corpus
        scan). ``predicate`` / ``allowed_ids``: ``filtered_knn``'s
        pre-filter contract over the codes relation — applied before
        any distance math, so a filtered probe of the at-rest index
        reads only permitted codes (see ``IvfPqIndex.search``).
        Tombstoned ids are skipped first (the reference's
        deleted-check, hsnw_trial.py:178-179)."""
        from .knn import live_rows, prefilter_rows

        base = prefilter_rows(
            live_rows(self.codes, self.tombstones), "vec_id", predicate, allowed_ids
        ).select(
            F.col("vec_id").alias("neighbor_id"), "bcode"
        )
        return _sq8_score(base, self.ranges, queries, k)

    def refine_search(
        self,
        emb: DataFrame | None,
        queries: DataFrame,
        k: int = 10,
        expand: int = 10,
        metric: str = "l2",
        predicate=None,
        allowed_ids: DataFrame | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Quantized shortlist + exact re-rank over the stored codes —
        the deployed probe (same never-serve-a-shortlist contract and
        L2-shortlist/metric-rerank caveat as ``sq8_refine_knn``, whose
        results it matches bit-for-bit at equal build input). ``emb``
        supplies the raw vectors for the expand*k full-precision reads
        (``id_col``/``vec_col`` name its columns, matching build()); a
        vector-bearing index (``save(path, emb)``) ignores it and
        re-ranks from its own stored vectors (``emb=None`` is then
        valid — the corpus table is never scanned). The pre-filter
        applies to the shortlist stage, so the rescore touches only
        permitted rows. The re-rank tail is the shared
        ``pq._exact_rerank``, so one tie-break/metric fix serves every
        artifact path."""
        from .pq import _code_vector_base, _exact_rerank

        shortlist = self.search(
            queries, k=expand * k, predicate=predicate, allowed_ids=allowed_ids
        ).select("query_id", "neighbor_id")
        return _exact_rerank(
            shortlist, emb, queries, k, id_col, vec_col, metric,
            base=_code_vector_base(self.codes),
        )
