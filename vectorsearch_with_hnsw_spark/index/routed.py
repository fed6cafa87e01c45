"""Routed HNSW: partition the index by locality (centroid cell or LSH
bucket) and probe only the partitions a query can plausibly live in.

The plain build partitions by hash(id): correct, but every probe must
visit every partition, so probe cost grows with P. Routing fixes that.
Two routing families share the build kernel, probe kernel and merge:

- ``routing="centroid"`` (default, SPANN-style): partition = nearest
  of P k-means centroids, each vector multi-assigned to its
  ``assign_n`` closest cells (default 2 -> 2x storage); a query probes
  its ``n_probe`` nearest cells (default ~4.5*sqrt(P), sublinear in P).
  Centroids are trained driver-side on a bounded deterministic sample
  (<= 64 per cell, capped — the same bounded-artifact class as the PQ
  codebooks) with plain Lloyd iterations.
- ``routing="lsh"``: partition = lsh_bucket(vec) % P with boundary
  vectors replicated into their ``replicas`` lowest-margin flip
  buckets; queries probe their Hamming<=2 ball (37 buckets regardless
  of P).

Why centroid is the default: on the near-uniform gaussian testdata
(worst case for sign-bit LSH — true neighbors average Hamming distance
4-5 over 8 planes, unreachable by any bounded Hamming ball), measured
candidate coverage of the true top-10 at P=128 with equal probe budget
(37 partitions) is 0.63 for the LSH ball vs 0.93 for assign_n=2
centroid routing; recall@10 through the full index tracks coverage.
operators.retrieval._stitch_graph repairs the kNN-graph use case
further with NN-descent rounds.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ann import hyperplane_ints, lsh_bucket
from ..operators.knn import topk_per_group
from .build import EDGES_SCHEMA, HnswIndex, HnswParams
from .local_hnsw import LocalHNSW
from ..cache import persist_tracked


def default_n_probe(num_partitions: int) -> int:
    """Probe budget for centroid routing: ~4.5*sqrt(P), floor 8, capped
    at P — sublinear growth keeps the probed FRACTION shrinking as the
    cluster grows (P=8 -> probe-all, P=128 -> 51, P=1024 -> 144 = 14%).

    The coefficient is measured, not guessed (128k gaussian vectors,
    dim 64, assign_n=2): 3.0*sqrt(P) gave recall@10 0.935 at P=128 and
    0.902 at P=256 — decaying with P; 4.5*sqrt(P) gives 0.981 / 0.964
    at IDENTICAL build cost and ~flat probe time (the per-cell search
    is the cheap half of a probe; candidate merge dominates). The
    alternative, assign_n=3, reached 0.974 at P=128 but at ~3x build
    time — outside the <=1.2x build budget, so the probe-side knob
    wins. SCALECHECK records the P=64/128/256 curve each round."""
    import math

    return min(num_partitions, max(8, math.ceil(4.5 * math.sqrt(num_partitions))))


def _train_centroids(
    vectors_df: DataFrame,
    num_partitions: int,
    id_col: str,
    vec_col: str,
    sample_per_cell: int = 64,
    iters: int = 8,
    dim: int | None = None,
) -> np.ndarray:
    """Driver-side Lloyd over a bounded deterministic sample: rows are
    ordered by xxhash64(id) (a seedless pseudo-random permutation that
    is identical on every run/engine) and the first
    ``min(P*sample_per_cell, 65536)`` taken. Init = first P sample rows;
    an emptied cell keeps its previous centroid. Sample size is
    independent of the table size, so this is O(1) driver memory at any
    scale — the standard IVF/SPANN training shape."""
    cap = max(num_partitions, min(num_partitions * sample_per_cell, 65536))
    rows = (
        vectors_df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .orderBy(F.xxhash64(F.col("_id")), F.col("_id"))
        .limit(cap)
        .collect()
    )
    if not rows:
        # empty corpus: keep the empty-in/empty-out totality contract
        # (an empty-rows np.array is 1-D and (X*X).sum(axis=1) would
        # raise AxisError); downstream _nearest_cells yields zero cells
        # per row, so probes/builds over the empty index are empty too
        return np.zeros((0, int(dim or 0)), dtype=np.float64)
    X = np.array([r["_v"] for r in rows], dtype=np.float64)
    k = min(num_partitions, len(X))
    C = X[:k].copy()
    x2 = (X * X).sum(axis=1)
    for _ in range(iters):
        c2 = (C * C).sum(axis=1)
        d2 = x2[:, None] - 2.0 * (X @ C.T) + c2[None, :]
        a = d2.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def _nearest_cells(X: np.ndarray, C: np.ndarray, n: int) -> np.ndarray:
    """(len(X), n) int32 ids of each row's ``n`` nearest centroids,
    distance-then-cell-id ordered (deterministic under ties)."""
    x2 = (X * X).sum(axis=1)
    c2 = (C * C).sum(axis=1)
    d2 = x2[:, None] - 2.0 * (X @ C.T) + c2[None, :]
    n = min(n, C.shape[0])
    if n < C.shape[0]:
        part = np.argpartition(d2, n - 1, axis=1)[:, :n]
        pd2 = np.take_along_axis(d2, part, axis=1)
        order = np.lexsort((part, pd2), axis=1)
        return np.take_along_axis(part, order, axis=1).astype(np.int32)
    order = np.lexsort((np.broadcast_to(np.arange(C.shape[0]), d2.shape), d2), axis=1)
    return order.astype(np.int32)


def _assign_centroid_partitions(
    vectors_df: DataFrame,
    centroids: np.ndarray,
    assign_n: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec float32, partition) with each vector exploded to its
    ``assign_n`` nearest cells — the centroid twin of the LSH
    multi-assignment projection. One broadcast + one Arrow map pass;
    no shuffle here (the build's groupBy supplies it)."""
    import pandas as pd

    spark = vectors_df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    narrow = vectors_df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<float>").alias("vec"),
    )

    def assign(it):
        C = bc.value
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "vec": [], "partition": []}).astype(
                    {"id": "int64", "partition": "int32"}
                )
                continue
            X = np.array(list(pdf["vec"]), dtype=np.float64)
            cells = _nearest_cells(X, C, assign_n)
            n_rep = cells.shape[1]
            out = pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(dtype=np.int64), n_rep),
                    "vec": np.repeat(pdf["vec"].to_numpy(), n_rep),
                    "partition": cells.reshape(-1),
                }
            )
            yield out

    return narrow.mapInPandas(assign, "id long, vec array<float>, partition int")


def _assignment_exprs(
    vec_sql: str, dim: int, n_planes: int, num_partitions: int, replicas: int
) -> tuple[str, str, str]:
    """SQL for the multi-assignment placement: (dots array, home bucket
    from ``_dots``, partition array from ``_bucket``/``_dots``).

    A vector lands in its home bucket PLUS the flip buckets of its
    ``replicas`` smallest-|margin| hyperplanes — the SPANN-style
    boundary replication: a vector close to a hyperplane is ambiguous
    between the two sides, so it is stored on both. Storage grows by at
    most (1+replicas)x; query-side probe cost is unchanged (same
    Hamming-ball routing), while boundary neighbors become reachable
    from both sides of the cut. Bit order matches lsh_band_bucket's
    fold (plane 0 = MSB), so home buckets are identical to the
    replica-free build."""
    planes = ", ".join(
        "array(" + ",".join(f"{float(v)!r}D" for v in hyperplane_ints(p, dim)) + ")"
        for p in range(n_planes)
    )
    dots = (
        f"transform(array({planes}), pl -> aggregate(zip_with({vec_sql}, pl, "
        "(x, y) -> x * y), 0.0D, (acc, v) -> acc + v))"
    )
    bucket = (
        "aggregate(_dots, 0, (acc, d) -> acc * 2 + "
        "(CASE WHEN d >= 0.0D THEN 1 ELSE 0 END))"
    )
    flips = (
        f"transform(slice(array_sort(transform(sequence(0, {n_planes - 1}), "
        f"i -> struct(abs(element_at(_dots, i + 1)) AS m, i AS p))), 1, {replicas}), "
        f"s -> _bucket ^ shiftleft(1, {n_planes - 1} - s.p))"
    )
    parts = (
        f"array_distinct(transform(concat(array(_bucket), {flips}), "
        f"b -> CAST(pmod(b, {num_partitions}) AS INT)))"
    )
    return dots, bucket, parts


def hnsw_build_routed(
    vectors_df: DataFrame,
    params: HnswParams,
    num_partitions: int = 8,
    n_planes: int = 8,
    replicas: int = 2,
    id_col: str = "id",
    vec_col: str = "vec",
    routing: str = "centroid",
    assign_n: int = 2,
) -> HnswIndex:
    """Same kernel build as hnsw_build, but the partitioner co-locates
    likely neighbors (see module docstring for the two routing families
    and why centroid is the default).

    ``routing="centroid"``: partition = one of the vector's ``assign_n``
    nearest k-means cells (SPANN multi-assignment, ``assign_n``x
    storage). ``routing="lsh"``: partition = LSH bucket % P, with each
    vector additionally replicated into the flip buckets of its
    ``replicas`` lowest-margin hyperplanes (measured edge recall at
    P=64 on the gaussian sf0.1 testdata: 0.58 replica-free -> 0.79
    candidate coverage at replicas=2 for 3x storage; ``replicas=0``
    restores the single-home layout). Either way the probe merge
    deduplicates (query, neighbor) pairs, so results are
    replication-independent."""
    import numpy as np
    import pandas as pd

    if routing not in ("centroid", "lsh"):
        raise ValueError(f"unknown routing {routing!r}; expected 'centroid' or 'lsh'")
    pickled = params
    centroids_df = None
    if routing == "centroid":
        C = _train_centroids(vectors_df, num_partitions, id_col, vec_col, dim=params.dim)
        src = _assign_centroid_partitions(vectors_df, C, assign_n, id_col, vec_col)
        spark = vectors_df.sparkSession
        centroids_df = spark.createDataFrame(
            [(int(i), [float(v) for v in C[i]]) for i in range(len(C))],
            "cell int, centroid array<double>",
        )
    else:
        dots, bucket, parts = _assignment_exprs(
            f"cast(`{vec_col}` as array<double>)",
            params.dim,
            n_planes,
            num_partitions,
            replicas,
        )
        src = (
            vectors_df.select(
                F.col(id_col).cast("long").alias("id"),
                F.col(vec_col).cast("array<float>").alias("vec"),
                F.expr(dots).alias("_dots"),
            )
            .withColumn("_bucket", F.expr(bucket))
            .select("id", "vec", F.explode(F.expr(parts)).alias("partition"))
        )

    def build_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["partition"].iloc[0])
        idx = LocalHNSW(pickled)
        idx.add_batch(pdf["id"].to_numpy(dtype=np.int64), np.array(list(pdf["vec"]), dtype=np.float32))
        layer, s, t = idx.edges()
        return pd.DataFrame(
            {
                "partition": np.full(len(layer), part, dtype=np.int32),
                "layer": layer,
                "src": s,
                "dst": t,
                "entry_point": np.full(len(layer), idx.ids[idx.entry_point], dtype=np.int64),
                "max_layer": np.full(len(layer), idx.max_layer, dtype=np.int32),
            }
        )

    edges_raw = src.groupBy("partition").applyInPandas(
        build_partition, EDGES_SCHEMA + ", entry_point long, max_layer int"
    ).transform(persist_tracked)
    edges = edges_raw.select("partition", "layer", "src", "dst")
    meta = edges_raw.groupBy("partition").agg(
        F.first("entry_point").alias("entry_point"),
        F.first("max_layer").alias("max_layer"),
        F.countDistinct("src").alias("n_nodes"),
    )
    from .build import _level_expr

    nodes = src.select(
        "partition", "id", "vec", _level_expr(F.col("id"), pickled).alias("level"), F.lit(False).alias("deleted")
    )
    idx = HnswIndex(
        nodes, edges, meta, params, num_partitions=num_partitions,
        routed=True, n_planes=n_planes, replicas=replicas,
        routing=routing, assign_n=assign_n, centroids=centroids_df,
    )
    if routing == "centroid":
        # seed the probe-side cache — the build already holds C
        idx._centroids_np = (C, np.arange(len(C), dtype=np.int32))
    return idx


def route_partitions(
    qvec: F.Column | str, dim: int, num_partitions: int, n_planes: int = 8, radius: int = 2
) -> F.Column:
    """Array of candidate partitions for a query: its own bucket plus all
    Hamming<=radius flips (multi-probe LSH), deduplicated after mod P.

    radius=2 over 8 planes = 37 buckets — a constant independent of P.
    At small P the distinct partitions cover everything (probe-all, full
    recall); at P=1000 a query touches <= 37 of 1000 partitions."""
    b = lsh_bucket(qvec, dim, n_planes)
    flips = [b]
    for i in range(n_planes):
        flips.append(b.bitwiseXOR(F.lit(1 << i)))
    if radius >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                flips.append(b.bitwiseXOR(F.lit((1 << i) | (1 << j))))
    return F.array_distinct(
        F.transform(F.array(*flips), lambda x: F.pmod(x, F.lit(num_partitions)).cast("int"))
    )


def _centroids_np(index: HnswIndex) -> tuple[np.ndarray, np.ndarray]:
    """(centroid matrix, cell ids) for a centroid-routed index, collected
    once per handle and cached — the table is bounded (P rows), but the
    collect is still a Spark job the probe shouldn't pay per call."""
    cached = getattr(index, "_centroids_np", None)
    if cached is None:
        rows = index.centroids.orderBy("cell").collect()
        cached = (
            np.array([r["centroid"] for r in rows], dtype=np.float64),
            np.array([r["cell"] for r in rows], dtype=np.int32),
        )
        index._centroids_np = cached
    return cached


def knn_hnsw_routed(
    index: HnswIndex,
    queries_df: DataFrame,
    k: int = 10,
    ef: int | None = None,
    n_planes: int | None = None,
    n_probe: int | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Multi-probe routed query: each query is replicated only to its
    candidate partitions — ``n_probe`` nearest centroid cells
    (centroid routing; default ~4.5*sqrt(P), sublinear in P) or the
    Hamming<=2 bucket ball (LSH routing; <= 37 independent of P).

    Partitions added by ``HnswIndex.append`` are hash-placed, outside
    the routing space — every query probes ALL of them in addition
    to its routed candidates (correctness over the appended tail;
    ``rebuild`` dispatches to hnsw_build_routed for routed-built
    indexes, re-mixing appended vectors into the routed layout).

    Refuses hash-placed indexes (``hnsw_build`` output): routing
    over hash placement silently probes partitions unrelated to the
    query's true neighbors — at large P recall collapses with no
    error. Use ``knn_hnsw`` (probe-all) for hash-placed indexes."""
    import numpy as np
    import pandas as pd

    if not getattr(index, "routed", False):
        raise ValueError(
            "knn_hnsw_routed requires an index built by hnsw_build_routed "
            "(routed placement); this index is hash-placed — use knn_hnsw "
            "(probe-all) or rebuild with hnsw_build_routed"
        )
    params = index.params
    # route with the BUILD modulus: meta.count() undercounts when a
    # build partition carried 0/1 nodes (no edges -> no meta row), and a
    # wrong modulus silently routes queries away from their home bucket
    num_partitions = index.num_partitions
    if num_partitions is None:
        num_partitions = index.meta.count()
    appended = getattr(index, "appended_partitions", None) or []
    routing = getattr(index, "routing", None) or "lsh"
    if routing == "centroid":
        C, cell_ids = _centroids_np(index)
        R = int(n_probe) if n_probe is not None else default_n_probe(int(num_partitions))
        spark = queries_df.sparkSession
        bc = spark.sparkContext.broadcast((C, cell_ids, np.array(appended, dtype=np.int32)))
        nq = queries_df.select(
            F.col(query_id_col).cast("long").alias("id"),
            F.col(query_vec_col).cast("array<float>").alias("vec"),
        )

        def route_q(it):
            Cv, cells_v, app_v = bc.value
            for pdf in it:
                if len(pdf) == 0:
                    yield pd.DataFrame({"id": [], "vec": [], "partition": []}).astype(
                        {"id": "int64", "partition": "int32"}
                    )
                    continue
                X = np.array(list(pdf["vec"]), dtype=np.float64)
                near = _nearest_cells(X, Cv, R)
                parts = cells_v[near]  # map row index -> cell id
                if len(app_v):
                    parts = np.concatenate(
                        [parts, np.broadcast_to(app_v, (len(parts), len(app_v)))],
                        axis=1,
                    )
                n_rep = parts.shape[1]
                yield pd.DataFrame(
                    {
                        "id": np.repeat(pdf["id"].to_numpy(dtype=np.int64), n_rep),
                        "vec": np.repeat(pdf["vec"].to_numpy(), n_rep),
                        "partition": parts.reshape(-1),
                    }
                )

        routed = nq.mapInPandas(route_q, "id long, vec array<float>, partition int")
    else:
        # route with the BUILD's plane count: a query hashed with a
        # different hyperplane set than the build lands in an unrelated
        # bucket (explicit arg still wins for experiments)
        if n_planes is None:
            n_planes = int(getattr(index, "n_planes", None) or 8)
        route = route_partitions(
            f"cast(`{query_vec_col}` as array<double>)", params.dim, int(num_partitions), n_planes
        )
        if appended:
            route = F.array_distinct(
                F.concat(route, F.array(*[F.lit(int(p)).cast("int") for p in appended]))
            )
        routed = queries_df.select(
            F.col(query_id_col).alias("id"),
            F.col(query_vec_col).cast("array<float>").alias("vec"),
            F.explode(route).alias("partition"),
        )
    tagged = index.nodes.select(
        "partition", "id", "vec", "level", "deleted", F.lit(False).alias("is_query")
    ).unionByName(
        routed.select(
            "partition", "id", "vec", F.lit(0).alias("level"), F.lit(False).alias("deleted"),
            F.lit(True).alias("is_query"),
        )
    )
    meta_rows = {
        int(r["partition"]): (int(r["entry_point"]), int(r["max_layer"]))
        for r in index.meta.collect()
    }
    spark = index.nodes.sparkSession
    bmeta = spark.sparkContext.broadcast(meta_rows)

    def probe(mixed_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"), "neighbor_id": pd.Series(dtype="int64"),
             "dist": pd.Series(dtype="float64")}
        )
        if len(mixed_pdf) == 0:
            return empty
        is_q = mixed_pdf["is_query"].to_numpy(dtype=bool)
        nodes_pdf = mixed_pdf[~is_q]
        queries_pdf = mixed_pdf[is_q]
        if len(nodes_pdf) == 0 or len(queries_pdf) == 0:
            return empty
        part = int(nodes_pdf["partition"].iloc[0])
        entry_point, max_layer = bmeta.value.get(part, (None, -1))
        idx = LocalHNSW.from_tables(
            params,
            nodes_pdf["id"].to_numpy(dtype=np.int64),
            np.array(list(nodes_pdf["vec"]), dtype=np.float32),
            nodes_pdf["level"].to_numpy(dtype=np.int32),
            nodes_pdf["deleted"].to_numpy(dtype=bool),
            edges_pdf["layer"].to_numpy(dtype=np.int32),
            edges_pdf["src"].to_numpy(dtype=np.int64),
            edges_pdf["dst"].to_numpy(dtype=np.int64),
            entry_point,
            max_layer,
        )
        out_q, out_n, out_d = [], [], []
        for qid, qv in zip(queries_pdf["id"].to_numpy(dtype=np.int64), queries_pdf["vec"]):
            for nid, d in idx.search(np.asarray(qv, dtype=np.float32), k=k, ef=ef):
                out_q.append(qid)
                out_n.append(nid)
                out_d.append(d)
        return pd.DataFrame(
            {
                "query_id": np.array(out_q, dtype=np.int64),
                "neighbor_id": np.array(out_n, dtype=np.int64),
                "dist": np.array(out_d, dtype=np.float64),
            }
        )

    partial = (
        tagged.groupBy("partition")
        .cogroup(index.edges.groupBy("partition"))
        .applyInPandas(probe, "query_id long, neighbor_id long, dist double")
    )
    # dropDuplicates: a replicated routed layout (or probe-all over it)
    # surfaces the same (query, neighbor) hit from several partitions
    # with identical dist; keep one before ranking so replicas never
    # crowd distinct neighbors out of the top-k. The partial frame is
    # O(P*Q*k) — the dedup shuffle is tiny and shares the window key.
    partial = partial.dropDuplicates(["query_id", "neighbor_id"])
    return topk_per_group(partial, ["query_id"], ["dist", "neighbor_id"], k).select(
        "query_id", "neighbor_id", "dist", "rnk"
    )


def append_routed(
    index: HnswIndex,
    vectors_df: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
) -> HnswIndex:
    """Incremental insert that PRESERVES the routed layout: new vectors
    are LSH-placed with the index's own modulus/planes/replication, and
    only the partitions that actually receive rows have their local
    graphs rebuilt (over old + new members together). Untouched
    partitions' node and edge rows pass through unchanged.

    Contrast ``HnswIndex.append`` (the hash-placed batch form): that
    keeps existing graphs immutable but every routed query must probe
    ALL appended partitions, so the probe bound grows with the number
    of append batches until a rebuild. This form keeps knn_hnsw_routed's
    probe bound at the Hamming ball forever — the shape a continuously
    ingesting deployment needs — at the cost of re-running the build
    kernel for the touched partitions (cost ∝ vectors living in touched
    partitions, NOT index size; a batch that routes into b of P
    partitions rebuilds only those b).

    The whole update is declarative: one assignment projection over the
    batch, one distinct on its partition ids (bounded by P), an
    anti-join split of the old tables, and the same cogrouped
    applyInPandas kernel as the build over the touched slice. Returns a
    new handle; tables are immutable as everywhere else."""
    import numpy as np
    import pandas as pd

    if not getattr(index, "routed", False):
        raise ValueError(
            "append_routed requires a routed-built index; use "
            "HnswIndex.append for hash-placed indexes"
        )
    params = index.params
    pickled = params
    num_partitions = int(index.num_partitions or index.meta.count())
    n_planes = int(index.n_planes or 8)
    replicas = int(getattr(index, "replicas", 0))
    routing = getattr(index, "routing", None) or "lsh"
    if routing == "centroid":
        # place the batch with the index's OWN trained centroids (no
        # retraining — standard IVF behavior; rebuild() re-trains)
        C, _ = _centroids_np(index)
        fresh = _assign_centroid_partitions(
            vectors_df, C, int(getattr(index, "assign_n", 2) or 2), id_col, vec_col
        )
    else:
        dots, bucket, parts = _assignment_exprs(
            f"cast(`{vec_col}` as array<double>)",
            params.dim,
            n_planes,
            num_partitions,
            replicas,
        )
        fresh = (
            vectors_df.select(
                F.col(id_col).cast("long").alias("id"),
                F.col(vec_col).cast("array<float>").alias("vec"),
                F.expr(dots).alias("_dots"),
            )
            .withColumn("_bucket", F.expr(bucket))
            .select("id", "vec", F.explode(F.expr(parts)).alias("partition"))
        )
    touched = fresh.select("partition").distinct()
    old_members = index.nodes.join(F.broadcast(touched), "partition").select(
        "partition", "id", "vec", "deleted"
    )
    # tombstoned members stay out of the rebuilt graphs — the routed
    # incremental insert doubles as incremental compaction of the
    # touched partitions
    members = (
        old_members.filter(~F.col("deleted"))
        .select("partition", "id", "vec")
        .unionByName(fresh)
    )

    def build_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["partition"].iloc[0])
        idx = LocalHNSW(pickled)
        idx.add_batch(
            pdf["id"].to_numpy(dtype=np.int64),
            np.array(list(pdf["vec"]), dtype=np.float32),
        )
        layer, s, t = idx.edges()
        return pd.DataFrame(
            {
                "partition": np.full(len(layer), part, dtype=np.int32),
                "layer": layer,
                "src": s,
                "dst": t,
                "entry_point": np.full(len(layer), idx.ids[idx.entry_point], dtype=np.int64),
                "max_layer": np.full(len(layer), idx.max_layer, dtype=np.int32),
            }
        )

    rebuilt_raw = members.groupBy("partition").applyInPandas(
        build_partition, EDGES_SCHEMA + ", entry_point long, max_layer int"
    ).transform(persist_tracked)
    rebuilt_edges = rebuilt_raw.select("partition", "layer", "src", "dst")
    rebuilt_meta = rebuilt_raw.groupBy("partition").agg(
        F.first("entry_point").alias("entry_point"),
        F.first("max_layer").alias("max_layer"),
        F.countDistinct("src").alias("n_nodes"),
    )
    from .build import _level_expr

    rebuilt_nodes = members.select(
        "partition",
        "id",
        "vec",
        _level_expr(F.col("id"), pickled).alias("level"),
        F.lit(False).alias("deleted"),
    )
    keep_nodes = index.nodes.join(F.broadcast(touched), "partition", "left_anti")
    keep_edges = index.edges.join(F.broadcast(touched), "partition", "left_anti")
    keep_meta = index.meta.join(F.broadcast(touched), "partition", "left_anti")
    return HnswIndex(
        keep_nodes.unionByName(rebuilt_nodes),
        keep_edges.unionByName(rebuilt_edges),
        keep_meta.unionByName(rebuilt_meta),
        params,
        num_partitions=index.num_partitions,
        appended_partitions=index.appended_partitions,
        routed=True,
        n_planes=index.n_planes,
        replicas=replicas,
        routing=routing,
        assign_n=getattr(index, "assign_n", 2),
        centroids=getattr(index, "centroids", None),
    )
