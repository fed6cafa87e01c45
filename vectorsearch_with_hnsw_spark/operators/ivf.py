"""IVF (inverted-file) ANN: coarse quantization -> probe nearest cells.

The scale path for similarity search when a graph index is overkill:
assign every vector to its nearest centroid (one narrow shuffle-free
projection), store bucketed by cell, and at query time scan only the
``n_probe`` nearest cells. Complements LSH (operators/ann.py) and HNSW
(index/): three ANN strategies with one result contract.

Centroids here are class means (the embeddings table has labels — the
deterministic, SQL-checkable choice); at deploy time the same operator
takes k-means centroids without any other change. Everything is exact
double-fold arithmetic, so the DuckDB oracle verifies the whole ANN
pipeline bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_distance, to_vec
from .knn import topk_per_group


def label_centroids(emb: DataFrame, dim: int) -> DataFrame:
    """Per-label mean vectors via posexplode + groupBy — partial (map-side)
    aggregation; never collects vectors to the driver."""
    per_dim = emb.select(
        F.col("label").alias("cell"),
        F.posexplode(to_vec("embedding")).alias("pos", "x"),
    )
    return (
        per_dim.groupBy("cell", "pos")
        # decimal-exact sum: result independent of aggregation order
        # (double sums are not), then one double division
        .agg(
            F.sum(F.col("x").cast("decimal(28,10)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("c", F.col("s") / F.col("n"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("cell", F.transform("pc", lambda s: s["c"]).alias("centroid"))
    )


def assign_cells(vectors: DataFrame, centroids: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid set,
    rank by cosine distance, keep rank 1. Ties break by cell id."""
    cand = vectors.crossJoin(F.broadcast(centroids)).select(
        "*", cosine_distance(to_vec(vec_col), F.col("centroid")).alias("cdist")
    )
    w = Window.partitionBy("vec_id").orderBy("cdist", "cell")
    return (
        cand.withColumn("crnk", F.row_number().over(w))
        .filter(F.col("crnk") == 1)
        .drop("crnk", "cdist", "centroid")
    )


def ivf_knn_cosine(
    emb: DataFrame,
    queries_df: DataFrame,
    dim: int,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF probe: queries pick their n_probe nearest cells, candidates are
    the vectors assigned to those cells, ranked by exact cosine distance.

    Plan shape at 100 TB: the index side is bucketed by cell (written
    once), the query side broadcasts, so the probe is a bucket-pruned
    scan + window — no all-pairs anything."""
    cents = label_centroids(emb, dim)
    assigned = assign_cells(emb.select("vec_id", "embedding"), cents)
    qcells = (
        queries_df.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "query_vec",
            "cell",
            cosine_distance(to_vec("query_vec"), F.col("centroid")).alias("cdist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("cdist", "cell")
    probes = (
        qcells.withColumn("crnk", F.row_number().over(w))
        .filter(F.col("crnk") <= n_probe)
        .select("query_id", "query_vec", "cell")
    )
    cand = assigned.join(F.broadcast(probes), "cell").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_distance(to_vec("embedding"), to_vec("query_vec")).alias("dist"),
    )
    return topk_per_group(cand, ["query_id"], ["dist", "neighbor_id"], k).select(
        "query_id", "neighbor_id", "dist", "rnk"
    )
