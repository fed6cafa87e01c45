"""Stage-level profiling for the perf-weak rows (semantic_neardup,
knn_pagerank, dedup_incremental) at sf0.1 — min/median over repeats so
conclusions survive the measured ±30-65% single-run noise."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectorsearch_with_hnsw_spark.session import get_spark  # noqa: E402
from vectorsearch_with_hnsw_spark.sources import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROF_REPS", "3"))


def timed(label, fn):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        n = fn()
        ts.append(time.perf_counter() - t0)
    print(
        f"{label:40s} min={min(ts):7.2f} med={statistics.median(ts):7.2f} "
        f"max={max(ts):7.2f} rows={n}",
        flush=True,
    )


def main():
    spark = get_spark(app_name="prof", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(128).repartition(32).mapInPandas(lambda it: it, "id long").count()

    docs = load_table(spark, SF, "documents")
    docs.count()
    emb = load_table(spark, SF, "embeddings")
    emb.count()

    from vectorsearch_with_hnsw_spark.operators.textpipe import hashed_doc_vectors
    from vectorsearch_with_hnsw_spark.operators.ann import banded_bucket_frame
    from vectorsearch_with_hnsw_spark.operators.dedup import semantic_neardup_pairs
    from vectorsearch_with_hnsw_spark.operators.clusters import knn_pagerank
    from vectorsearch_with_hnsw_spark.operators.retrieval import knn_graph
    from vectorsearch_with_hnsw_spark.operators.dedup import dedup_incremental
    from vectorsearch_with_hnsw_spark import registry

    DIM = registry.DIM

    # --- semantic_neardup stages ---
    timed("hashed_doc_vectors", lambda: hashed_doc_vectors(docs, DIM).count())
    vecs = hashed_doc_vectors(docs, DIM)
    timed(
        "banded_bucket_frame",
        lambda: banded_bucket_frame(vecs, "vec", DIM, 8, 4).count(),
    )
    banded = banded_bucket_frame(vecs, "vec", DIM, 8, 4)
    timed(
        "banded groupBy count (shuffle only)",
        lambda: banded.groupBy("band", "bucket").count().count(),
    )
    timed(
        "semantic_neardup full",
        lambda: semantic_neardup_pairs(docs, dim=DIM, threshold=0.8).count(),
    )
    # bucket-size distribution: is there a hot block?
    sizes = (
        banded.groupBy("band", "bucket").count().select("count").toPandas()["count"]
    )
    print(
        f"bucket sizes: n={len(sizes)} max={sizes.max()} p99={sizes.quantile(0.99):.0f} "
        f"mean={sizes.mean():.1f} sum_sq={int((sizes ** 2).sum())}",
        flush=True,
    )

    # --- knn_pagerank stages ---
    timed("knn_graph exact k=5", lambda: knn_graph(emb, k=5, metric="l2").count())
    g = knn_graph(emb, k=5, metric="l2").select("src_id", "dst_id")
    timed(
        "pagerank minus graph (graph preckpt)",
        lambda: _pr_from_graph(spark, emb, g),
    )
    timed(
        "knn_pagerank full",
        lambda: knn_pagerank(emb, k=5, iters=3, damping_pct=85).count(),
    )

    # --- dedup_incremental ---
    timed(
        "dedup_incremental full",
        lambda: dedup_incremental(
            docs.filter(F.col("doc_id") % 10 != 0),
            docs.filter(F.col("doc_id") % 10 == 0),
        ).count(),
    )
    spark.stop()


def _pr_from_graph(spark, emb, g):
    from pyspark.sql import functions as F

    deg = g.groupBy("src_id").agg(F.count(F.lit(1)).alias("out_deg"))
    edges = g.join(deg, "src_id").localCheckpoint(eager=True)
    nodes = emb.select(F.col("vec_id").alias("node_id"))
    scale, damp = 10**12, 85
    base = (scale * (100 - damp)) // 100
    p = nodes.select("node_id", F.lit(scale).cast("long").alias("pr"))
    share = F.expr(f"((pr * {damp}) div 100) div out_deg")
    for _ in range(3):
        contrib = (
            edges.join(p, edges.src_id == p.node_id)
            .select(F.col("dst_id").alias("node_id"), share.alias("c"))
            .groupBy("node_id")
            .agg(F.sum("c").alias("c"))
        )
        p = (
            nodes.join(contrib, "node_id", "left")
            .select(
                "node_id",
                (F.lit(base).cast("long") + F.coalesce("c", F.lit(0).cast("long")))
                .cast("long")
                .alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return p.count()


if __name__ == "__main__":
    main()
