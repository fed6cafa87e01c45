"""Round-15 adjudication probe for the four rows elevated in BOTH the
driver's and the builder's round-14 runs (VERDICT r14, next-round item 1):
hnsw_build, hnsw_routed_build, ivf_ann_cosine, bpe_train.

Times exactly what bench.py times for each row (the registry .count()
for the query rows; the bench build loops for the hnsw rows), plus the
untouched control row knn_exact_l2_fast as the weather gauge. Run this
script alternately from the HEAD checkout and from a worktree at the
r13 artifact commit (c94abd9) in one time window; each invocation
imports ITS OWN tree (sys.path is pinned to the script's repo root).

Usage:  python tools/ab_r15.py <tag>
Prints one JSON line {"tag": ..., "rows": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from vectorsearch_with_hnsw_spark.session import get_spark  # noqa: E402
from vectorsearch_with_hnsw_spark import registry  # noqa: E402
from vectorsearch_with_hnsw_spark.index.build import HnswParams, hnsw_build  # noqa: E402
from vectorsearch_with_hnsw_spark.index.routed import hnsw_build_routed  # noqa: E402
from vectorsearch_with_hnsw_spark.sources import load_table  # noqa: E402


def _release_row_state(spark):
    from vectorsearch_with_hnsw_spark.cache import release_caches

    release_caches()
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist(True)


def _min_of_reps(run, n_min=3, n_max=4, tol=0.10):
    ts = []
    while True:
        ts.append(run())
        if len(ts) >= n_min:
            s = sorted(ts)
            if (s[1] - s[0]) / s[0] <= tol or len(ts) >= n_max:
                break
    s = sorted(ts)
    return s[0], ts


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=f"ab_r15_{tag}", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()

    # warm like bench.py
    spark.range(cpus * 4).repartition(cpus).mapInPandas(lambda it: it, "id long").count()
    load_table(spark, sf_dir, "documents").count()

    out: dict[str, dict] = {}

    # --- registry rows, timed exactly like bench.py (.count()) ---
    for name in ("knn_exact_l2_fast", "ivf_ann_cosine", "bpe_train"):
        def run_count(name=name):
            spark.sparkContext.setJobDescription(f"ab {tag} {name}")
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            _release_row_state(spark)
            return dt

        best, ts = _min_of_reps(run_count)
        out[name] = {"min": round(best, 3), "runs": [round(t, 3) for t in ts]}
        print(f"# {name}: {out[name]}", file=sys.stderr)

    # --- hnsw_build: bench.py's median-of-5 loop over the embeddings ---
    emb = load_table(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    n_parts = max(2, min(cpus, n_vec // 125))
    build_ts = []
    idx = None
    for i in range(5):
        if i > 0:
            idx.kernel_out.unpersist(blocking=True)
        spark.sparkContext.setJobDescription(f"ab {tag} hnsw_build {i}")
        t0 = time.perf_counter()
        idx = hnsw_build(
            emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
            HnswParams(dim=registry.DIM, metric="cosine"),
            num_partitions=n_parts,
        )
        idx.edges.count()
        build_ts.append(time.perf_counter() - t0)
    out["hnsw_build"] = {
        "median5": round(sorted(build_ts)[2], 3),
        "runs": [round(t, 3) for t in build_ts],
    }
    print(f"# hnsw_build: {out['hnsw_build']}", file=sys.stderr)
    _release_row_state(spark)

    # --- hnsw_routed_build: bench.py times ONE build; min-of-3 here ---
    old_part = emb.filter(F.col("vec_id") < n_vec - 50)

    def run_routed():
        spark.sparkContext.setJobDescription(f"ab {tag} hnsw_routed_build")
        t0 = time.perf_counter()
        ridx = hnsw_build_routed(
            old_part.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
            HnswParams(dim=registry.DIM, metric="cosine"),
            num_partitions=n_parts,
        )
        ridx.edges.count()
        dt = time.perf_counter() - t0
        _release_row_state(spark)
        return dt

    best, ts = _min_of_reps(run_routed)
    out["hnsw_routed_build"] = {"min": round(best, 3), "runs": [round(t, 3) for t in ts]}
    print(f"# hnsw_routed_build: {out['hnsw_routed_build']}", file=sys.stderr)

    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "cpus": cpus, "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
