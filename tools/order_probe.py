"""Order-dependence probe for the three forward-vs-reversed divergent
bench rows (knn_hnsw_routed, semantic_neardup, ivf_pq_ann).

Round-7 facts: per-row persistent-RDD state is provably clean between
rows (row_state_clean both directions), intra-position spread2 <= 0.12,
yet the three rows diverge up to 1.8x between the forward and reversed
suites. Hypotheses: (a) shuffle/disk-block accumulation on the local
dirs, (b) JVM old-gen/GC pressure, (c) JIT/codegen + scheduler warmth
that depends on HOW MUCH work preceded the row, not on leaked state.

Design: in ONE session, for each probe row measure min-of-3 when FRESH
(right after warmup), then run a heavy WORKLOAD prefix (every bench row
>~1s, once each), then measure the same row again (min-of-3), with the
same between-rep state release bench.py uses. Record disk/heap/GC
before and after. If after-min >> fresh-min with clean state, the
position effect is real and the env deltas attribute it; if the two
agree, the forward/reversed divergence is scheduler noise at suite
scale rather than row-level contamination.

Run: python tools/order_probe.py  (~8-10 min at sf0.1; writes
ORDERPROBE.json at the repo root). Never run concurrently with bench
or the test suite.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_with_hnsw_spark import registry  # noqa: E402
from vectorsearch_with_hnsw_spark.session import get_spark  # noqa: E402

PROBE_ROWS = ["knn_hnsw_routed", "semantic_neardup", "ivf_pq_ann"]
# heavy prefix: the rows whose r7 forward timings exceeded ~1.5s —
# enough aggregate work to reproduce "late in the suite" conditions
WORKLOAD = [
    "dedup_ngram_jaccard", "fuzzy_dedup", "dedup_clusters", "dup_spans_capped",
    "dedup_minhash", "dedup_clusters_star", "knn_pagerank", "dedup_simhash",
    "maxsim_search", "ivf_pq_refine_ann", "ivf_kmeans_ann", "dominant_suppliers",
]


def _gc_stats(spark):
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    t = 0
    for i in range(beans.size()):
        t += beans.get(i).getCollectionTime()
    return int(t)


def main() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="order_probe", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()

    def timed_min3(name: str) -> float:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
            bench._release_row_state(spark)
        return round(min(ts), 3)

    # warmup (same as bench: codegen + parquet footers + pandas workers)
    from pyspark.sql import functions as F  # noqa: F401
    from vectorsearch_with_hnsw_spark.sources import load_table
    load_table(spark, sf_dir, "documents").count()
    qmap["knn_exact_l2"](spark, sf_dir).count()
    bench._release_row_state(spark)

    out: dict = {"metric": "order_probe", "sf_dir": sf_dir}
    out["fresh"] = {}
    out["env_fresh"] = {}
    for name in PROBE_ROWS:
        out["fresh"][name] = timed_min3(name)
        out["env_fresh"][name] = {**bench._env_stats(spark), "gc_ms": _gc_stats(spark)}
        print(f"# fresh {name}: {out['fresh'][name]}s", file=sys.stderr)

    t0 = time.perf_counter()
    for name in WORKLOAD:
        qmap[name](spark, sf_dir).count()
        bench._release_row_state(spark)
    out["workload_sec"] = round(time.perf_counter() - t0, 1)
    out["env_after_workload"] = {**bench._env_stats(spark), "gc_ms": _gc_stats(spark)}

    out["warmed"] = {}
    out["env_warmed"] = {}
    for name in PROBE_ROWS:
        out["warmed"][name] = timed_min3(name)
        out["env_warmed"][name] = {**bench._env_stats(spark), "gc_ms": _gc_stats(spark)}
        print(f"# warmed {name}: {out['warmed'][name]}s", file=sys.stderr)

    out["ratio"] = {
        n: round(out["warmed"][n] / out["fresh"][n], 3) for n in PROBE_ROWS
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "ORDERPROBE.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
