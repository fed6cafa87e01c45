"""Order-dependence probe for ivf_pq_lifecycle_ann (VERDICT r12 #3 in
"What's wrong" / task 2): BENCH_r12 measured the row at 3.547 s forward
vs 8.560 s reversed (2.4x) — a brand-new row outside the ORDERPROBE
adjudication, and the heaviest one-shot row in the suite (its consumer
action re-runs the even-half train+encode lineage under the documented
cache-free contract), hence the most weather-exposed.

Same design as tools/order_probe.py: in ONE session, min-of-3 when
FRESH (right after warmup), then a heavy workload prefix (every bench
row >~1s once), then min-of-3 again, with bench's between-rep state
release. If warmed-min >> fresh-min with clean RDD state, the position
effect is real and the row needs a structural fix (route the probe
through the saved artifact, or checkpoint the lifecycle codes); if they
agree, the fwd/rev split is host variance at suite scale and the
adjudication is "weather", matching ORDERPROBE's verdict for
ivf_pq_ann.

Run: python tools/probe_lifecycle.py  (~6-8 min at sf0.1; writes
ORDERPROBE_LIFECYCLE.json at the repo root). Never run concurrently
with bench, scale_check, or the test suite.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_with_hnsw_spark import registry  # noqa: E402
from vectorsearch_with_hnsw_spark.session import get_spark  # noqa: E402

PROBE_ROW = "ivf_pq_lifecycle_ann"
# heavy prefix: same aggregate-work recipe as order_probe.py, with the
# round-12 heavyweights included so the prefix reflects the r12 suite
WORKLOAD = [
    "dedup_ngram_jaccard", "fuzzy_dedup", "dedup_clusters", "dup_spans_capped",
    "dedup_minhash", "dedup_clusters_star", "knn_pagerank", "dedup_simhash",
    "maxsim_search", "ivf_pq_refine_ann", "ivf_kmeans_ann", "dominant_suppliers",
    "hard_negatives", "bpe_train", "leakage_safe_split",
]


def main() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="probe_lifecycle", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()

    def timed(n: int) -> list[float]:
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            qmap[PROBE_ROW](spark, sf_dir).count()
            ts.append(round(time.perf_counter() - t0, 3))
            bench._release_row_state(spark)
        return ts

    from vectorsearch_with_hnsw_spark.sources import load_table
    load_table(spark, sf_dir, "documents").count()
    qmap["knn_exact_l2"](spark, sf_dir).count()
    bench._release_row_state(spark)

    out: dict = {"metric": "probe_lifecycle", "row": PROBE_ROW, "sf_dir": sf_dir}
    fresh = timed(3)
    out["fresh_runs"], out["fresh_min"] = fresh, min(fresh)
    out["env_fresh"] = bench._env_stats(spark)
    print(f"# fresh: {fresh}", file=sys.stderr)

    t0 = time.perf_counter()
    for name in WORKLOAD:
        qmap[name](spark, sf_dir).count()
        bench._release_row_state(spark)
    out["workload_sec"] = round(time.perf_counter() - t0, 1)
    out["env_after_workload"] = bench._env_stats(spark)

    warmed = timed(3)
    out["warmed_runs"], out["warmed_min"] = warmed, min(warmed)
    out["env_warmed"] = bench._env_stats(spark)
    out["ratio"] = round(out["warmed_min"] / out["fresh_min"], 3)
    print(f"# warmed: {warmed} ratio={out['ratio']}", file=sys.stderr)

    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "ORDERPROBE_LIFECYCLE.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
