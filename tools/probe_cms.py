"""Order-dependence probe for cms_token_counts (VERDICT r13 #4):
BENCH_r13 measured the row at 1.90 s forward vs 0.839 s reversed
(2.5x) on UNTOUCHED code, where r12 had 0.757 s forward — a forward-
only regression that fails the documented both-orders criterion but
was never adjudicated. The row's forward position is immediately
after ivf_pq_lifecycle_ann (the heaviest one-shot row in the suite),
so position contamination is the default suspect.

Same design as tools/probe_lifecycle.py: in ONE session, min-of-3
when FRESH (right after warmup), then the row's actual forward-order
PREDECESSOR prefix (the lifecycle row plus the heavy rows ahead of
it), then min-of-3 again, with bench's between-rep state release. If
warmed-min ~= fresh-min with clean RDD state, the forward number is
position/weather at suite scale (adjudication: no code fix owed); if
warmed-min >> fresh-min, the predecessor leaks state and the row
needs a structural fix.

Run: python tools/probe_cms.py  (~4-6 min at sf0.1; writes
ORDERPROBE_CMS.json at the repo root). Never run concurrently with
bench, scale_check, or the test suite.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_with_hnsw_spark import registry  # noqa: E402
from vectorsearch_with_hnsw_spark.session import get_spark  # noqa: E402

PROBE_ROW = "cms_token_counts"
# the row's actual forward-order neighborhood: the heavy tail that
# runs right before it in bench.py's ROWS (lifecycle last, as in the
# real suite)
WORKLOAD = [
    "semantic_neardup", "pq_refine_ann", "embedding_outliers",
    "binary_refine_ann", "ivf_pq_refine_ann", "ivf_pq_filtered_ann",
    "ivf_pq_lifecycle_ann",
]


def main() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="probe_cms", master=f"local[{cpus}]",
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

    out: dict = {"metric": "probe_cms", "row": PROBE_ROW, "sf_dir": sf_dir}
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
                           "ORDERPROBE_CMS.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
