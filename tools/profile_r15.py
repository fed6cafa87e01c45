"""Round-14 optimization profiler: time individual registry rows at
$SPARK_GRAFT_SF_DIR (default sf0.1) against the noop sink (guide §1.4)
and capture .explain("formatted") into plans/r15/<name>_<tag>.txt.

Usage:
  python tools/profile_r15.py <tag> <row> [<row> ...]
  python tools/profile_r15.py before semantic_neardup dedup_ngram_jaccard

Each row is timed min-of-3 (same escalation contract as bench.py) with
the bench harness's between-row state scrub, so numbers are comparable
to BENCH_FULL.json rows. The noop sink evaluates every column of every
row (bench times .count(), which can prune columns), so expect noop >=
count on wide outputs; both numbers are printed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_with_hnsw_spark.session import get_spark  # noqa: E402
from vectorsearch_with_hnsw_spark import registry  # noqa: E402


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
    return s[0], (s[1] - s[0]) / s[0], ts


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=f"profile_r15_{tag}", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)

    # warm the JVM + python worker pool like bench.py does
    spark.range(cpus * 4).repartition(cpus).mapInPandas(lambda it: it, "id long").count()
    from vectorsearch_with_hnsw_spark.sources import load_table
    load_table(spark, sf_dir, "documents").count()

    out = {}
    for name in names:
        fn = qmap[name]
        # capture the formatted plan once (untimed)
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        _release_row_state(spark)

        def run_noop(name=name):
            spark.sparkContext.setJobDescription(f"{name} [noop]")
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            _release_row_state(spark)
            return dt

        def run_count(name=name):
            spark.sparkContext.setJobDescription(f"{name} [count]")
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            _release_row_state(spark)
            return dt

        noop, sp_n, _ = _min_of_reps(run_noop)
        cnt, sp_c, _ = _min_of_reps(run_count)
        out[name] = {"noop": round(noop, 3), "count": round(cnt, 3),
                     "spread2_noop": round(sp_n, 3), "spread2_count": round(sp_c, 3)}
        print(f"# {name}: noop {out[name]['noop']}s count {out[name]['count']}s",
              file=sys.stderr)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "cpus": cpus, "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
