"""One-off: routed-HNSW recall vs (P, assign_n, n_probe) at 128k vectors.
Decides how to hold recall >= 0.95 at P=128/256 (VERDICT r9 #3)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from vectorsearch_with_hnsw_spark.session import get_spark
from vectorsearch_with_hnsw_spark.index.build import HnswParams
from vectorsearch_with_hnsw_spark.index.routed import hnsw_build_routed, knn_hnsw_routed, default_n_probe
from vectorsearch_with_hnsw_spark.operators.knn import knn_exact_fast
from vectorsearch_with_hnsw_spark.operators.synth import synthetic_vectors

spark = get_spark(app_name="exp_routed", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
N = 128_000; NQ = 100
vecs = synthetic_vectors(spark, n=N, dim=64, seed=7).select("id", "vec").persist()
vecs.count()
queries = vecs.filter(F.col("id") < NQ).select(F.col("id").alias("query_id"), F.col("vec").alias("query_vec")).persist()
queries.count()
exact = {(r["query_id"], r["neighbor_id"]) for r in knn_exact_fast(vecs, queries, k=10, metric="l2", id_col="id", vec_col="vec").collect()}
out = {}
for P, an in [(128, 2), (128, 3), (256, 2), (256, 3)]:
    t0 = time.perf_counter()
    idx = hnsw_build_routed(vecs, HnswParams(dim=64, metric="l2"), num_partitions=P, assign_n=an)
    idx.edges.count()
    bt = round(time.perf_counter() - t0, 1)
    out[f"build_p{P}_a{an}"] = bt
    for npb in sorted({default_n_probe(P), int(1.5*default_n_probe(P)), 2*default_n_probe(P)}):
        t0 = time.perf_counter()
        got = {(r["query_id"], r["neighbor_id"]) for r in knn_hnsw_routed(idx, queries, k=10, n_probe=npb).collect()}
        out[f"recall_p{P}_a{an}_np{npb}"] = round(len(got & exact)/len(exact), 4)
        out[f"probe_sec_p{P}_a{an}_np{npb}"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)
print("FINAL " + json.dumps(out))
