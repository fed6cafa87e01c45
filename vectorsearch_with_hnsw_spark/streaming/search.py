"""Streaming similarity search: micro-batch kNN serving.

The reference serves queries over FastAPI, one HTTP request per search
(hsnw_trial.py:430-447). BASELINE.json scopes real-time serving out of
the batch contract, but the capability maps naturally onto Structured
Streaming: a query-vector stream drains through ``foreachBatch``, each
micro-batch is answered with the SAME operators the batch surface
exposes (exact kNN or an HNSW probe), and results append to a sink.

Scale shape: per micro-batch the query set is small and broadcast; the
base/index side is the big static relation — so each batch is one
broadcast join + partial top-k, cost O(batch x index/partitions), with
no state accumulating in the stream itself. Swapping ``knn_exact_fast``
for an ``HnswIndex`` probe changes per-batch cost to O(batch x ef) —
the handle stays warm across batches exactly like StreamingIndexIngest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.knn import knn_exact_fast


class StreamingKnn:
    """foreachBatch sink answering each micro-batch of query vectors
    against a static base relation, appending results as parquet.

    ``answer`` is pluggable: default exact kNN (deterministic,
    oracle-comparable); pass ``lambda q: knn_hnsw(index, q, k)`` for the
    ANN path — the streaming plumbing is identical."""

    def __init__(
        self,
        base_df: DataFrame,
        out_dir: str,
        k: int = 10,
        metric: str = "l2",
        answer=None,
    ):
        self.base = base_df
        self.out_dir = out_dir
        self.k = k
        self.metric = metric
        self.answer = answer or (
            lambda queries: knn_exact_fast(self.base, queries, k=self.k, metric=self.metric)
        )
        self.batches_seen = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.batches_seen += 1
        if batch_df.isEmpty():
            return
        self.answer(batch_df).write.mode("append").parquet(self.out_dir)

    def run(self, queries_stream: DataFrame, await_sec: int = 120) -> DataFrame:
        """Drain a bounded query stream (availableNow) and return the
        accumulated results relation."""
        q = (
            queries_stream.writeStream.foreachBatch(self)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(await_sec)
        return self.base.sparkSession.read.parquet(self.out_dir)
