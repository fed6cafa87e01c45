"""Streaming corpus curation: the incremental twin of
operators/pipeline.curate.

A landing-zone document stream is scored, quality-gated, and
hash-sampled entirely map-side — every stage is a stateless projection
or filter, so the streaming plan is the batch plan verbatim, with no
state store at all. The exact-dedup keeper step is the one stateful
stage; it runs as ``dropDuplicates`` on the fingerprint (bounded by the
retention horizon at deploy time; the documents table carries no event
time, so the demo stream keeps full fingerprint state — call that out
rather than faking a watermark).

Parity contract (tests): streaming score→gate→sample over a bounded
file stream equals the batch composition minus the keeper window; the
keeper stage's streaming semantics ("first arrival wins") intentionally
differ from batch ("min doc_id wins"), which only matters when true
duplicates race — documented, not hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint, lang_id, quality_features
from ..cache import persist_tracked
from ..operators.textpipe import salted_hash

DOCUMENTS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file-source stream over the documents parquet (cluster
    deployment: object-store landing zone with file notifications)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .load(f"{sf_dir}/documents.parqu*")
    )


def curate_stream(
    docs: DataFrame,
    rates_pct: dict[str, int] | None = None,
    default_pct: int = 20,
    min_quality: float = 0.5,
    dedup: bool = False,
) -> DataFrame:
    """Incremental score → gate → sample (→ optional first-wins dedup).

    Stateless except the optional dedup; output schema matches the batch
    ``curate`` (doc_id, lang_pred, n_tokens, quality_score)."""
    rates_pct = rates_pct or {}
    feats = quality_features(F.col("text"))
    scored = docs.select(
        "doc_id",
        F.col("text"),
        lang_id(F.col("text")).alias("lang_pred"),
        feats["n_tokens"].alias("n_tokens"),
        feats["quality_score"].alias("quality_score"),
    )
    gated = scored.filter(
        (F.col("quality_score") >= F.lit(min_quality)) & (F.col("lang_pred") != "und")
    )
    mix = salted_hash(F.col("doc_id"))
    rate = F.lit(default_pct)
    for lang, pct in sorted(rates_pct.items()):
        rate = F.when(F.col("lang_pred") == lang, F.lit(pct)).otherwise(rate)
    sampled = gated.filter(mix % 100 < rate)
    if dedup:
        # first-arrival-wins keeper; full fingerprint state (no event
        # time on documents — at deploy time bound it with a retention
        # watermark on the ingest timestamp)
        sampled = sampled.withColumn("fp", fingerprint(F.col("text"))).dropDuplicates(
            ["fp"]
        )
    return sampled.drop("text", "fp") if dedup else sampled.drop("text")


def dedup_incremental_stream(
    new_docs_stream: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Streaming ingestion dedup: each micro-batch of NEW documents is
    deduped against the STATIC existing corpus (exact fingerprint +
    MinHash band buckets) with the batch operator, then appended to the
    survivors sink. foreachBatch (the micro-batch apply pattern this
    engine uses for index ingest and kNN serving) rather than a
    stream-static join chain, because the near-dup leg needs a per-batch
    signature aggregation — trivially bounded per batch, but stateful if
    expressed as one continuous streaming plan. Exactly-once via the
    checkpointed sink; the corpus artifacts are recomputed lazily per
    batch here and would be maintained incrementally (and bucketed) at
    deploy time.

    Returns the started StreamingQuery; callers await it.
    """
    from ..operators.dedup import dedup_incremental

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = dedup_incremental(batch_df, corpus_docs)
        out.write.mode("append").parquet(out_path)

    return (
        new_docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def lm_familiarity_stream(
    new_docs_stream: DataFrame,
    ref_docs: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Streaming twin of lm_familiarity: incoming documents are scored
    per micro-batch against a bigram model trained ONCE on the static
    reference corpus — the deploy shape for model-based quality gating
    at ingest time (the model is the persisted artifact; the stream
    only pays the score join). foreachBatch like the other incremental
    twins here: the per-doc aggregation is bounded within each batch,
    so no streaming state is needed. Exactly-once via the checkpointed
    sink.

    Returns the started StreamingQuery; callers await it.
    """
    from ..operators.textpipe import lm_model, lm_score

    model = lm_model(ref_docs).transform(persist_tracked)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        lm_score(batch_df, model).write.mode("append").parquet(out_path)

    return (
        new_docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cms_sketch_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin of textpipe.cms_token_sketch: the running corpus
    token-frequency sketch maintained incrementally as documents arrive.

    This is the sketch family's killer property as a stream: the
    aggregation state is EXACTLY depth x width counters (4 KiB-scale)
    no matter how large the vocabulary grows — a streaming groupBy on
    raw tokens would hold state per distinct token (unbounded), while
    this holds a fixed grid forever, and the grid merges with any batch
    or per-shard sketch by bucket-wise addition. Same plan as the batch
    operator (explode -> row-salted bucket -> count), so complete-mode
    output equals the batch sketch over the same rows bit-for-bit."""
    from ..operators.textpipe import cms_token_sketch

    return cms_token_sketch(docs_stream)


def gopher_stream(docs_stream: DataFrame, min_words: int = 50, min_stopwords: int = 2) -> DataFrame:
    """Streaming twin of textpipe.gopher_rules: the Gopher hard-filter
    gate applied to documents as they land. The rule set is one
    shuffle-free Catalyst projection (no aggregation, no state), so the
    streaming plan IS the batch plan — append-mode output over a
    micro-batch equals the batch operator over the same rows
    bit-for-bit, and the gate composes in front of any stateful stage
    (dedup, index ingest) as a zero-state prefilter."""
    from ..operators.textpipe import gopher_rules

    return gopher_rules(docs_stream, min_words=min_words, min_stopwords=min_stopwords)


def skipgram_stream(
    docs_stream: DataFrame, window: int = 2, min_count: int = 1
) -> DataFrame:
    """Streaming twin of textpipe.skipgram_pairs: the running
    (center, context) co-occurrence counts maintained as documents
    arrive — incremental embedding-training data prep.

    Pair GENERATION is the same stateless map-side nested transform as
    the batch plan; the running count is a streaming groupBy whose
    state is one counter per observed pair TYPE — bounded by the
    co-occurrence vocabulary (pairs actually seen within the window),
    not by corpus size. That is the right shape for bounded/curated
    vocabularies; for open web-scale vocabularies compose the CMS
    sketch twin instead (fixed grid) or flush per retention horizon.
    Complete-mode output over a drained bounded stream equals the batch
    operator over the same rows bit-for-bit (the min_count floor
    filters the aggregated state, identically in both)."""
    from ..operators.textpipe import skipgram_pairs

    return skipgram_pairs(docs_stream, window=window, min_count=min_count)


def bpe_encode_stream(
    docs_stream: DataFrame,
    merges: list,
    vocab: DataFrame,
    method: str = "auto",
) -> DataFrame:
    """Streaming twin of bpe.bpe_encode: tokenize documents to TOKEN
    IDS as they land, under a FROZEN trained tokenizer (merge list +
    vocab are bounded artifacts baked into the plan — the standard
    deploy shape: train batch-side, encode at ingest). Both encode
    paths are stateless map-only transforms (the nested-HOF expression
    up to EXPR_MAX_MERGES, the Arrow mapInPandas kernel above — both
    stream-capable), so append-mode output over a micro-batch equals
    the batch operator over the same rows bit-for-bit, and the encode
    composes in front of any stateful stage as a zero-state map."""
    from ..operators.bpe import bpe_encode

    return bpe_encode(docs_stream, merges, vocab, method=method)
