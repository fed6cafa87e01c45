"""End-to-end corpus curation: score -> filter -> dedup -> sample.

The composition a real 100 TB training-data pipeline runs nightly,
expressed as ONE DataFrame plan so Catalyst fuses the per-document
stages into a single scan pass:

  1. per-document scoring: quality features + language ID
     (functions/text.py — pure Catalyst expressions, map-only)
  2. quality gate: drop low-quality / unidentified-language docs
     (filter runs in the same stage as the scoring projections)
  3. exact dedup: fingerprint window, keep the min-doc_id representative
     (the plan's ONLY shuffle — hash on fingerprint)
  4. reproducible stratified sample by predicted language
     (hash-gated, map-only — see textpipe.stratified_sample)

Every stage is integer/fixed-expression arithmetic, so the whole
pipeline is verifiable bit-for-bit against a single DuckDB SQL oracle —
the composition is checked end-to-end, not just per piece.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import fingerprint, lang_id, quality_features
from .textpipe import salted_hash


def curate(
    docs: DataFrame,
    rates_pct: dict[str, int] | None = None,
    default_pct: int = 20,
    min_quality: float = 0.5,
) -> DataFrame:
    """Curated corpus slice: (doc_id, lang_pred, n_tokens, quality_score).

    One shuffle total (the dedup-keeper window on fingerprint); scoring,
    gating and sampling are all map-side and fuse with the scan.
    """
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
    w = Window.partitionBy("fp").orderBy("doc_id")
    keepers = (
        gated.withColumn("fp", fingerprint(F.col("text")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fp", "text")
    )
    mix = salted_hash(F.col("doc_id"))
    rate = F.lit(default_pct)
    for lang, pct in sorted(rates_pct.items()):
        rate = F.when(F.col("lang_pred") == lang, F.lit(pct)).otherwise(rate)
    return keepers.filter(mix % 100 < rate)


def pretrain_sequences(
    docs: DataFrame,
    rates_pct: dict[str, int] | None = None,
    default_pct: int = 20,
    min_quality: float = 0.5,
    window: int = 128,
    stride: int = 64,
    budget: int = 2048,
    n_shards: int = 32,
) -> DataFrame:
    """Raw corpus -> training sequences, one call: curate (score ->
    gate -> dedup -> sample) then chunk the survivors into token
    windows and pack them into ~budget-token shards — the whole
    pretraining data-prep path as a single composed plan, verified
    end-to-end against one DuckDB statement (not just per stage).

    Shuffle ledger at 100 TB: curation's fingerprint window, the
    doc_id join back for text (co-keyed with the window output), and
    pack's per-shard cumulative sum. Chunking stays map-side."""
    from .textpipe import pack_chunks

    kept = curate(
        docs, rates_pct=rates_pct, default_pct=default_pct, min_quality=min_quality
    ).select("doc_id")
    src = docs.join(kept, "doc_id").select("doc_id", "text")
    return pack_chunks(
        src, window=window, stride=stride, budget=budget, n_shards=n_shards
    )
