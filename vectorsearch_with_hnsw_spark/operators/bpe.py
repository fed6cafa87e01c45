"""Byte-pair-encoding tokenizer TRAINING as a declarative Spark loop.

The engine already counts and budgets by BPE-style pretokens
(functions/text.py::bpe_tokens — the GPT-2 pretokenizer regex); this
module learns the MERGE TABLE itself, the missing half of tokenizer
induction (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
of Rare Words with Subword Units", alg. 1): start from characters,
repeatedly merge the most frequent adjacent symbol pair.

Training runs over the WORD VOCABULARY, not the raw corpus — the
standard trick that makes BPE training tractable: one corpus pass
builds (word, freq), and every merge round after that touches only the
vocab relation (sublinear in corpus rows; at 100 TB the vocab of a
deduplicated web corpus is ~10^8 rows, broadcastable-adjacent, while
the corpus is 10^12). Each round is:

- one adjacent-pair count: slice/zip/explode + groupBy — a single
  map-side-combined shuffle over the vocab;
- one bounded argmax collect (ONE row — the same driver-artifact shape
  as k-means centroids, never the data);
- one map-only merge application: a native ``F.aggregate`` fold over
  each word's symbol array (greedy left-to-right non-overlapping,
  exactly the reference algorithm's scan) — no UDF, no shuffle.

Determinism: ties in the pair count break by (count desc, left asc,
right asc), so the merge table is a pure function of the corpus.
Every step is integer counts + string equality, so the DuckDB oracle
(an unrolled per-round CTE chain, registry._sql_bpe_train) reproduces
it bit-for-bit — the same unrolled-iteration oracle strategy the
k-means rows use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_tokens

END_SYM = "</w>"  # Sennrich's end-of-word marker symbol


def _char_symbols(word: Column) -> Column:
    """word -> [c1, c2, ..., cn, '</w>'] via substring (codepoint-exact
    and identical in DuckDB, unlike split-on-empty whose edge behavior
    is engine-specific)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_SYM)))


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (left, right) with left||right — one native aggregate fold:
    append each symbol unless it completes the pair with the CURRENT
    last element, in which case the last element is replaced by the
    merged symbol. A just-merged symbol can never re-match as ``left``
    unless it literally equals it (left||right == left is impossible
    for non-empty right), which is exactly the non-overlap rule."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _adjacent_pair_counts(vocab: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count) over the symbolized vocab,
    weighted by word frequency. Single-symbol words contribute nothing
    (their slice is empty and the explode drops them)."""
    n = F.size(F.col("syms"))
    pairs = F.arrays_zip(
        F.slice(F.col("syms"), 1, n - 1).alias("l"),
        F.slice(F.col("syms"), 2, n - 1).alias("r"),
    )
    return (
        vocab.filter(n >= 2)
        .select("freq", F.explode(pairs).alias("_p"))
        .select(
            F.col("_p.l").alias("left_sym"),
            F.col("_p.r").alias("right_sym"),
            "freq",
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_train(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus; returns
    the merge table (merge_rank, left_sym, right_sym, pair_count) —
    merge_rank 1 is the first (most frequent) merge, and later rounds
    count pairs over the vocabulary AS REWRITTEN by all earlier merges,
    exactly the reference training loop.

    Stops early (fewer rows) if the vocabulary runs out of adjacent
    pairs — impossible on any real corpus at small n_merges, and the
    oracle SQL assumes the full n_merges rounds run.

    Scale: the corpus is touched ONCE (pretokenize + word count); each
    round then costs one vocab-sized shuffle and a one-row collect.
    The per-round ``localCheckpoint`` keeps the 8-round plan from
    nesting eight HOF folds (tiny relation, lineage truncation only).
    """
    vocab = (
        docs.select(F.explode(bpe_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(_char_symbols(F.col("word")).alias("syms"), "freq")
    )
    spark = docs.sparkSession
    out_rows: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _adjacent_pair_counts(vocab)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left_sym").asc(),
                F.col("right_sym").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = (
            best[0]["left_sym"],
            best[0]["right_sym"],
            int(best[0]["pair_count"]),
        )
        out_rows.append((rank, left, right, cnt))
        vocab = vocab.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"), "freq"
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        out_rows,
        "merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list to the corpus: per document, the BPE
    token count under the trained tokenizer (chars+merges), alongside
    the pretoken count — the compression diagnostic a tokenizer-training
    run reports. Map-only: the merge list is a plan literal (it is the
    ARTIFACT, bounded by n_merges), each merge one fold."""
    syms = F.transform(
        bpe_tokens(F.col("text")), lambda w: _char_symbols(w)
    )
    for left, right in merges:
        syms = F.transform(syms, lambda s: _apply_merge(s, left, right))
    n_sub = F.aggregate(
        F.transform(syms, lambda s: F.size(s)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.size(bpe_tokens(F.col("text"))).alias("n_pretokens"),
        n_sub.alias("n_subwords"),
    )
