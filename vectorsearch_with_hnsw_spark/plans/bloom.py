"""Bloom-filter runtime row pruning: filter a fact table by a compact
bitmap of the dimension side's join keys BEFORE any shuffle or join.

This is the explicit, composable version of Spark's own runtime-filter
injection (InjectRuntimeFilter): at 100 TB the win is that fact rows
with no join partner are dropped at the scan stage — they never enter
the shuffle, never hit the join, never inflate spill. The filter is
exact-safe: false positives are removed by the real join that follows,
false negatives are impossible (every inserted key sets all its bits).

Everything is native Catalyst expressions — ``xxhash64`` for the k hash
probes and a single ``ARRAY<BIGINT>`` literal for the bitmap — so the
membership test runs inside whole-stage codegen with zero Python cost
per row. The bitmap itself is built distributed (explode bit positions,
``bit_or`` per 64-bit word) and only the ~KB-scale dense word array is
collected to the driver, exactly like a broadcast variable.

Sizing: with ``num_hashes=5``, ~1% false-positive rate needs ~10 bits
per key; the default 2^17 bits (16 KiB) comfortably covers ~13k keys.
Callers with bigger dims should scale ``num_bits`` (it stays a literal
in the plan, so keep it ≤ a few MiB — beyond that, prefer a real
broadcast semi-join).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 17
DEFAULT_NUM_HASHES = 5

# join types for which pre-filtering the fact side cannot change the
# result: every dropped fact row would have found no partner anyway.
# Outer/anti joins must KEEP unmatched fact rows, so pruning them first
# silently corrupts the output — rejected, not silently allowed.
_PRUNABLE_JOINS = {"inner", "semi", "left_semi", "leftsemi"}


class BloomFilter(NamedTuple):
    """A built Bloom filter plus the parameters it was built with.

    Carrying ``num_hashes`` in the artifact makes build/probe parameter
    divergence impossible: probing with more hashes than the build used
    would produce false NEGATIVES — silently dropped rows, the one
    failure mode the design promises can't happen."""

    words: list[int]
    num_bits: int
    num_hashes: int


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # k independent probes: xxhash64 seeded by probe index. pmod keeps the
    # position non-negative (xxhash64 is signed).
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> BloomFilter:
    """Distributed Bloom-filter build over ``df[key]``: returns the dense
    ``num_bits / 64``-long word array bundled with its parameters. One
    narrow job: project k positions per key, explode, ``bit_or`` per word
    — only ~num_bits/64 rows ever reach the driver."""
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    pos = F.explode(
        F.array(*_bit_positions(F.col(key), num_bits, num_hashes))
    ).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for r in words:
        dense[r["w"]] = r["word"]
    return BloomFilter(words=dense, num_bits=num_bits, num_hashes=num_hashes)


def might_contain(bf: BloomFilter, key: Column) -> Column:
    """Membership-test Column: true iff all k probe bits for ``key`` are
    set in ``bf.words``. A single ARRAY<BIGINT> literal + integer bit
    math — fully codegen'd, no UDF. Probe parameters come from the
    filter artifact itself, so they can never diverge from the build."""
    lit_words = F.lit(bf.words)
    cond = None
    for pos in _bit_positions(key, bf.num_bits, bf.num_hashes):
        word = F.element_at(lit_words, (pos / 64).cast("int") + 1)
        bit = F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int"))
        test = word.bitwiseAND(bit) != 0
        cond = test if cond is None else cond & test
    return cond


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    how: str = "inner",
) -> DataFrame:
    """Exact equi-join ``fact ⋈ dim`` with the fact side Bloom-pruned
    first. Identical rows to ``fact.join(dim, fact[fact_key]==dim[dim_key],
    how)`` for inner/semi joins: the bitmap admits every true match (no
    false negatives) and the broadcast join discards the false positives.

    Only inner/semi ``how`` is accepted — outer, left, and anti joins
    must keep (or key on) unmatched fact rows, which pre-filtering would
    silently drop, so those are a ValueError rather than a wrong answer.

    The build triggers one small job at plan time (like a broadcast
    exchange); the fact scan then carries the membership filter so
    non-matching rows die before the join — at 100 TB that is the
    difference between shuffling the whole fact table and shuffling only
    the matching slice."""
    if how.lower() not in _PRUNABLE_JOINS:
        raise ValueError(
            f"bloom_pruned_join supports only inner/semi joins, got how={how!r}: "
            "pre-filtering the fact side would drop rows an outer/anti join must keep"
        )
    bf = bloom_build(dim, dim_key, num_bits=num_bits, num_hashes=num_hashes)
    pruned = fact.filter(might_contain(bf, F.col(fact_key)))
    return pruned.join(
        F.broadcast(dim), pruned[fact_key] == dim[dim_key], how
    )
