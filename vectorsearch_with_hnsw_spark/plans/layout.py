"""Z-order (Morton) data layout: cluster a table on the bit-interleave
of two range-queried columns so BOTH predicates prune files/row-groups.

Partitioning a 100 TB fact table by one column makes range scans on
that column cheap and leaves the other column's scans as full sweeps.
Interleaving the bits of both columns into one sort key gives every
file a narrow min/max envelope in BOTH dimensions, so parquet
footer-level min/max skipping works for either predicate (the same
trick Delta's OPTIMIZE ZORDER BY and Iceberg's sort orders use).

The z-value is pure integer bit math — shifts, masks, adds — built from
native Catalyst expressions, so layout jobs stay in whole-stage codegen
end-to-end. ``zorder_write`` = compute z → range-repartition on z →
sort within partitions → parquet; each output file then covers a small
Morton tile of the (a, b) plane.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _shl(col: Column, n: int) -> Column:
    return F.call_function("shiftleft", col, F.lit(n))


def _shr(col: Column, n: int) -> Column:
    return F.call_function("shiftright", col, F.lit(n))


def zorder_value(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton code of two non-negative integer columns, ``bits`` bits
    each → one ``2*bits``-bit BIGINT. Values are clamped into
    [0, 2^bits) first so outliers can't fold back onto small codes.
    Bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    cap = (1 << bits) - 1
    ac = F.least(F.greatest(a.cast("long"), F.lit(0)), F.lit(cap))
    bc = F.least(F.greatest(b.cast("long"), F.lit(0)), F.lit(cap))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + _shl(_shr(ac, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = z + _shl(_shr(bc, i).bitwiseAND(F.lit(1)), 2 * i)
    return z


def zorder_sql(a: str, b: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB mirror of :func:`zorder_value` (same clamp, same bit
    placement) — lets the oracle harness check the code bit-for-bit."""
    ac = f"least(greatest(CAST({a} AS BIGINT), 0), {(1 << bits) - 1})"
    bc = f"least(greatest(CAST({b} AS BIGINT), 0), {(1 << bits) - 1})"
    terms = []
    # NB: each shift term gets its own outer parens — SQL gives `+`
    # higher precedence than `<<`, so `x << 1 + y << 2` would cascade.
    for i in range(bits):
        terms.append(f"((({ac} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({bc} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = DEFAULT_BITS,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as z-ordered parquet: one range-partition per
    Morton tile, rows sorted by z inside each file so row-group min/max
    stats are tight for both ``col_a`` and ``col_b``."""
    z = zorder_value(F.col(col_a), F.col(col_b), bits=bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
