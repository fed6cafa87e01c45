"""Z-order layout (plans/layout.py): Morton-code correctness vs a pure
Python reference, and the actual layout property — after zorder_write,
every parquet file's min/max envelope is narrow in BOTH columns, which
is what lets footer-level stats skipping prune range scans on either."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.plans.layout import (
    zorder_sql,
    zorder_value,
    zorder_write,
)


def _morton_ref(a: int, b: int, bits: int) -> int:
    cap = (1 << bits) - 1
    a, b = min(max(a, 0), cap), min(max(b, 0), cap)
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_value_matches_python_reference(spark):
    rows = spark.range(0, 500).select(
        (F.col("id") * 7919 % 70000 - 100).alias("a"),
        (F.col("id") * 104729 % 70000).alias("b"),
    )
    got = rows.select(
        "a", "b", zorder_value(F.col("a"), F.col("b"), bits=16).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["a"], r["b"], 16)


def test_zorder_bits_validation():
    with pytest.raises(ValueError):
        zorder_value(F.lit(1), F.lit(2), bits=0)
    with pytest.raises(ValueError):
        zorder_sql("a", "b") and zorder_value(F.lit(1), F.lit(2), bits=40)


def test_zorder_write_tightens_file_envelopes(spark, tmp_path):
    # a 256x256 uniform grid: unordered writes give every file the full
    # [0,255] span in both columns; z-ordered files cover small tiles.
    n_files = 16
    grid = spark.range(0, 256 * 256).select(
        (F.col("id") % 256).alias("a"), (F.col("id") / 256).cast("long").alias("b")
    )
    out = str(tmp_path / "zordered")
    zorder_write(grid, out, "a", "b", bits=8, num_files=n_files)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= n_files // 2  # range partitioner may coalesce a bit
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins = {"a": 1 << 30, "b": 1 << 30}
        maxs = {"a": -1, "b": -1}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mins[name] = min(mins[name], col.statistics.min)
                    maxs[name] = max(maxs[name], col.statistics.max)
        spans.append((maxs["a"] - mins["a"], maxs["b"] - mins["b"]))
    # files must cover far less than the full 256-wide span in both dims
    # (a perfect 16-file Morton split gives 64-128). Files whose z-range
    # straddles a high-order quadrant boundary legitimately span wide, so
    # assert the clustering property over the fleet: >=3/4 of files tight.
    tight = sum(1 for sa, sb in spans if sa <= 160 and sb <= 160)
    assert tight >= (3 * len(spans)) // 4, spans

    # and the rewrite must be lossless
    back = spark.read.parquet(out)
    assert back.count() == 256 * 256
    assert back.select(F.sum("a"), F.sum("b")).first() == grid.select(
        F.sum("a"), F.sum("b")
    ).first()
