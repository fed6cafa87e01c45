"""Replicates the driver's correctness gate locally: every queries()
entry with an oracle must match DuckDB on row count, column names, and
(order-insensitive) values — exactly, no tolerance, because both sides
are written as the same arithmetic shape.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from vectorsearch_with_hnsw_spark.registry import REGISTRY
from vectorsearch_with_hnsw_spark.sources import TABLES

ORACLE_NAMES = sorted(n for n, (_, sql) in REGISTRY.items() if sql is not None)


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bool):
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_matches_duckdb(spark, sf_oracle, name):
    fn, sql = REGISTRY[name]
    got = _normalize(fn(spark, sf_oracle).toPandas())
    want = _normalize(_duck(sf_oracle, sql))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            mism = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(g, w))
                if not (a == b or (isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b)))
            ]
        else:
            eq = g.astype(str).values == w.astype(str).values
            mism = [(i, g.iloc[i], w.iloc[i]) for i in range(len(g)) if not eq[i]]
        assert not mism, f"{name}.{c}: {len(mism)} mismatches, first: {mism[:3]}"
