"""Synthetic vector generation — the engine's twin of the reference CLI
build path (`_cli_build`, hsnw_trial.py:405-414: n gaussian vectors,
insert loop, save).

Distributed + deterministic: `spark.range(n)` partitions the id space;
each id's vector derives from splitmix64(seed, id, j) via Box-Muller —
no driver-side data generation, reproducible under any partitioning.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col, pandas_udf

from ..index.local_hnsw import splitmix64


def _gaussian_for(gid: int, dim: int, seed: int) -> np.ndarray:
    out = np.empty(dim, dtype=np.float32)
    for j in range(0, dim, 2):
        h1 = splitmix64((seed << 40) ^ (gid << 12) ^ j)
        h2 = splitmix64(h1 ^ 0xDEADBEEF)
        u1 = ((h1 >> 11) + 1) / float((1 << 53) + 1)
        u2 = (h2 >> 11) / float(1 << 53)
        r = math.sqrt(-2.0 * math.log(u1))
        out[j] = r * math.cos(2.0 * math.pi * u2)
        if j + 1 < dim:
            out[j + 1] = r * math.sin(2.0 * math.pi * u2)
    return out


def synthetic_vectors(spark: SparkSession, n: int, dim: int, seed: int = 42) -> DataFrame:
    """(id, vec) DataFrame of deterministic pseudo-gaussian vectors."""

    @pandas_udf("array<float>")
    def gen(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: _gaussian_for(int(i), dim, seed))

    return spark.range(n).select(col("id"), gen(col("id")).alias("vec"))
