"""Skew-mitigation utilities for hot join keys at 100 TB.

AQE's skew-join handles most cases at runtime; explicit salting is for
the pathological ones AQE can't split (e.g. a single key holding >10% of
a table when the other side must be replicated). ``salted_join``
replicates the small side `salt` ways and scatters the large side's hot
rows uniformly, turning one straggler task into `salt` even tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to skew in ``large[on]``: the large side gets a
    uniform salt in [0, salt), the small side is exploded `salt` ways, and
    the join key becomes (on, salt). Result rows identical to
    ``large.join(small, on, how)``; shuffle keys are `salt`x finer."""
    salted_large = large.withColumn(
        "_salt", (F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt))).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_large.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")
