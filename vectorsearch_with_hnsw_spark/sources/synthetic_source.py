"""Custom Python DataSource (Spark 4 API): registered synthetic-vector
source, batch and streaming.

The reference's synthetic path is a driver-side numpy loop
(`_cli_build`, hsnw_trial.py:405-414). `operators/synth.py` already
distributes that as expressions; this module goes one step further and
packages it as a REGISTERED SOURCE — ``spark.read.format("synthetic")``
— to demonstrate the engine's source-extension point (SURVEY.md §2B
scans/sources) the idiomatic Spark-4 way: a pure-Python `DataSource`
with partition planning, so parallelism comes from `InputPartition`
objects, not a driver loop.

Determinism contract: vector j of row i is splitmix64(seed, i*dim+j)
mapped through Box-Muller — the SAME generator as operators/synth.py,
so rows are identical no matter how many partitions plan the scan, and
identical between the batch and stream readers.

Usage:
    spark.dataSource.register(SyntheticVectorsSource)
    df = (spark.read.format("synthetic_vectors")
          .option("n", 1000).option("dim", 64).option("seed", 42).load())
    stream = (spark.readStream.format("synthetic_vectors")
              .option("rowsPerBatch", 500).option("dim", 64).load())
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _rows(start: int, end: int, dim: int, seed: int) -> Iterator[tuple]:
    # THE generator: operators/synth.py::_gaussian_for — imported, not
    # re-implemented, so source rows are bit-identical to
    # synthetic_vectors() under any partitioning (asserted in tests)
    from ..operators.synth import _gaussian_for

    for i in range(start, end):
        yield (i, _gaussian_for(i, dim, seed).tolist())


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.dim = int(options.get("dim", 64))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(s, min(s + step, self.n)) for s in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        return _rows(partition.start, partition.end, self.dim, self.seed)


class _SyntheticStreamReader(DataSourceStreamReader):
    """Micro-batch planner: offset = rows emitted so far; each batch
    plans the next ``rowsPerBatch`` ids. Offsets are plain dicts, so
    checkpoint/restart resumes exactly (same ids, same vectors)."""

    def __init__(self, options):
        self.dim = int(options.get("dim", 64))
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rowsPerBatch", 500))
        self.max_rows = int(options.get("maxRows", 10_000))

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        # advance one batch per trigger, capped at maxRows
        self._latest = getattr(self, "_latest", 0)
        self._latest = min(self._latest + self.rows_per_batch, self.max_rows)
        return {"offset": self._latest}

    def partitions(self, start, end):
        return [_RangePartition(start["offset"], end["offset"])]

    def read(self, partition: _RangePartition):
        return _rows(partition.start, partition.end, self.dim, self.seed)

    def commit(self, end):
        pass


class SyntheticVectorsSource(DataSource):
    """``synthetic_vectors`` format: deterministic gaussian id+vector
    rows, batch and streaming."""

    @classmethod
    def name(cls):
        return "synthetic_vectors"

    def schema(self):
        return "id bigint, vec array<float>"

    def reader(self, schema):
        return _SyntheticReader(self.options)

    def streamReader(self, schema):
        return _SyntheticStreamReader(self.options)
