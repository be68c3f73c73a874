"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — the
engine's source-extensibility surface.

A deterministic synthetic generator source: N rows split across P
partitions, each row (id, h=md5(id), bucket=id%7). The point is the
CONTRACT, not the data: `partitions()` declares the split so Spark
schedules one task per partition (real parallelism, no driver
bottleneck), and `read(partition)` yields rows executor-side. A
production source (an internal API, a message queue snapshot, a
proprietary format) implements exactly these two methods; everything
downstream is ordinary Catalyst planning.

Scale note: partition count is the parallelism AND the unit of retry —
size partitions so one task's rows fit comfortably in memory, and make
`read` idempotent (retries re-run it)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticRangeSource(DataSource):
    """`spark.read.format("synthetic_range").option("n", ...).load()`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_range"

    def schema(self) -> str:
        return "id long, h string, bucket int"

    def reader(self, schema) -> DataSourceReader:  # noqa: ANN001
        return _RangeReader(self.options)


class _RangeReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        lo = self.n * i // self.n_parts
        hi = self.n * (i + 1) // self.n_parts
        for k in range(lo, hi):
            yield (k, hashlib.md5(str(k).encode()).hexdigest(), k % 7)


def register(spark) -> None:  # noqa: ANN001
    """Idempotent registration of all custom Python sources."""
    spark.dataSource.register(SyntheticRangeSource)
