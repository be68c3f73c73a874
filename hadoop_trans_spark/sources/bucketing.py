"""Bucketed table layout (SURVEY §4 / 100 TB co-located joins).

Writing both sides of a recurring fact-fact join bucketed (and sorted)
by the join key lets Spark plan a SortMergeJoin with ZERO exchanges —
the shuffle is paid once at write time and amortized over every
subsequent join, the standard layout for 100 TB star-schema fact tables
(tests/test_bucketing.py asserts the exchange-free plan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed (+optionally sorted) catalog table.

    ``n_buckets`` must match across tables meant to co-join; pick it so
    each bucket file lands near the target file size (bytes / 512 MB).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read; bucketing metadata flows into the planner."""
    return spark.table(table_name)
