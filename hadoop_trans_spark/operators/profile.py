"""Column profiling: per-column null / distinct / extent statistics in a
single scan (the `ANALYZE TABLE` surface a pipeline needs before and after
every transformation — schema-drift and data-quality detection at 100 TB
is a statistics diff, never a row diff).

Physical shape: ONE aggregation over the table computes every metric for
every profiled column (count/min/max fold into a single hash-agg pass;
the exact distinct counts expand the aggregate, which Spark executes as a
shared multi-distinct Expand — still one scan of the data), then the
single result row is unpivoted driver-side-free via `stack` into the
long (column, metrics) form. Result size is O(columns), independent of
table size.

Reference parity: the reference verifies copies by file counts and sizes
(`CommonUtils.java:99-124`); profiling generalizes that to content-level
per-column statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` of ``df`` in one scan.

    Returns one row per column: (col_name, n_rows, n_nonnull, n_distinct,
    min_str, max_str). Extents are canonicalized to strings so columns of
    any type share one schema; numeric/temporal types render identically
    across engines (exact values, no float formatting).
    """
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    # Internal aliases are positional (never derived from column names)
    # and the display name enters the stack() expression only as an
    # escaped string literal, so names with spaces/dots/quotes/backticks
    # profile fine.
    aggs = [F.count("*").alias("__n_rows")]
    for i, c in enumerate(cols):
        qc = F.col("`" + c.replace("`", "``") + "`")
        aggs.append(F.count(qc).alias(f"__nn_{i}"))
        aggs.append(F.countDistinct(qc).alias(f"__nd_{i}"))
        aggs.append(F.min(qc).cast("string").alias(f"__mn_{i}"))
        aggs.append(F.max(qc).cast("string").alias(f"__mx_{i}"))
    row = df.agg(*aggs)

    stack_args: list[str] = []
    for i, c in enumerate(cols):
        lit = c.replace("\\", "\\\\").replace("'", "\\'")
        stack_args.append(f"'{lit}', __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}")
    stacked = row.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(col_name, n_nonnull, n_distinct, min_str, max_str)"
        ),
    )
    return stacked.select(
        "col_name", "n_rows", "n_nonnull", "n_distinct", "min_str", "max_str"
    )
