"""Scalable global row numbering (total-order rank without a
single-partition window).

``Window.orderBy(...)`` with no ``partitionBy`` funnels the whole table
through ONE task — the classic Spark scale-killer this repo's plan tests
ban elsewhere. This operator produces the same ``row_number`` in two
distributed steps, the standard sort-with-offsets decomposition:

1. bucket every row by a sort-aligned prefix of the leading sort key
   (all rows of bucket B sort strictly before all rows of bucket B+1);
   within each bucket, ``row_number`` over a PARTITIONED window —
   per-bucket sorts run in parallel;
2. bucket offsets = exclusive prefix sum of bucket counts. The count
   table is bucket-cardinality-sized (hundreds of rows), so its
   prefix-sum window is metadata-sized by construction; offsets join
   back as a broadcast.

Bucket granularity is the balance knob: a coarser prefix means fewer,
bigger per-bucket sorts (skew), a finer one means a bigger offset
table. Production engines derive boundaries from a range sample
(``repartitionByRange`` does exactly that) — a fixed prefix keeps the
whole plan deterministic, which the cross-engine oracle requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rn",
    prefix_len: int = 4,
) -> DataFrame:
    """Append 1-based ``rank_col`` = row number under ``order_cols``.

    The leading order column must be a string (its prefix forms the
    range bucket); the full ``order_cols`` list must be a total order
    (include a unique key as the last tie-break) or ranks within ties
    are nondeterministic.
    """
    lead = order_cols[0]
    bkt: Column = F.substring(F.col(lead), 1, prefix_len)
    b = df.withColumn("_bkt", bkt)
    counts = b.groupBy("_bkt").agg(F.count("*").alias("_n"))
    # Exclusive prefix sum over the tiny bucket table (one row per
    # distinct prefix — metadata-sized, the only unpartitioned window).
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    win = Window.partitionBy("_bkt").orderBy(*order_cols)
    return (
        b.join(F.broadcast(offsets), "_bkt")
        .withColumn(rank_col, F.row_number().over(win) + F.col("_off"))
        .drop("_bkt", "_off")
    )
