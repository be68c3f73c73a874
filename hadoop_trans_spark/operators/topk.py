"""Top-k per group (E18).

Window `row_number() <= k` over (group, order). At scale this is one
shuffle on the group key; Spark inserts a per-partition partial top-k
(WindowGroupLimit, Spark 3.5+) before the shuffle, so the exchange carries
at most k rows per group per map task rather than the full input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-k rows of each group under a deterministic order.

    ``order_cols`` must be a total order (include a unique tiebreak key)
    for reproducible results.
    """
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
