"""Window functions + sort/limit/top-k (SURVEY §2B E16–E18)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.topk import topk_per_group
from .base import query


@query(
    "q20_window_rank",
    oracle="""
    SELECT o_orderkey AS okey,
           o_orderpriority AS prio,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY round(o_totalprice, -3) DESC, o_orderkey) AS rn,
           rank()       OVER (PARTITION BY o_orderpriority
                              ORDER BY round(o_totalprice, -3) DESC) AS rnk,
           dense_rank() OVER (PARTITION BY o_orderpriority
                              ORDER BY round(o_totalprice, -3) DESC) AS drnk,
           ntile(4)     OVER (PARTITION BY o_orderpriority
                              ORDER BY round(o_totalprice, -3) DESC, o_orderkey) AS quartile
    FROM orders
    ORDER BY okey
    """,
)
def q20_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile. Rank windows order by a
    coarsened price so ties exist (rank ≠ row_number); tie-sensitive
    functions get a full deterministic order."""
    o = table(spark, sf_dir, "orders")
    coarse = F.round("o_totalprice", -3)
    w_det = W.partitionBy("o_orderpriority").orderBy(coarse.desc(), "o_orderkey")
    w_tie = W.partitionBy("o_orderpriority").orderBy(coarse.desc())
    return (
        o.select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderpriority").alias("prio"),
            F.row_number().over(w_det).alias("rn"),
            F.rank().over(w_tie).alias("rnk"),
            F.dense_rank().over(w_tie).alias("drnk"),
            F.ntile(4).over(w_det).alias("quartile"),
        )
        .orderBy("okey")
    )


@query(
    "q21_window_analytic",
    oracle="""
    SELECT o_orderkey AS okey,
           o_custkey AS custkey,
           CAST(lag(o_totalprice) OVER w AS DOUBLE) AS prev_price,
           CAST(lead(o_totalprice) OVER w AS DOUBLE) AS next_price,
           CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                      OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY okey
    """,
)
def q21_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / running sum with an explicit ROWS frame.
    The running sum accumulates in DECIMAL so partial-order differences
    between engines can't show up in low bits."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        o.select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("custkey"),
            F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
            F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
            F.first("o_totalprice").over(w).cast("double").alias("first_price"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w_run), 6
            )
            .cast("double")
            .alias("running_spend"),
        )
        .orderBy("okey")
    )


@query(
    "q22_topk_global",
    oracle="""
    SELECT o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q22_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans ORDER BY + LIMIT as TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver; never a full
    global sort. Exactly the 100 TB-safe plan."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
        .orderBy(F.col("price").desc(), "okey")
        .limit(50)
    )


@query(
    "q23_topk_per_group",
    oracle="""
    SELECT o_orderpriority AS prio, o_orderkey AS okey,
           CAST(o_totalprice AS DOUBLE) AS price, rn AS rank_in_group
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 5
    ORDER BY prio, rank_in_group
    """,
)
def q23_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via `operators.topk` (window row_number ≤ k)."""
    o = table(spark, sf_dir, "orders")
    ranked = topk_per_group(
        o,
        group_cols=["o_orderpriority"],
        order_cols=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=5,
        rank_col="rank_in_group",
    )
    return ranked.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").cast("double").alias("price"),
        "rank_in_group",
    ).orderBy("prio", "rank_in_group")
