"""Window functions + sort/limit/top-k (SURVEY §2B E16–E18)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.topk import topk_per_group
from .base import _dec_out, dterm, o_dsum, query, ts_micros


@query(
    "q20_window_rank",
    oracle="""
    SELECT o_orderkey AS okey,
           o_orderpriority AS prio,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY (CASE WHEN ISFINITE(o_totalprice) THEN round(o_totalprice, -3) ELSE o_totalprice END) DESC, o_orderkey) AS rn,
           rank()       OVER (PARTITION BY o_orderpriority
                              ORDER BY (CASE WHEN ISFINITE(o_totalprice) THEN round(o_totalprice, -3) ELSE o_totalprice END) DESC) AS rnk,
           dense_rank() OVER (PARTITION BY o_orderpriority
                              ORDER BY (CASE WHEN ISFINITE(o_totalprice) THEN round(o_totalprice, -3) ELSE o_totalprice END) DESC) AS drnk,
           ntile(4)     OVER (PARTITION BY o_orderpriority
                              ORDER BY (CASE WHEN ISFINITE(o_totalprice) THEN round(o_totalprice, -3) ELSE o_totalprice END) DESC, o_orderkey) AS quartile
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
           (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS running_spend
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
            _dec_out(
                F.sum(dterm("o_totalprice", 6)).over(w_run), 6
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


@query(
    "q80_scd2_intervals",
    oracle="""
    SELECT user_id,
           event_type AS state,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             AS valid_to_us,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
             AS is_current
    FROM events
    ORDER BY user_id, valid_from_us, state
    """,
)
def q80_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history build: each event opens a validity interval that
    the user's next event closes (lead over an event-time window); the
    open interval is the current state. The standard way a warehouse
    derives dimension history from a change stream — one shuffle on the
    partition key, whatever the table size."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead(ts_micros("ts")).over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        ts_micros("ts").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_us", "state")


@query(
    "q81_sessionize_batch",
    oracle=f"""
    WITH o AS (
        SELECT user_id, ts, event_id, "value",
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ), f AS (
        SELECT user_id, ts, event_id, "value",
               CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS news
        FROM o
    ), g AS (
        SELECT user_id, ts, "value",
               sum(news) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
        FROM f
    )
    SELECT user_id,
           CAST(sid AS BIGINT) AS session_no,
           epoch_us(min(ts)) AS session_start,
           count(*) AS n_events,
           {o_dsum('"value"')} AS value_sum
    FROM g
    GROUP BY user_id, sid
    ORDER BY user_id, session_no
    """,
)
def q81_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gap-based islands): lag → new-session flag →
    running sum = session number → per-session rollup. The batch twin of
    q56's streaming session windows; two window passes over one shuffle
    partitioning (user_id) plus the final rollup — no join, scales with
    the shuffle, not the session count."""
    from .base import dsum

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            # microsecond-exact gap (the oracle's INTERVAL comparison):
            # cast("long") truncates to whole seconds, which can split a
            # sub-second-straddling 30-minute gap differently.
            | (
                ts_micros("ts") - F.lag(ts_micros("ts")).over(w)
                >= 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("news"),
    )
    sessions = flagged.withColumn("sid", F.sum("news").over(run))
    return (
        sessions.groupBy("user_id", F.col("sid").alias("session_no"))
        .agg(
            F.min(ts_micros("ts")).alias("session_start"),
            F.count("*").alias("n_events"),
            dsum("value").alias("value_sum"),
        )
        .orderBy("user_id", "session_no")
    )


@query(
    "q114_window_distribution",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           CAST(ROUND(percent_rank() OVER w, 6) AS DOUBLE) AS pr,
           CAST(ROUND(cume_dist() OVER w, 6) AS DOUBLE) AS cd,
           ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
)
def q114_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist / ntile)
    per market segment with a total order for determinism — the
    percentile-feature transform done relationally. Same single window
    shuffle as any ranking function; the three functions share one sort."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).cast("double").alias("pr"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("c_custkey")
