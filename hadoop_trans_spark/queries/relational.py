"""Core relational surface (SURVEY §2B E1, E6–E15, E19–E21, E32).

Every query here is a declarative DataFrame plan — Catalyst handles
predicate pushdown, column pruning, and join-strategy selection. Scale
notes are attached per query where the 100 TB plan differs from the
obvious local plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.asof import asof_join
from .base import DEC, _dec_out, davg, dsum, dterm, o_davg, o_dsum, query, ts_micros


# --- E1 + E7 + E13 + E18: the flagship (TPC-H Q1 shape) ----------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_base_price,
           {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           {o_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter → hash-aggregate → sort.

    Scale: the filter is pushed to the parquet scan (row-group min/max
    skipping on l_shipdate); the aggregate is map-side partial (2 grouping
    keys × few distinct values → tiny shuffle). No plan change at 100 TB.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- E6: projection / rename / cast / literal --------------------------------
@query(
    "q02_projection_cast",
    oracle="""
    SELECT p_partkey AS part_id,
           upper(p_brand) AS brand,
           CAST(p_size AS BIGINT) AS size_l,
           CAST(ROUND(p_retailprice, 2) AS DOUBLE) AS price2,
           'catalog' AS src
    FROM part
    ORDER BY part_id
    """,
)
def q02_projection_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure projection: column pruning reaches the scan (ReadSchema shrinks)."""
    return (
        table(spark, sf_dir, "part")
        .select(
            F.col("p_partkey").alias("part_id"),
            F.upper("p_brand").alias("brand"),
            F.col("p_size").cast("long").alias("size_l"),
            F.round("p_retailprice", 2).cast("double").alias("price2"),
            F.lit("catalog").alias("src"),
        )
        .orderBy("part_id")
    )


# --- E7: filter predicate battery --------------------------------------------
@query(
    "q03_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, CAST(o_totalprice AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderpriority LIKE '1-%'
      AND o_custkey IS NOT NULL
      AND NOT (o_orderkey % 7 = 0)
    ORDER BY o_orderkey
    """,
)
def q03_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / null / boolean-compose; all pushdown-eligible."""
    o = table(spark, sf_dir, "orders")
    return (
        o.where(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(1000, 200000)
            & F.col("o_orderpriority").like("1-%")
            & F.col("o_custkey").isNotNull()
            & ~(F.col("o_orderkey") % 7 == 0)
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("total"),
        )
        .orderBy("o_orderkey")
    )


# --- E8: broadcast hash join ---------------------------------------------------
@query(
    "q04_broadcast_join",
    oracle=f"""
    SELECT p.p_brand AS brand,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 20
    GROUP BY p.p_brand
    ORDER BY brand
    """,
)
def q04_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim via broadcast — zero shuffle of the fact table.

    Scale: the hint is deliberately DECLARED, not forced. An explicit
    ``F.broadcast`` is honored at ANY size (AQE never demotes a hint),
    so hinting a dim that grows with the data is a driver OOM at
    100 TB; ``part`` scales with SF, so the optimizer chooses — it
    broadcasts below the threshold (every fixture SF; plan-asserted)
    and falls back to a shuffle join beyond it.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_size") <= 20)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("brand")
    )


# --- E9: multi-way shuffle join (TPC-H Q5 shape) ------------------------------
@query(
    "q05_revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= DATE '1996-01-01'
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def q05_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact tables shuffle on keys, bounded dims broadcast.

    Scale: lineitem⋈orders and (beyond the auto-broadcast threshold)
    orders⋈customer are the real shuffles; nation/region are
    domain-bounded (25/5 rows) and carry explicit broadcast hints.
    customer SCALES with the data, so it is deliberately unhinted — the
    optimizer broadcasts it at fixture SFs (plan-asserted) and shuffles
    at 100 TB, where a forced hint would be a driver OOM (AQE never
    demotes an explicit hint). Filter on r_name prunes before the join
    via dynamic filters; AQE re-plans if a side is small post-filter.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("date")
    )
    li = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy("nation")
    )


# --- E9: outer joins -----------------------------------------------------------
@query(
    "q06_outer_join_order_counts",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE((CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o.o_totalprice) THEN (o.o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END), 0.0) AS spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    ORDER BY custkey
    """,
)
def q06_outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join preserving customers with zero orders; COALESCE null agg."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("spend"),
        )
        .orderBy("custkey")
    )


@query(
    "q07_full_outer_reconcile",
    oracle="""
    WITH s AS (SELECT l_suppkey AS k, COUNT(*) AS n_li FROM lineitem GROUP BY 1),
         t AS (SELECT s_suppkey AS k, s_name FROM supplier WHERE s_suppkey % 3 <> 0)
    SELECT COALESCE(s.k, t.k) AS suppkey,
           COALESCE(n_li, 0) AS n_li,
           COALESCE(s_name, '<missing>') AS name
    FROM s FULL OUTER JOIN t ON s.k = t.k
    ORDER BY suppkey
    """,
)
def q07_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the generalized copy-verification compare shape
    (reference `CommonUtils.java:99-124` compared src/dst file maps;
    symmetric diff is the fix for its src-only iteration quirk)."""
    li = table(spark, sf_dir, "lineitem")
    s = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % 3 != 0)
        .select(F.col("s_suppkey").alias("k"), "s_name")
    )
    agg = li.groupBy(F.col("l_suppkey").alias("k")).agg(F.count("*").alias("n_li"))
    return (
        agg.join(s, "k", "full_outer")
        .select(
            F.col("k").alias("suppkey"),
            F.coalesce("n_li", F.lit(0)).alias("n_li"),
            F.coalesce("s_name", F.lit("<missing>")).alias("name"),
        )
        .orderBy("suppkey")
    )


# --- E10: semi / anti joins (the reference's existence & conflict checks) -----
@query(
    "q08_semi_anti_customers",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name,
           CASE WHEN c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
                THEN 'big_spender' ELSE 'no_big_order' END AS bucket
    FROM customer
    ORDER BY custkey
    """,
)
def q08_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence predicate as semi/anti join (reference R8/R10: skip missing
    source partitions / conflict-skip on destination, `TransTablePartition.
    java:119,126` — re-expressed as metadata anti-joins)."""
    c = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").withColumn(
        "bucket", F.lit("big_spender")
    )
    anti = c.join(big, c.c_custkey == big.o_custkey, "left_anti").withColumn(
        "bucket", F.lit("no_big_order")
    )
    return (
        semi.unionByName(anti)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "bucket",
        )
        .orderBy("custkey")
    )


# --- E11: theta join -----------------------------------------------------------
@query(
    "q09_theta_size_bucket",
    oracle="""
    WITH buckets AS (
      SELECT * FROM (VALUES ('tiny', 0, 10), ('small', 11, 25), ('large', 26, 50))
        AS t(bucket, lo, hi)
    )
    SELECT b.bucket AS bucket, COUNT(*) AS n_parts,
           (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(p_retailprice) THEN (p_retailprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS price_sum
    FROM part p JOIN buckets b ON p.p_size BETWEEN b.lo AND b.hi
    GROUP BY b.bucket
    ORDER BY bucket
    """,
)
def q09_theta_size_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny literal dimension.

    Scale: the bucket table is literal → broadcast nested-loop with a cheap
    range predicate; never a cross shuffle. (The reference's analogous
    operation is the day-substring containment join, `CommonUtils.java:
    192-208` — O(days×files) driver-side; here it's a broadcast BNLJ.)
    """
    p = table(spark, sf_dir, "part")
    buckets = spark.createDataFrame(
        [("tiny", 0, 10), ("small", 11, 25), ("large", 26, 50)],
        "bucket string, lo int, hi int",
    )
    return (
        p.join(
            F.broadcast(buckets),
            (p.p_size >= buckets.lo) & (p.p_size <= buckets.hi),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_parts"),
            dsum("p_retailprice").alias("price_sum"),
        )
        .orderBy("bucket")
    )


@query(
    "q92_binned_range_join",
    oracle=f"""
    WITH promo AS (
        SELECT o_orderkey AS promo_id,
               CAST(o_orderdate AS DATE) - 15 AS wstart,
               CAST(o_orderdate AS DATE) + 15 AS wend
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 5
    )
    SELECT p.promo_id AS promo_id,
           COUNT(*) AS n_items,
           {o_dsum('l.l_quantity')} AS qty_sum
    FROM promo p
    JOIN lineitem l
      ON l.l_shipdate >= p.wstart AND l.l_shipdate < p.wend
    GROUP BY p.promo_id
    ORDER BY promo_id
    """,
)
def q92_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join where BOTH sides scale, via bin equi-join
    (`operators/rangejoin.py`): lineitems shipped inside ±15-day promo
    windows around the 5 highest-value orders.

    Complements q09 (broadcast BNLJ against a tiny literal dim): here the
    interval side is *derived from data*, and the operator's bin
    equi-join shape is what survives when it grows past broadcast size —
    a raw range-predicate join between two large tables would plan as a
    cartesian product. Locally AQE still broadcasts the 5×3-bin side,
    which is the right plan at this size; the point is the plan never
    degrades to a nested loop as intervals grow.
    """
    from ..operators.rangejoin import binned_range_join

    o = table(spark, sf_dir, "orders")
    promo = (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(5)
        .select(
            F.col("o_orderkey").alias("promo_id"),
            F.date_sub("o_orderdate", 15).alias("wstart"),
            F.date_add("o_orderdate", 15).alias("wend"),
        )
    )
    li = table(spark, sf_dir, "lineitem").select("l_shipdate", "l_quantity")
    return (
        binned_range_join(li, promo, "l_shipdate", "wstart", "wend", bin_days=16)
        .groupBy("promo_id")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_quantity").alias("qty_sum"),
        )
        .orderBy("promo_id")
    )


# --- E12: as-of join -----------------------------------------------------------
@query(
    "q10_asof_click_to_view",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id AS user_id,
           epoch_us(c.ts) AS click_us,
           v.event_id AS view_id,
           epoch_us(v.ts) AS view_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    ORDER BY click_id
    """,
)
def q10_asof_click_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's latest view at-or-before.

    Spark has no native ASOF; `operators.asof.asof_join` implements it as a
    union + ordered-window `last(ignorenulls)` — a single shuffle on
    (user_id), no row explosion. DuckDB oracle uses its native ASOF JOIN.
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    joined = asof_join(
        clicks,
        views,
        on="user_id",
        left_ts="c_ts",
        right_ts="v_ts",
        value_cols=["view_id", "v_ts"],
    )
    return joined.select(
        "click_id",
        "user_id",
        ts_micros("c_ts").alias("click_us"),
        "view_id",
        ts_micros("v_ts").alias("view_us"),
    ).orderBy("click_id")


# --- E13: aggregate battery ----------------------------------------------------
@query(
    "q11_agg_battery",
    oracle=f"""
    SELECT l_returnflag AS flag,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           {o_dsum('l_quantity')} AS sum_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           {o_davg('l_discount')} AS avg_disc,
           MIN(l_linenumber) AS min_line,
           MAX(l_linenumber) AS max_line
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY flag
    """,
)
def q11_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / count distinct / sum / min / max / avg in one hash aggregate.

    Scale: count(distinct) expands to a two-phase aggregate; min/max/sum
    stay map-side partial. Single shuffle on l_returnflag.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            dsum("l_quantity").alias("sum_qty"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
            davg("l_discount").alias("avg_disc"),
            F.min("l_linenumber").alias("min_line"),
            F.max("l_linenumber").alias("max_line"),
        )
        .orderBy("flag")
    )


# --- E13 approx: checked rows-only (no hash-exact oracle possible) -------------
@query(
    "q12_approx_distinct",
    oracle="""
    SELECT l_returnflag AS flag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           1 AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY flag
    """,
)
def q12_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB substitute for exact countDistinct
    (single pass, bounded sketch memory, no distinct-expansion shuffle).

    The sketch estimate itself cannot be reproduced by another engine, so
    the oracle checks it *differentially*: the query emits the exact count
    plus a flag asserting the estimate landed within 5% of it (HLL++ at
    rsd=0.01 is deterministic for a given dataset, so the flag is stable);
    the oracle recomputes the exact count and expects the flag to be 1.
    A drifting estimator fails the hash gate instead of hiding behind a
    rows-only check.

    Shape note: the exact and approx distinct are deliberately computed
    AFTER a (flag, orderkey) dedup rather than side by side in one agg.
    Mixing countDistinct with approx_count_distinct in a single agg makes
    Spark partial-aggregate at the (flag, orderkey) grain with a full HLL
    sketch buffer (rsd=0.01 -> 1,639 longs, ~13 KB) attached to EVERY
    partial row, so the shuffle carries |distinct keys| x 13 KB — ~27 s at
    sf0.1 and catastrophic at 100 TB. Deduping first shuffles only the two
    narrow key columns; the sketches then exist only at one-per-flag-per-
    partition granularity. HLL++ is duplicate-insensitive, so the estimate
    over the deduped set is bit-identical to the estimate over the raw
    rows. NULL keys are filtered before the dedup so ``count(*)`` keeps
    countDistinct's ignore-NULL semantics (a NULL key would otherwise
    survive dropDuplicates as one extra "distinct" row that neither
    countDistinct nor the HLL sketch would count)."""
    li = table(spark, sf_dir, "lineitem")
    deduped = (
        li.select(F.col("l_returnflag").alias("flag"), "l_orderkey")
        .where(F.col("l_orderkey").isNotNull())
        .dropDuplicates(["flag", "l_orderkey"])
    )
    return (
        deduped.groupBy("flag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
            F.count("*").alias("exact_orders"),
        )
        .select(
            "flag",
            "exact_orders",
            (
                F.abs(F.col("approx_orders") - F.col("exact_orders"))
                <= 0.05 * F.col("exact_orders")
            )
            .cast("int")
            .alias("within_5pct"),
        )
        .orderBy("flag")
    )


# --- E14: rollup / cube / grouping sets -----------------------------------------
@query(
    "q13_rollup",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n,
           {o_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    -- no-op on non-empty input; on an EMPTY shard it drops the SQL-
    -- standard grand-total row Spark's rollup never emits (q94 rule,
    -- empty-input probe r10)
    HAVING COUNT(*) > 0
    ORDER BY gid, status, priority
    """,
)
def q13_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping-id disambiguation of the <all> rows.

    Note: Spark's grouping_id() bit order is reversed vs position, so the
    gid is reconstructed from per-column grouping() bits to match DuckDB.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("total"),
            (
                F.grouping("o_orderstatus").cast("long")
                + 2 * F.grouping("o_orderpriority").cast("long")
            ).alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n",
            "total",
        )
        .orderBy("gid", "status", "priority")
    )


@query(
    "q14_cube",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '<all>') AS flag,
           COALESCE(l_linestatus, '<all>') AS status,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n,
           {o_dsum('l_quantity')} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0  -- q94 rule (empty-input probe r10)
    ORDER BY gid, flag, status
    """,
)
def q14_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 4 grouping-set combinations in one pass (expand + agg)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            dsum("l_quantity").alias("qty"),
            (
                F.grouping("l_returnflag").cast("long")
                + 2 * F.grouping("l_linestatus").cast("long")
            ).alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("status"),
            "gid",
            "n",
            "qty",
        )
        .orderBy("gid", "flag", "status")
    )


# --- E15: collect_list / collect_set --------------------------------------------
@query(
    "q15_collect_nations",
    oracle="""
    SELECT r.r_name AS region,
           array_to_string(list_sort(list(DISTINCT n.n_name)), ',') AS nations,
           COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY region
    """,
)
def q15_collect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set sorted then joined to a string — deterministic across
    engines and partition orders (raw collect_list order is not).
    (Reference analogue: grouping files by day into a multimap,
    `HDFSMerge.java:161-173`.)"""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("region")
    )


# --- E19/E20: set operations ------------------------------------------------------
@query(
    "q16_union_distinct",
    oracle="""
    SELECT k, src FROM (
      SELECT DISTINCT c_nationkey AS k, 'c' AS src FROM customer
      UNION ALL
      SELECT DISTINCT s_nationkey AS k, 's' AS src FROM supplier
    ) ORDER BY k, src
    """,
)
def q16_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two distinct projections, by name."""
    c = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("k"))
        .distinct()
        .withColumn("src", F.lit("c"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("k"))
        .distinct()
        .withColumn("src", F.lit("s"))
    )
    return c.unionByName(s).orderBy("k", "src")


@query(
    "q17_intersect_except",
    oracle="""
    SELECT k, op FROM (
      SELECT k, 'both' AS op FROM
        (SELECT DISTINCT c_nationkey AS k FROM customer
         INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      UNION ALL
      SELECT k, 'cust_only' AS op FROM
        (SELECT DISTINCT c_nationkey AS k FROM customer
         EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
    ) ORDER BY op, k
    """,
)
def q17_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT — the verification-diff primitives (reference
    R11 generalizes to `src EXCEPT dst`, SURVEY §2A)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    both = c.intersect(s).withColumn("op", F.lit("both"))
    only = c.distinct().exceptAll(s.distinct()).withColumn("op", F.lit("cust_only"))
    return both.unionByName(only).orderBy("op", "k")


# --- E21: deterministic keyed dedup ----------------------------------------------
@query(
    "q18_dedup_keep_first",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS first_order,
           epoch_us(o_orderdate) AS order_us
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) = 1
    ORDER BY custkey
    """,
)
def q18_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup with a deterministic keep rule (earliest order, orderkey
    tiebreak) — `dropDuplicates` alone keeps an arbitrary row; row_number=1
    is the reproducible form. Single shuffle on the key."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("first_order"),
            ts_micros("o_orderdate").alias("order_us"),
        )
        .orderBy("custkey")
    )


# --- E32: table-equivalence fingerprint --------------------------------------------
@query(
    "q19_verify_fingerprint",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey * 8 + l_linenumber) AS n_keys,
           {o_dsum('l_quantity')} AS qty_sum,
           {o_dsum('l_extendedprice')} AS price_sum,
           CAST(SUM(length(l_returnflag) + length(l_linestatus)) AS BIGINT) AS str_bytes,
           MIN(epoch_us(l_shipdate)) AS min_ship_us,
           MAX(epoch_us(l_shipdate)) AS max_ship_us
    FROM lineitem
    """,
)
def q19_verify_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table content fingerprint: the engine's generalization of the
    reference's post-copy verification (count + per-file size compare,
    `CommonUtils.java:99-124`) to row-level content — one scan, no shuffle
    beyond the final single-row aggregate. Used by pipelines.verify."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(
            F.col("l_orderkey") * 8 + F.col("l_linenumber")
        ).alias("n_keys"),
        dsum("l_quantity").alias("qty_sum"),
        dsum("l_extendedprice").alias("price_sum"),
        F.sum(
            F.length("l_returnflag") + F.length("l_linestatus")
        ).alias("str_bytes"),
        F.min(ts_micros("l_shipdate")).alias("min_ship_us"),
        F.max(ts_micros("l_shipdate")).alias("max_ship_us"),
    )


# --- skew handling: salted join (SCALE.md fallback path) ---------------------
@query(
    "q61_salted_join",
    oracle=f"""
    SELECT n_name,
           COUNT(*) AS n_orders,
           {o_dsum('o_totalprice')} AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q61_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators.skew): the explicit skew fallback when
    one key dominates a 100 TB fact table and AQE splitting isn't enough.
    The oracle is the PLAIN join — hash-matching it proves salting only
    refines partitioning, never changes the joined row set."""
    from ..operators.skew import salted_join

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    nation = table(spark, sf_dir, "nation")
    joined = salted_join(orders, cust, on="o_custkey", n_salt=8)
    return (
        joined.join(
            F.broadcast(nation),
            joined["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total"))
        .orderBy("n_name")
    )


# --- E14 completion: GROUPING SETS through the SQL entry surface -------------
@query(
    "q62_grouping_sets",
    oracle=f"""
    SELECT coalesce(l_returnflag, '<all>') AS rflag,
           coalesce(l_linestatus, '<all>') AS lstatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n,
           {o_dsum('l_quantity')} AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    HAVING COUNT(*) > 0  -- q94 rule (empty-input probe r10)
    ORDER BY rflag, lstatus, gid
    """,
)
def q62_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the engine's SQL entry surface
    (SURVEY §3.2: every operator reachable from spark.sql too) — the
    grouping-id disambiguates NULL-as-value from NULL-as-total."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '<all>') AS rflag,
               coalesce(l_linestatus, '<all>') AS lstatus,
               GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
               COUNT(*) AS n,
               -- Spark-SQL form of dterm (ISFINITE is DuckDB-only):
               -- abs(NaN/inf/1e154) fails both branch tests, so
               -- non-finite AND beyond-2^53 quantities fall out as
               -- NULL exactly like the oracle (the unguarded units
               -- branch was an ANSI decimal-overflow job-killer —
               -- hostile-value probe, r12).
               CAST(ROUND(SUM(
                 CASE WHEN ABS(l_quantity) < 1e9
                        THEN CAST(l_quantity AS DECIMAL(38,6))
                      WHEN ABS(l_quantity) < 9007199254740992
                        THEN CAST(CAST(l_quantity AS DECIMAL(38,0))
                                  AS DECIMAL(38,6))
                 END), 6) AS double) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY rflag, lstatus, gid
        """
    )


# --- distribution statistics: exact percentiles ------------------------------
@query(
    "q65_percentiles",
    oracle="""
    SELECT o_orderstatus,
           CAST(ROUND(quantile_cont(o_totalprice, 0.5), 6) AS DOUBLE) AS p50,
           CAST(ROUND(quantile_cont(o_totalprice, 0.9), 6) AS DOUBLE) AS p90,
           CAST(ROUND(quantile_cont(o_totalprice, 0.99), 6) AS DOUBLE) AS p99,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q65_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`, both linear-interpolating). Exact percentile
    needs the group's values together (one shuffle); at 100 TB swap in
    `approx_percentile` (mergeable t-digest-style sketch, map-side
    combine) and check with tolerance instead of hash."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


# --- reshape: pivot ----------------------------------------------------------
@query(
    "q66_pivot",
    oracle=f"""
    SELECT n_name,
           {o_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS f_total,
           {o_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS o_total,
           {o_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS p_total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q66_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order totals to one column per status (explicit value list —
    at scale an unlisted pivot triggers a distinct-scan planning job;
    always enumerate). Equivalent to conditional aggregation, which is
    exactly what the oracle states."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    # customer scales with the data: no broadcast hint (the optimizer
    # broadcasts it at fixture SFs, shuffles at 100 TB); nation is
    # domain-bounded and stays hinted.
    joined = o.join(
        c, o["o_custkey"] == c["c_custkey"]
    ).join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    pivoted = (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(_dec_out(F.sum(dterm("o_totalprice", 6)), 6))
    )
    return pivoted.select(
        "n_name",
        F.col("F").alias("f_total"),
        F.col("O").alias("o_total"),
        F.col("P").alias("p_total"),
    ).orderBy("n_name")


# --- reshape: unpivot (stack) ------------------------------------------------
@query(
    "q67_unpivot",
    oracle="""
    SELECT c_custkey, metric, CAST(ROUND(val, 6) AS DOUBLE) AS val
    FROM (
        SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    WHERE c_custkey <= 100
    ORDER BY c_custkey, metric
    """,
)
def q67_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide columns to (key, metric, value) rows via `stack` —
    the melt operation; narrow-row output shuffles nothing (pure
    projection + generator)."""
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 100)
    return (
        c.select(
            "c_custkey",
            F.expr(
                "stack(2, 'acctbal', c_acctbal,"
                " 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)"
            ),
        )
        .select("c_custkey", "metric", F.round("val", 6).alias("val"))
        .orderBy("c_custkey", "metric")
    )


@query(
    "q104_histogram",
    oracle=f"""
    SELECT CAST(LEAST(FLOOR(o_totalprice / 30000), 19) AS BIGINT) AS bin,
           COUNT(*) AS n,
           {o_dsum('o_totalprice')} AS price_sum
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
)
def q104_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (width_bucket semantics:
    floor-divide into 30k-wide bins, clamp the overflow tail into the
    last bin). Pure integer arithmetic before a 20-group hash aggregate —
    the map-side partials reduce each partition to ≤20 rows, so shuffle
    volume is O(bins × tasks) at any table size."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.least(
                F.floor(F.col("o_totalprice") / 30000).cast("bigint"),
                F.lit(19).cast("bigint"),
            ).alias("bin")
        )
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("price_sum"))
        .orderBy("bin")
    )


@query(
    "q109_ntile_deciles",
    oracle=f"""
    WITH t AS (
        SELECT o_orderstatus, o_totalprice,
               ntile(10) OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    SELECT o_orderstatus, decile, COUNT(*) AS n,
           CAST(ROUND(MIN(o_totalprice), 6) AS DOUBLE) AS lo,
           CAST(ROUND(MAX(o_totalprice), 6) AS DOUBLE) AS hi,
           {o_dsum('o_totalprice')} AS price_sum
    FROM t GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q109_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing per group (quantile feature binning): ntile(10)
    with a total order (price, key) so bucket boundaries are
    deterministic, then per-bucket extents — the classic feature
    transform before model training. One window shuffle per group key;
    at 100 TB swap ntile for approx-quantile cutpoints (q111) to avoid
    materializing a total order per group."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    t = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.ntile(10).over(w).alias("decile"),
    )
    return (
        t.groupBy("o_orderstatus", "decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 6).cast("double").alias("lo"),
            F.round(F.max("o_totalprice"), 6).cast("double").alias("hi"),
            dsum("o_totalprice").alias("price_sum"),
        )
        .orderBy("o_orderstatus", "decile")
    )


@query(
    "q111_approx_percentile_diff",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS DOUBLE)
             AS p50_exact,
           CAST(ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS DOUBLE)
             AS p95_exact,
           TRUE AS approx_within_2pct
    FROM lineitem
    GROUP BY 1 ORDER BY 1
    """,
)
def q111_approx_percentile_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles, differentially checked (q12 pattern):
    emit the exact interpolated p50/p95 plus a flag that
    `approx_percentile` (mergeable quantile sketch, map-side combine —
    the only percentile that scales to 100 TB) lands within 2% of exact.
    The oracle reproduces the exact values and pins the flag TRUE."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50_exact"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95_exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("a95"),
    )
    return agg.select(
        "l_returnflag",
        "p50_exact",
        "p95_exact",
        (
            (F.abs(F.col("a50") - F.col("p50_exact")) <= 0.02 * F.col("p50_exact"))
            & (F.abs(F.col("a95") - F.col("p95_exact")) <= 0.02 * F.col("p95_exact"))
        ).alias("approx_within_2pct"),
    ).orderBy("l_returnflag")


@query(
    "q116_exact_correlation",
    oracle="""
    WITH s AS (
        SELECT l_returnflag, COUNT(*) AS n,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) AS sx,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) AS sy,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)
                   * CAST(l_quantity AS DECIMAL(38,6))) AS sxx,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)
                   * CAST(l_extendedprice AS DECIMAL(38,6))) AS syy,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)
                   * CAST(l_extendedprice AS DECIMAL(38,6))) AS sxy
        FROM lineitem
        -- Exact-moment domain (q232 rule, r11): corrupt-magnitude
        -- measures leave the decimal square envelope.
        WHERE ABS(l_quantity) < 1000000000.0
          AND ABS(l_extendedprice) < 1000000000.0
        GROUP BY 1
    )
    SELECT l_returnflag, n,
           CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS DOUBLE)
             AS corr_qty_price
    FROM s ORDER BY l_returnflag
    """,
)
def q116_exact_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal moment sums (n, Σx, Σy,
    Σx², Σy², Σxy) — unlike `corr()`, whose fp accumulation order varies
    with partitioning, the closed form over decimal partials is
    bit-identical on any cluster layout. One hash aggregation; the six
    moments ride a single map-side-combined pass."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.abs("l_quantity") < 1e9) & (F.abs("l_extendedprice") < 1e9)
    )  # exact-moment domain (r11)
    x = F.col("l_quantity").cast(DEC)
    y = F.col("l_extendedprice").cast(DEC)
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = F.sqrt(
        (n * F.col("sxx") - sx * sx).cast("double")
        * (n * F.col("syy") - sy * sy).cast("double")
    )
    return s.select(
        "l_returnflag",
        "n",
        F.round(num / den, 6).cast("double").alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@query(
    "q117_group_trend_ols",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority AS prio,
               datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS x,
               COUNT(*) AS y
        FROM orders GROUP BY 1, 2
    ),
    s AS (
        SELECT prio, COUNT(*) AS n,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(x) THEN (x) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(x) THEN (x) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(x) THEN (x) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(x) THEN (x) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) AS sx,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(y) THEN (y) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(y) THEN (y) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(y) THEN (y) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(y) THEN (y) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) AS sy,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(x) THEN (x) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(x) THEN (x) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(x) THEN (x) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(x) THEN (x) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END) * CAST(x AS DECIMAL(38,6))) AS sxx,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(x) THEN (x) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(x) THEN (x) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(x) THEN (x) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(x) THEN (x) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END) * CAST(y AS DECIMAL(38,6))) AS sxy
        FROM daily GROUP BY 1
    )
    SELECT prio, n,
           CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE), 8) AS DOUBLE) AS slope,
           CAST(ROUND(CAST(sy AS DOUBLE) / n
                      - CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                                   / CAST(n * sxx - sx * sx AS DOUBLE), 8)
                             AS DOUBLE)
                        * CAST(sx AS DOUBLE) / n, 4) AS DOUBLE) AS intercept
    FROM s ORDER BY prio
    """,
)
def q117_group_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group trend line: closed-form OLS (slope, intercept) of daily
    order volume against the day index, from the same exact decimal
    moment machinery as q116. This is regression as a GROUP BY — one
    shuffle on (group, day) for the grain, one on group for the moments;
    no iterative solver, no driver math. The scalable form of 'fit a
    trend per key' for millions of keys."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("x"),
    ).agg(F.count("*").alias("y"))
    xd = F.col("x").cast(DEC)
    yd = F.col("y").cast(DEC)
    s = daily.groupBy("prio").agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * yd).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = F.round(
        (n * F.col("sxy") - sx * sy).cast("double")
        / (n * F.col("sxx") - sx * sx).cast("double"),
        8,
    ).cast("double")
    return s.select(
        "prio",
        "n",
        slope.alias("slope"),
        F.round(
            sy.cast("double") / n - slope * sx.cast("double") / n, 4
        ).cast("double").alias("intercept"),
    ).orderBy("prio")


@query(
    "q136_agg_battery_modern",
    # max_by/min_by need a total order to be cross-engine deterministic:
    # o_totalprice can tie, so the comparison value is the exact integer
    # cents(price)·10¹² + key (HUGEINT in DuckDB, DECIMAL(38,0) in
    # Spark) — lexicographic (price, key) at ANY scale. (A float
    # perturbation price + key/1e10 was tried first: it crosses the
    # $0.01 quantum once keys exceed ~1e8, silently mis-picking rows at
    # large sf.) cents = round(price·100): same double product, same
    # rounding in both engines.
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 400000) AS any_jumbo,
           CAST(ROUND(ROUND(median(o_totalprice), 9), 6) AS DOUBLE)
             AS median_price,
           arg_max(o_orderkey,
                   CAST(LEAST(GREATEST(ROUND(o_totalprice * 100),
                                       -100000000000000000.0),
                              100000000000000000.0) AS HUGEINT)
                    * 1000000000000 + o_orderkey) AS top_order,
           arg_min(o_orderkey,
                   CAST(LEAST(GREATEST(ROUND(o_totalprice * 100),
                                       -100000000000000000.0),
                              100000000000000000.0) AS HUGEINT)
                    * 1000000000000 + o_orderkey) AS bottom_order
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q136_agg_battery_modern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern aggregate battery (Spark 3.4+/4 surface): count_if,
    bool_and/bool_or, exact interpolated median, and max_by/min_by
    (DuckDB arg_max/arg_min) — the declarative forms of filters-then-
    count, any/all flags, and keep-the-row-that-wins lookups that
    otherwise each cost a self-join. All are map-side combinable hash
    aggregates except median, whose exact form needs per-group sorted
    values — at 100 TB swap it for approx_percentile (q111 covers the
    sketch differential); here the exact value is the point. The median
    is rounded at 1e-9 before the output rounding so Spark-vs-DuckDB
    midpoint-interpolation ulp differences cannot flip the 1e-6 digit
    (q124 pattern)."""
    o = table(spark, sf_dir, "orders")
    # Cents clamped to ±1e17 (an exact power of ten in BOTH engines'
    # conversions) so a ±inf or beyond-envelope price still ranks
    # deterministically at the extreme instead of crashing the HUGEINT
    # cast (r11 money probe); ties at the sentinel break on the key.
    cents = F.least(
        F.greatest(F.round(F.col("o_totalprice") * 100, 0), F.lit(-1e17)),
        F.lit(1e17),
    )
    tiekey = (
        cents.cast("decimal(38,0)") * F.lit(1_000_000_000_000)
        + F.col("o_orderkey")
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
            F.round(F.round(F.median("o_totalprice"), 9), 6)
            .cast("double")
            .alias("median_price"),
            F.max_by(F.col("o_orderkey"), tiekey).alias("top_order"),
            F.min_by(F.col("o_orderkey"), tiekey).alias("bottom_order"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q146_correlated_subquery",
    oracle="""
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(s.s_acctbal, 6) AS DOUBLE) AS acctbal
    FROM supplier s
    WHERE s.s_acctbal > (SELECT AVG(s2.s_acctbal)
                         FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 45)
    ORDER BY s.s_suppkey
    """,
)
def q146_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subqueries — the declarative form users write and
    Catalyst DECORRELATES into joins (no per-row re-execution, which is
    what a naive engine does and what dies at scale): a correlated
    scalar aggregate (supplier above its own nation's average balance →
    rewritten to an aggregate + equi-join) and a correlated EXISTS
    (supplier with a ≥45-quantity lineitem → left-semi join). The plan
    must contain ONLY joins/aggregates — the subqueries disappear. The
    oracle runs the identical SQL text. The avg comparison keeps raw
    doubles on both sides: both engines compute the same
    sum-of-doubles/count over the same per-nation value sets, and the
    threshold rows are far from the boundary (asserted by the test's
    plan check, not by value luck — the filter itself is
    engine-identical arithmetic)."""
    for t in ("supplier", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"q146_{t}")
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name,
               CAST(ROUND(s.s_acctbal, 6) AS DOUBLE) AS acctbal
        FROM q146_supplier s
        WHERE s.s_acctbal > (SELECT AVG(s2.s_acctbal)
                             FROM q146_supplier s2
                             WHERE s2.s_nationkey = s.s_nationkey)
          AND EXISTS (SELECT 1 FROM q146_lineitem l
                      WHERE l.l_suppkey = s.s_suppkey
                        AND l.l_quantity >= 45)
        ORDER BY s.s_suppkey
        """
    )


@query(
    "q153_geo_radius_join",
    # Coordinates are integer-derived (exact in float64 after one
    # division), the haversine is the same expression tree in both
    # engines, and the distance is pre-rounded at 1e-9 before the
    # 25 km threshold (q124 pattern) so a libm last-ulp difference
    # cannot flip a boundary pair. Longitude cells wrap modulo 180 so
    # pairs straddling the antimeridian stay candidates.
    oracle="""
    WITH pts AS (
        SELECT c_custkey AS id,
               -60 + (CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6)
                      AS BIGINT) % 12000) / 100.0 AS lat,
               -180 + (CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 7, 6)
                       AS BIGINT) % 36000) / 100.0 AS lon
        FROM customer
    ),
    cells AS (
        SELECT id, lat, lon,
               CAST(floor(lat / 2) AS BIGINT) AS cy,
               CAST(floor(lon / 2) AS BIGINT) AS cx
        FROM pts
    ),
    lhs AS (
        SELECT id, lat, lon, cy + dy AS cy,
               ((cx + dx + 270) % 180) - 90 AS cx
        FROM cells
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy)
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx)
    ),
    cand AS (
        SELECT a.id AS id_a, b.id AS id_b,
               ROUND(2 * 6371.0 * asin(sqrt(
                   sin(radians(b.lat - a.lat) / 2)
                     * sin(radians(b.lat - a.lat) / 2)
                   + cos(radians(a.lat)) * cos(radians(b.lat))
                     * sin(radians(b.lon - a.lon) / 2)
                     * sin(radians(b.lon - a.lon) / 2))), 9) AS d
        FROM lhs a JOIN cells b ON a.cy = b.cy AND a.cx = b.cx
        WHERE a.id < b.id
    )
    SELECT id_a, id_b, CAST(ROUND(d, 6) AS DOUBLE) AS dist_km
    FROM (SELECT DISTINCT id_a, id_b, d FROM cand)
    WHERE d <= 25.0
    ORDER BY id_a, id_b
    """,
)
def q153_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join (all point pairs within 25 km): the
    grid-cell blocking pattern — each point lands in a 2°×2° cell, one
    side fans out to its 3×3 cell neighborhood, and the join is an
    EQUI-join on cell id, so candidate cost is density-bounded instead
    of quadratic (the same bucketing role LSH bands play for text).
    Haversine runs only on candidates. Cell size must dominate the
    radius at the worst latitude (2° ≈ 222 km N-S; 25 km E-W needs
    ≤ 1.1° even at 60° lat) and longitude cells wrap modulo 180, so the
    ±1 neighborhood is complete including across the antimeridian.
    At 100 TB the cell id is the shuffle key — skewed cities need
    sub-cell salting (q61's operators/skew; the SCALE.md round-9 probe
    shows AQE skew-split cannot be assumed to fire). Coordinates here
    are synthesized from md5(customer key) — hash-uniform, so close
    pairs actually exist (a linear-congruential synthesis placed points
    on a lattice with NO sub-25 km pairs — found by the 0-row driver
    check); swap in real lat/lon columns unchanged."""
    c = table(spark, sf_dir, "customer")
    h = F.md5(F.col("c_custkey").cast("string"))
    h1 = F.conv(F.substring(h, 1, 6), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 7, 6), 16, 10).cast("long")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (F.lit(-60) + (h1 % 12000) / 100.0).alias("lat"),
        (F.lit(-180) + (h2 % 36000) / 100.0).alias("lon"),
    )
    cells = pts.select(
        "id", "lat", "lon",
        F.floor(F.col("lat") / 2).cast("long").alias("cy"),
        F.floor(F.col("lon") / 2).cast("long").alias("cx"),
    )
    lhs = (
        cells.crossJoin(F.broadcast(
            spark.range(-1, 2).select(F.col("id").cast("long").alias("dy"))
        ))
        .crossJoin(F.broadcast(
            spark.range(-1, 2).select(F.col("id").cast("long").alias("dx"))
        ))
        .select(
            "id", "lat", "lon",
            (F.col("cy") + F.col("dy")).alias("cy"),
            # wrap: lon cells form a ring of 180 (2°) cells; without the
            # modulo, pairs straddling the ±180° antimeridian are never
            # candidates (blocking bug both engines would share).
            ((F.col("cx") + F.col("dx") + 270) % 180 - 90).alias("cx"),
        )
    )
    a = lhs.select(
        F.col("id").alias("id_a"), F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"), "cy", "cx",
    )
    b = cells.select(
        F.col("id").alias("id_b"), F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"), "cy", "cx",
    )
    dlat = F.radians(F.col("lat_b") - F.col("lat_a")) / 2
    dlon = F.radians(F.col("lon_b") - F.col("lon_a")) / 2
    hav = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians("lat_a")) * F.cos(F.radians("lat_b"))
        * F.sin(dlon) * F.sin(dlon)
    )
    d = F.round(2 * 6371.0 * F.asin(F.sqrt(hav)), 9)
    cand = (
        a.join(b, ["cy", "cx"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d.alias("d"))
        .distinct()
    )
    return (
        cand.where(F.col("d") <= 25.0)
        .select("id_a", "id_b", F.round(F.col("d"), 6).alias("dist_km"))
        .orderBy("id_a", "id_b")
    )


@query(
    "q185_share_of_total",
    # Shares divide an exact decimal nation sum by its exact region /
    # grand totals (window sums of decimals are order-independent);
    # casts and operand order mirror the oracle before the 1e-6 round.
    oracle=f"""
    WITH nat AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount)) THEN (l.l_extendedprice * (1 - l.l_discount)) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount)) THEN (l.l_extendedprice * (1 - l.l_discount)) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount)) THEN (l.l_extendedprice * (1 - l.l_discount)) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount)) THEN (l.l_extendedprice * (1 - l.l_discount)) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) AS rev
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation,
           (CASE WHEN ABS(rev) < 1000000000 THEN CAST(ROUND(rev, 6) AS DOUBLE) ELSE CAST(CAST(ROUND(rev, 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS revenue,
           CAST(ROUND(CAST(rev AS DOUBLE)
                      / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE),
                      6) AS DOUBLE) AS share_of_region,
           CAST(ROUND(CAST(rev AS DOUBLE)
                      / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS DOUBLE)
             AS share_of_total
    FROM nat
    ORDER BY region, nation
    """,
)
def q185_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total report: each supplier nation's revenue as a
    share of its region and of the grand total — the two-level BI
    ratio every dashboard needs, expressed as window aggregates OVER
    the nation-level aggregate (25 rows), never a second pass over the
    fact table. The empty-frame `SUM() OVER ()` grand total is computed
    on the same 25-row table, so the 'global window' scale trap does
    not apply: windows here cost O(dimension), the single fact shuffle
    is the groupBy. Decimal sums make both ratios engine- and
    partitioning-exact before rounding."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        dterm(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
        ).alias("v"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("v").alias("rev"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return nat.select(
        "region",
        "nation",
        _dec_out(F.col("rev"), 6).alias("revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(w_region).cast("double"),
            6,
        )
        .cast("double")
        .alias("share_of_region"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(w_all).cast("double"),
            6,
        )
        .cast("double")
        .alias("share_of_total"),
    ).orderBy("region", "nation")


@query(
    "q186_late_shipment_orders",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    -- CAST..AS DATE pins the same day-truncation Spark's
                    -- date_add performs (the q158 oracle precedent), so a
                    -- non-midnight order timestamp cannot diverge engines.
                    AND l.l_shipdate > CAST(o.o_orderdate AS DATE) + 60)
    GROUP BY 1
    ORDER BY 1
    """,
)
def q186_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: one quarter's orders that
    had at least one line item shipped more than 60 days after the
    order date, counted per priority. The silhouette is a correlated
    EXISTS whose predicate references BOTH sides (l_shipdate vs
    o_orderdate + 60d) — Spark expresses it directly as a left-semi
    join carrying the cross-side condition (the decorrelated form
    Catalyst would produce; q146 asserts decorrelation for the scalar
    flavor). The semi join shuffles on orderkey with the extra
    predicate evaluated inside the join — no second pass, no
    pre-aggregation of lineitem needed since semi stops at first
    match. At 100 TB the quarter filter prunes the orders scan first,
    so the join's left side is one quarter of orders."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )
