"""Round-4 star-schema benchmark shapes (q168-q173): the remaining
classic TPC-H query silhouettes expressible over the driver fixtures —
volume shipping (Q7), market share (Q8), returned-item revenue (Q10),
customer order-count distribution (Q13), promo revenue ratio (Q14), and
inactive high-balance customers (Q22).

These complete the optimizer-facing benchmark family started by
q01 (Q1 shape), q05 (Q5), q158 (Q3), and q162 (Q18): each exercises a
distinct plan silhouette — multi-dimension snowflake joins with paired
nation predicates, conditional-share aggregation, agg-then-top-k,
left-outer two-level aggregation, single-row ratio reports, and
scalar-subquery + anti-join. The reference has no counterpart for any of
this (it moves partition bytes; TransTablePartition.java:115-139) — these
queries exist because a Spark engine replacing it must serve the
warehouse's analytical load, and TPC-H silhouettes are the lingua franca
the optimizer literature grades plans with.

Scale notes (100 TB): every join below is either a dimension broadcast
(region/nation/supplier/part are GB-scale at TPC-H 100 TB — below or
near the AQE broadcast threshold; none is FORCE-broadcast, so AQE demotes
to shuffle join if stats disagree) or an equi-join on the fact key
(near-uniform TPC-H keys; if a deployment's keys skew, q61's
salted_join is the measured fallback — the SCALE.md round-9 probe shows
AQE skew-split cannot be assumed to fire). Aggregates are decimal-partial
(map-side combine, order-independent). No window runs over an unbounded
table: q170's top-20 is agg-then-TakeOrdered, q171's distribution
aggregates an O(customers) table down to O(distinct counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .base import DEC, _dec_out, dsum, dterm, o_dsum, o_dterm, query

# Shared revenue expression: exact decimal so partial-aggregation order
# (and engine) cannot move the result. Built lazily — Column construction
# needs an active session, and this module imports at registration time.
def _vol():
    return dterm(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)


# dterm-guarded volume term (r11 money probe: a single inf or ±1e15
# price must not crash or skew the decimal revenue staging).
_O_VOL = o_dterm("l_extendedprice * (1 - l_discount)", 6)


@query(
    "q168_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q168_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped volume shipping: bilateral trade revenue between
    two nations by ship year. Plan silhouette: the fact table joins two
    *independent* dimension chains (supplier→nation and
    orders→customer→nation) that must both survive before the paired
    nation predicate can fire — the classic test of join ordering +
    pushing a disjunctive cross-chain filter. Spark evaluates the pair
    predicate after the snowflake resolves; nation (25 rows) broadcasts
    into both chains, supplier broadcasts, and the orders⋈customer and
    lineitem⋈orders joins are key-partitioned shuffles AQE sizes. At
    100 TB the date filter prunes l_shipdate row groups at the parquet
    scan (PushedFilters), so only two years of fact rows shuffle."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, s.s_nationkey == F.col("sn_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(_vol()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q169_market_share",
    # Both sums are exact decimals; the share divides their double casts
    # in IDENTICAL operand order in both engines, then rounds at 1e-6.
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               {_O_VOL} AS v,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE p.p_type = 'ECONOMY' AND r.r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v
                               ELSE CAST(0 AS DECIMAL(38,6)) END), 6)
                AS DOUBLE) AS nation_volume,
           CAST(ROUND(SUM(v), 6) AS DOUBLE) AS total_volume,
           CAST(ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v
                                    ELSE CAST(0 AS DECIMAL(38,6)) END)
                           AS DOUBLE)
                      / CAST(SUM(v) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM vol
    GROUP BY 1
    ORDER BY 1
    """,
)
def q169_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: NATION_3's share of ECONOMY-part
    revenue sold into the ASIA customer region, per order year. The
    silhouette is the deepest snowflake in the suite — seven tables, two
    nation aliases, region on the customer chain, part on the fact — with
    a conditional-share aggregation on top. The selective ``p_type``
    filter makes part the driving dimension: it broadcasts pre-filtered,
    shrinking the fact stream before the wider joins (at 100 TB the
    filtered part side is the AQE broadcast candidate; the orders join
    stays a key shuffle). The share is computed from exact decimal
    partials — numerator and denominator ride ONE aggregate, so no
    second pass over the joined stream."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast(DEC)
    nat = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", _vol()).otherwise(zero)
    )
    tot = F.sum(_vol())
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, c.c_nationkey == F.col("cn_key"))
        .join(r, F.col("cn_region") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(nat, 6).cast("double").alias("nation_volume"),
            F.round(tot, 6).cast("double").alias("total_volume"),
            F.round(nat.cast("double") / tot.cast("double"), 6)
            .cast("double")
            .alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@query(
    "q170_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q170_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: the 20 customers who
    returned the most revenue in a half-year window. Silhouette:
    selective fact filter (returnflag + order date) → star join →
    per-customer aggregate → global top-k. The top-k runs AFTER the
    aggregate, so it sorts the O(customers-with-returns) result, never
    the fact stream, and Spark plans it as TakeOrderedAndProject
    (per-partition heap + driver merge of 20-row heads — no global
    sort). Ties on revenue break by c_custkey so the LIMIT boundary is
    deterministic in both engines. The o_orderdate filter lands on the
    orders scan; at 100 TB a date-partitioned orders table prunes to
    six months of partitions before the join."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum(_vol()).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q171_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders
                   WHERE o_orderpriority <> '4-NOT SPECIFIED') o
          ON c.c_custkey = o.o_custkey
        GROUP BY 1
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q171_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer distribution: how many customers placed
    exactly k qualifying orders, including the zero-order customers only
    a LEFT join can surface. Two-level aggregation silhouette: the first
    groupBy is keyed on the (already co-partitioned) join key, so AQE
    plans join+agg in one exchange; the second aggregates the
    O(customers) table down to O(distinct counts) — tiny. COUNT(col)
    null-skipping over the outer join's unmatched side is the semantic
    under test (q166's battery pins the scalar rules; this is the
    plan-shape twin). At 100 TB: one shuffle on custkey, one on the
    count value, nothing else."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_orderkey", "o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q172_promo_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_O_VOL}
                               ELSE CAST(0 AS DECIMAL(38,6)) END), 6)
                AS DOUBLE) AS promo_revenue,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue,
           CAST(ROUND(100 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                          THEN {_O_VOL}
                                          ELSE CAST(0 AS DECIMAL(38,6)) END)
                                 AS DOUBLE)
                      / CAST(SUM({_O_VOL}) AS DOUBLE), 6) AS DOUBLE)
             AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1997-03-01'
      AND l.l_shipdate < DATE '1997-04-01'
    """,
)
def q172_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo effect: the share of one month's revenue
    attributable to PROMO-type parts, as a single-row report. Silhouette:
    tight date filter on the fact scan (row-group pruning), one broadcast
    join to part, one global aggregate whose conditional numerator and
    denominator are computed in the same pass from exact decimal
    partials — the ratio is a projection over one 1-row aggregate, never
    a self-join of two aggregates. The global (group-less) aggregate is
    the one shape where Spark's partial/final split matters most at
    100 TB: partials are one decimal per task, the final reduce is one
    row."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast(DEC)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _vol()).otherwise(zero))
    tot = F.sum(_vol())
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(promo, 6).cast("double").alias("promo_revenue"),
            F.round(tot, 6).cast("double").alias("total_revenue"),
            F.round(
                F.lit(100) * promo.cast("double") / tot.cast("double"), 6
            )
            .cast("double")
            .alias("promo_pct"),
        )
    )


@query(
    "q173_inactive_high_balance",
    # The threshold is a scalar subquery: exact decimal sum / count cast
    # to double in identical operand order, so the strict > comparison
    # sees the same boundary in both engines.
    oracle="""
    WITH thr AS (
        SELECT CAST(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(c_acctbal) THEN (c_acctbal) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(c_acctbal) THEN (c_acctbal) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(c_acctbal) THEN (c_acctbal) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(c_acctbal) THEN (c_acctbal) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) AS DOUBLE)
               / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS numcust,
           (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(c.c_acctbal) THEN (c.c_acctbal) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END)
             AS totacctbal
    FROM customer c CROSS JOIN thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY 1
    ORDER BY 1
    """,
)
def q173_inactive_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped churn opportunity: customers whose balance beats
    the positive-balance average but who have placed NO order since
    2000-01-01 (every fixture customer has ordered at least once, so
    the Q22 "never ordered" literal reading is vacuously empty — the
    recency cutoff keeps the result non-trivial at every SF while
    preserving both silhouettes). Two silhouettes compose: a scalar
    aggregate subquery (1-row threshold broadcast into the filter —
    Spark never recomputes it per row) and a left-anti join against
    the date-filtered orders for the NOT EXISTS. The anti join is the
    scale hinge: it shuffles on custkey (or broadcasts the filtered
    customer side when small), never a NOT IN that degenerates to a
    nested loop under nullable keys — custkey is non-null by schema,
    and q166 pins the null-semantics rules this shape depends on. At
    100 TB the orders side pushes the date predicate to the scan and
    ships only its custkey column into the anti join."""
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    thr = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(dterm("c_acctbal", 6)).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q193_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               {o_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1997-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q193_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: the supplier(s) whose quarterly
    revenue equals the maximum over all suppliers — the
    scalar-subquery-over-an-aggregate silhouette (Q15's CREATE VIEW
    reduces to exactly this). The revenue aggregate is computed ONCE
    and reused by both the max and the equality filter (same logical
    subtree; with decimal-rounded revenue the equality is exact, so
    ties surface every maximal supplier, not an arbitrary one — the
    semantic difference from a top-1 LIMIT). Plan: quarter-pruned fact
    scan → supplier-keyed agg → 1-row max broadcast back — the
    supplier join is dimension-sized. At 100 TB nothing here sorts the
    fact stream."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_vol()).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q194_forecast_revenue",
    oracle="""
    SELECT (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice * l_discount) THEN (l_extendedprice * l_discount) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END)
             AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q194_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue change: the revenue that WOULD
    have been earned had small-quantity mid-discount lines shipped a
    year at full price — a pure scan-filter-aggregate with three
    conjunctive predicates and no join. This is the query that tests
    predicate pushdown end-to-end: all three filters must reach the
    parquet scan (row-group min/max skipping on date and discount), and
    the aggregate is one decimal partial per task. On a date-partitioned
    100 TB table the year predicate prunes partitions before any I/O;
    plan-asserted in tests/test_plans.py."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _dec_out(
            F.sum(
                dterm(F.col("l_extendedprice") * F.col("l_discount"), 6)
            ),
            6,
        ).alias("revenue_delta"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q207_small_qty_revenue",
    # TPC-H Q17 silhouette. The per-part average is decimal-summed
    # (exact, order-independent) and the 0.2 threshold comparison uses
    # the same rounded-double average in both engines; the final
    # revenue sum is decimal then /7.0, rounded at 1e-6.
    oracle=f"""
    WITH avgq AS (
        SELECT l_partkey,
               (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) / COUNT(*)) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) / COUNT(*)) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) / COUNT(*), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) / COUNT(*), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_quantity) THEN (l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) / COUNT(*), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS aq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE)
                / 7.0, 6) AS DOUBLE) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avgq a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size <= 10
      AND l.l_quantity < 0.2 * a.aq
    """,
)
def q207_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 silhouette (small-quantity-order revenue): lines whose
    quantity is below 20% of their part's average quantity, for one
    brand's small parts (p_container doesn't exist in the fixture;
    p_size <= 10 stands in as the second selective predicate —
    TPC-H 2.17.3 semantics otherwise intact). The correlated AVG is
    decorrelated into one per-part aggregate joined back on partkey —
    never a per-row subquery; at 100 TB the brand filter prunes the
    part side to broadcast size and AQE keys both joins on partkey."""
    li = table(spark, sf_dir, "lineitem")
    avgq = li.groupBy("l_partkey").agg(
        # _dec_out mirrors the oracle's o_dec_out magnitude branch on
        # the mean: >= 1e9 rounds to whole units on both engines
        # (advisor, r11).
        _dec_out(
            F.sum(dterm("l_quantity", 6)) / F.count("*"), 6
        ).alias("aq")
    )
    p = (
        table(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avgq, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            F.round(
                F.round(F.sum(dterm("l_extendedprice", 6)), 6).cast(
                    "double"
                )
                / 7.0,
                6,
            )
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").alias("n_small_lines"),
        )
    )


@query(
    "q208_discount_brackets",
    # TPC-H Q19 silhouette: OR-of-ANDs across the join. Revenue is
    # decimal-summed; quantities/sizes are exact.
    oracle=f"""
    SELECT {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q208_discount_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 silhouette (disjunctive bracket revenue): three
    brand/size/quantity brackets OR-ed together ACROSS the part-lineitem
    join. The single-table parts of the disjunction (brand IN, size <=
    15, quantity 1-30) are pre-pushed to each scan so the join input
    shrinks before the residual OR filter — the pattern Catalyst
    applies via constraint propagation, stated explicitly here so the
    pushdown survives refactors; the join itself stays a keyed equi
    join (never a nested loop over the OR)."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 30)
    )
    p = table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size").between(1, 15))
    )
    joined = li.join(p, li.l_partkey == p.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.where(bracket).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


@query(
    "q209_profit_by_nation_year",
    # TPC-H Q9 silhouette. The fixture has no partsupp table, so unit
    # cost is the deterministic stand-in 0.9 * p_retailprice (stated in
    # the docstring); profit sums run in DECIMAL and round at 1e-6.
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) THEN (l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%a%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    ORDER BY nation, o_year
    """,
)
def q209_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 silhouette (product-type profit by supplier nation and
    order year): the 5-table snowflake join with a per-line profit
    expression. The fixture carries no partsupp table, so
    ps_supplycost is replaced by the deterministic 0.9*p_retailprice —
    the JOIN SHAPE (fact + orders + supplier→nation + part with a
    name-pattern filter) is what this query locks in. At 100 TB:
    nation/supplier/filtered-part broadcast by measured size, the
    orders join keys on orderkey, and the profit aggregate is
    decimal-partial (map-side combine)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%a%"))
        .select("p_partkey", "p_retailprice")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.9
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            _dec_out(F.sum(dterm(profit, 6)), 6)
            .alias("profit")
        )
        .orderBy("nation", "o_year")
    )
