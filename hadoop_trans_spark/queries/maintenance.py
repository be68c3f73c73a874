"""Table-maintenance queries: upsert merge and snapshot diff
(operators/merge.py) — the row-level generalization of the reference's
copy/diff job (reference ``CommonUtils.java:99-124``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.merge import merge_upsert, snapshot_diff
from .base import _dec_out, dsum, dterm, o_dsum, query
from ..tmputil import staging_dir


def _changes(orders: DataFrame) -> DataFrame:
    """Deterministic change set: +10.0 price updates for keys % 7 == 0,
    inserts (key + 10M, status 'N') for keys % 1000 == 0."""
    updates = orders.where(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 10.0
    )
    inserts = (
        orders.where(F.col("o_orderkey") % 1000 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("o_orderstatus", F.lit("N"))
    )
    return updates.unionByName(inserts)


@query(
    "q82_upsert_merge",
    oracle=f"""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 10.0 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 0
    ), inserts AS (
      SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
             'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 1000 = 0
    ), changes AS (
      SELECT * FROM updates UNION ALL SELECT * FROM inserts
    ), merged AS (
      SELECT COALESCE(c.o_orderkey, t.o_orderkey) AS o_orderkey,
             CASE WHEN c.o_orderkey IS NOT NULL
                  THEN c.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
             CASE WHEN c.o_orderkey IS NOT NULL
                  THEN c.o_totalprice ELSE t.o_totalprice END AS o_totalprice
      FROM orders t FULL JOIN changes c ON t.o_orderkey = c.o_orderkey
    )
    SELECT o_orderstatus AS status,
           COUNT(*) AS n,
           {o_dsum('o_totalprice')} AS price_sum,
           CAST(SUM(CASE WHEN o_orderkey >= 10000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inserted
    FROM merged
    GROUP BY 1 ORDER BY 1
    """,
)
def q82_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 MERGE INTO semantics: apply a change set (updates + inserts)
    onto orders in one full-outer join, fingerprint the merged table.
    Change rows replace whole rows; unmatched changes insert."""
    from .base import dsum

    o = table(spark, sf_dir, "orders")
    merged = merge_upsert(o, _changes(o), keys=["o_orderkey"])
    return (
        merged.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("price_sum"),
            F.sum(
                F.when(F.col("o_orderkey") >= 10_000_000, 1).otherwise(0)
            ).cast("long").alias("n_inserted"),
        )
        .orderBy("status")
    )


@query(
    "q83_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 1000 = 0
    ),
    diff AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
                    OR NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
                  THEN 'changed'
                  ELSE 'unchanged' END AS diff_status
      FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT diff_status, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM diff GROUP BY 1 ORDER BY 1
    """,
)
def q83_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC classification between two table snapshots (added / removed /
    changed / unchanged) via one null-safe full-outer join — the
    symmetric, content-based upgrade of the reference's one-way file-list
    diff (``CommonUtils.java:99-124``)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        o.where(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 1000 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
            .withColumn("o_orderstatus", F.lit("N"))
        )
    )
    diff = snapshot_diff(o, new, keys=["o_orderkey"])
    return (
        diff.groupBy("diff_status")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
        .orderBy("diff_status")
    )


@query(
    "q93_observe_metrics",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {o_dsum('l_quantity')} AS qty_sum,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_discounted
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    """,
)
def q93_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline telemetry via `Observation` (the reference's logging, R18,
    as a first-class mechanism): metrics ride the SAME job as the data
    pass — zero extra scans, exactly once per action, collected on the
    driver as O(report) values. The query returns the observed metrics
    themselves so the oracle can verify the mechanism end-to-end."""
    from pyspark.sql import Observation

    from .base import dsum

    obs = Observation("pipeline_metrics")
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= "1998-09-02")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity").alias("qty_sum"),
            F.sum(
                F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
            ).cast("long").alias("n_discounted"),
        )
    )
    li.write.format("noop").mode("overwrite").save()  # one real data pass
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["qty_sum"], m["n_discounted"])],
        "n_rows long, qty_sum double, n_discounted long",
    )


def _profile_oracle_leg(col: str) -> str:
    return f"""
    SELECT '{col}' AS col_name, COUNT(*) AS n_rows,
           COUNT({col}) AS n_nonnull,
           COUNT(DISTINCT {col}) AS n_distinct,
           CAST(MIN({col}) AS VARCHAR) AS min_str,
           CAST(MAX({col}) AS VARCHAR) AS max_str
    FROM lineitem"""


@query(
    "q102_column_profile",
    oracle=" UNION ALL ".join(
        _profile_oracle_leg(c)
        for c in ("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
    )
    + " ORDER BY col_name",
)
def q102_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (operators/profile.py): null counts, exact
    distinct counts, and min/max extents for a column set, one row per
    column. Per-column column-pruned aggregation legs — each parquet
    scan reads exactly one column and each shuffle carries only that
    column's distinct values with map-side partials, unlike a
    multi-distinct Expand plan that pushes (cols+1)x the full row count
    through its first shuffle (measured 11x slower at sf0.1)."""
    from ..operators.profile import profile_columns

    li = table(spark, sf_dir, "lineitem")
    return profile_columns(
        li, ["l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"]
    ).orderBy("col_name")


@query(
    "q129_heavy_hitters",
    oracle="""
    WITH counts AS (
        SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT l_partkey, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, l_partkey) AS rnk
        FROM counts
    )
    SELECT rnk, l_partkey, n,
           1 AS sketch_ok  -- asserts the sketch GUARANTEE (see docstring)
    FROM ranked WHERE rnk <= 10 ORDER BY rnk
    """,
)
def q129_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection: exact top-10 keys by frequency, each row
    flagged with whether the approx_top_k SKETCH honored its accuracy
    GUARANTEE — the q12 differential pattern for sketch surfaces. At
    100 TB the exact path's full groupBy(key) is affordable only
    because shuffle volume is distinct keys; when even that is too much
    (billions of keys, streaming), approx_top_k is the single-pass
    bounded-memory substitute, and this query is the harness that
    watches its accuracy. A drifting sketch fails the hash gate instead
    of hiding behind a rows-only check.

    The gate asserts the frequent-items guarantee, not exactness: with
    capacity k=65536 over N rows the sketch's count error is bounded by
    ~3.5·N/k and any key with true count above that bound must surface.
    sketch_ok := n <= err_bound (key too small for the guarantee) OR
    (found AND |n_approx − n| <= err_bound + 2%·n). That predicate is 1
    at EVERY scale factor if the sketch is healthy — at sf0.1 (sketch
    exact, ~20k distinct keys) and at sf1000 (sketch genuinely
    approximate) alike — so the oracle's constant 1 is the guarantee
    assertion, not an artifact of small data."""
    li = table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    wr = Window.orderBy(F.col("n").desc(), F.col("l_partkey"))
    exact = (
        counts.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 10)
        .select("rnk", "l_partkey", "n")
    )
    # One pass: total row count and the sketch come from the same agg.
    summary = li.agg(
        F.count("*").alias("total"),
        F.expr("approx_top_k(l_partkey, 20, 65536)").alias("tk"),
    )
    sketch = summary.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("l_partkey"),
        F.col("e.count").alias("n_approx"),
    )
    err_bound = F.col("total") * F.lit(4.0) / F.lit(65536.0)
    return (
        exact.join(F.broadcast(sketch), "l_partkey", "left")
        .crossJoin(F.broadcast(summary.select("total")))
        .select(
            "rnk",
            "l_partkey",
            "n",
            (
                (F.col("n") <= err_bound)
                | (
                    F.col("n_approx").isNotNull()
                    & (
                        F.abs(F.col("n_approx") - F.col("n"))
                        <= err_bound + 0.02 * F.col("n")
                    )
                )
            )
            .cast("int")
            .alias("sketch_ok"),
        )
        .orderBy("rnk")
    )


def _skew_leg_oracle(tbl: str, key: str) -> str:
    return f"""
    SELECT '{key}' AS key_col,
           COUNT(*) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           MAX(c) AS max_c,
           CAST(ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS DOUBLE)
             AS max_share,
           CAST(ROUND(ROUND(quantile_cont(c, 0.5), 9), 6) AS DOUBLE) AS p50_c,
           CAST(ROUND(ROUND(quantile_cont(c, 0.99), 9), 6) AS DOUBLE) AS p99_c,
           CAST(ROUND(2.0 * SUM(rk * c) / (COUNT(*) * SUM(c))
                      - (COUNT(*) + 1.0) / COUNT(*), 6) AS DOUBLE) AS gini
    FROM (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) AS rk
        FROM (SELECT {key} AS k, COUNT(*) AS c FROM {tbl} GROUP BY 1)
    )
    """


@query(
    "q137_key_skew_profile",
    oracle=(
        _skew_leg_oracle("lineitem", "l_suppkey")
        + " UNION ALL "
        + _skew_leg_oracle("orders", "o_custkey")
        + " ORDER BY key_col"
    ),
)
def q137_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/aggregation-key skew diagnostics — the planning input for
    salting (q61) and AQE skew-join decisions: per candidate shuffle key,
    the key count, hottest-key share, exact p50/p99 per-key frequencies,
    and the Gini coefficient of the frequency distribution (0 = uniform,
    →1 = one key owns the table). Plan shape: one hash aggregate per key
    column reduces the table to O(distinct keys), a second collapses
    that to the distinct-COUNT histogram (c, m keys sharing count c) —
    and every statistic reads off the histogram. Keys tied at count c
    occupy consecutive ranks (ties broken by key), so their rank sum is
    m·off + m(m+1)/2 independent of key order: the Gini rank sum needs
    no per-key rank at all. (The naive per-key row_number window pushes
    1e6-1e8 keys through ONE task at 100 TB; the histogram window sees
    only distinct counts — thousands at any scale.) Quantiles use
    percentile's frequency argument over the same histogram, pre-rounded
    at 1e-9 (q124 pattern); the rank sum is exact integer arithmetic in
    both engines (m(m+1) is even, so DIV 2 is exact)."""

    def leg(df: DataFrame, key: str) -> DataFrame:
        counts = df.groupBy(F.col(key).alias("k")).agg(
            F.count("*").alias("c")
        )
        hist = counts.groupBy("c").agg(F.count("*").alias("m"))
        woff = Window.orderBy("c").rowsBetween(
            Window.unboundedPreceding, -1
        )
        h = hist.withColumn(
            "off", F.coalesce(F.sum("m").over(woff), F.lit(0))
        )
        agged = h.agg(
            # coalesce: an empty table has ZERO keys (the oracle's
            # COUNT(*)), not a NULL sum (empty-input probe find, r10).
            F.coalesce(F.sum("m"), F.lit(0).cast("bigint")).alias("n_keys"),
            F.sum(F.col("c") * F.col("m")).alias("n_rows"),
            F.max("c").alias("max_c"),
            F.round(
                F.max("c").cast("double")
                / F.sum(F.col("c") * F.col("m")),
                6,
            )
            .cast("double")
            .alias("max_share"),
            F.round(F.round(F.expr("percentile(c, 0.5D, m)"), 9), 6)
            .cast("double")
            .alias("p50_c"),
            F.round(F.round(F.expr("percentile(c, 0.99D, m)"), 9), 6)
            .cast("double")
            .alias("p99_c"),
            F.expr("sum(c * (m * off + (m * (m + 1)) div 2))").alias(
                "rksum"
            ),
        )
        return agged.select(
            "n_keys",
            "n_rows",
            "max_c",
            "max_share",
            "p50_c",
            "p99_c",
            F.round(
                F.lit(2.0) * F.col("rksum")
                / (F.col("n_keys") * F.col("n_rows"))
                - (F.col("n_keys") + F.lit(1.0)) / F.col("n_keys"),
                6,
            )
            .cast("double")
            .alias("gini"),
        ).withColumn("key_col", F.lit(key))

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        leg(li, "l_suppkey")
        .unionByName(leg(o, "o_custkey"))
        .orderBy("key_col")
    )


@query(
    "q138_bloom_prefilter_join",
    oracle=f"""
    SELECT l_suppkey AS suppkey,
           COUNT(*) AS n_items,
           {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 4500)
    GROUP BY 1
    ORDER BY 1
    """,
)
def q138_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-filtered semi-join — the runtime-filter pattern
    made explicit: the dimension side (high-balance suppliers) is folded
    into an 8192-slot / 2-hash bloom bitmap (here a sorted distinct
    position array, semantically identical), broadcast as ONE row, and
    applied to the fact scan BEFORE any shuffle; only surviving
    candidates reach the exact semi-join that removes bloom false
    positives. Correctness never depends on the bloom (no false
    negatives by construction — every true key's positions are in the
    set), which is why the oracle is the plain semi-join. At 100 TB this
    is the difference between shuffling the full fact table and shuffling
    the ~selectivity fraction that survives the bitmap; Spark's own
    injected runtime bloom filters fire on the same shape when thresholds
    allow, and this operator is the explicit, always-on form. The bitmap
    stays ≤ m entries (64 KB here) no matter how large the dimension."""
    m = 8192
    li = table(spark, sf_dir, "lineitem")
    dim = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 4500)
        .select("s_suppkey")
    )

    def pos(col: F.Column, seed: int) -> F.Column:
        return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m))

    bits = (
        dim.select(
            F.explode(
                F.array(pos(F.col("s_suppkey"), 1), pos(F.col("s_suppkey"), 2))
            ).alias("b")
        )
        .distinct()
        .agg(F.sort_array(F.collect_set("b")).alias("bits"))
    )
    candidates = li.join(F.broadcast(bits)).where(
        F.array_contains(F.col("bits"), pos(F.col("l_suppkey"), 1))
        & F.array_contains(F.col("bits"), pos(F.col("l_suppkey"), 2))
    )
    verified = candidates.join(dim, candidates["l_suppkey"] == dim["s_suppkey"], "left_semi")
    return (
        verified.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("suppkey")
    )


@query(
    "q144_hll_sketch_rollup",
    # Differential oracle (q12/q129/q132 pattern): the sketch estimate is
    # engine-specific, so the query emits the EXACT per-week distinct plus
    # a flag that the merged-sketch estimate landed within max(2, 2%).
    oracle="""
    SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
           COUNT(DISTINCT user_id) AS exact_users,
           1 AS within_tol
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q144_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Spark 3.5 Apache DataSketches surface):
    per-DAY HLL sketches of distinct users are built once, then UNIONED
    up to weeks and estimated — the pre-aggregation pattern that makes
    distinct counting cheap at 100 TB: a petabyte event log reduces to
    one ~KB sketch per (day, dimension) cell that any rollup can merge
    without touching raw data again (re-aggregatable, unlike exact
    distinct counts which never roll up). hll_sketch_agg/hll_union_agg
    are algebraic aggregates — map-side combinable, shuffle carries
    sketch bytes only. Checked differentially: exact weekly distinct +
    a within-max(2, 2%) flag on the estimate (lgConfigK=14 ≈ 0.8% rse)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    weekly_approx = daily.groupBy(
        F.date_format(F.date_trunc("week", "day"), "yyyy-MM-dd").alias(
            "week_start"
        )
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    weekly_exact = ev.groupBy(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias(
            "week_start"
        )
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return (
        weekly_approx.join(weekly_exact, "week_start")
        .select(
            "week_start",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(F.lit(2.0), 0.02 * F.col("exact_users"))
            )
            .cast("int")
            .alias("within_tol"),
        )
        .orderBy("week_start")
    )


@query(
    "q145_dq_audit",
    oracle="""
    WITH row_rules AS (
        SELECT 'quantity_in_range' AS rule, COUNT(*) AS n_checked,
               CAST(COALESCE(count_if(l_quantity < 1 OR l_quantity > 50), 0) AS BIGINT)
                 AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'discount_in_range', COUNT(*),
               CAST(COALESCE(count_if(l_discount < 0 OR l_discount > 0.1), 0) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'shipdate_in_window', COUNT(*),
               CAST(COALESCE(count_if(l_shipdate IS NULL
                             OR l_shipdate <  TIMESTAMP '1992-01-01'
                             OR l_shipdate >= TIMESTAMP '1999-01-01'), 0) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'price_positive', COUNT(*),
               CAST(COALESCE(count_if(o_totalprice <= 0), 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem_fk_orders', COUNT(*),
               CAST(COALESCE(count_if(o_orderkey IS NULL), 0) AS BIGINT)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT rule, n_checked, n_violations,
           CAST(n_violations = 0 AS INT) AS passed
    FROM row_rules
    ORDER BY rule
    """,
)
def q145_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit — the validation gate run before
    any pipeline publishes a table (the row-level generalization of the
    reference's file-count/size verification, CommonUtils.java:99-124):
    range rules, null/window rules, and referential integrity, each
    reported as (checked, violations, passed). Plan shape: the three
    lineitem row rules fold into ONE scan via conditional count_if
    aggregates (stacked to rows afterwards — the q102 profile trick);
    the FK rule is a left join counting unmatched keys. At 100 TB every
    rule stays map-side combinable; the FK join is the only shuffle and
    at real scale rides a bloom prefilter (q138) or the orders table's
    bucketing (q120)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    li_rules = li.agg(
        F.count("*").alias("n"),
        F.count_if(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ).alias("v_qty"),
        F.count_if(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("v_disc"),
        F.count_if(
            F.col("l_shipdate").isNull()
            | (F.col("l_shipdate") < "1992-01-01")
            | (F.col("l_shipdate") >= "1999-01-01")
        ).alias("v_ship"),
    ).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("quantity_in_range").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("v_qty").alias("n_violations"),
                ),
                F.struct(
                    F.lit("discount_in_range").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("v_disc").alias("n_violations"),
                ),
                F.struct(
                    F.lit("shipdate_in_window").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("v_ship").alias("n_violations"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    price_rule = o.agg(
        F.count("*").alias("n_checked"),
        F.count_if(F.col("o_totalprice") <= 0).alias("n_violations"),
    ).withColumn("rule", F.lit("price_positive"))
    fk_rule = (
        li.join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left")
        .agg(
            F.count("*").alias("n_checked"),
            F.count_if(F.col("o_orderkey").isNull()).alias("n_violations"),
        )
        .withColumn("rule", F.lit("lineitem_fk_orders"))
    )
    return (
        li_rules.unionByName(price_rule)
        .unionByName(fk_rule)
        .withColumn(
            "passed", (F.col("n_violations") == 0).cast("int")
        )
        .orderBy("rule")
    )


@query(
    "q184_forget_users",
    # The audit is fully determined by the deletion predicate, so the
    # oracle restates it declaratively over the source table.
    oracle="""
    SELECT COUNT(*) AS n_rows_kept,
           CAST((SELECT COUNT(*) FROM events WHERE user_id % 31 = 0)
                AS BIGINT) AS n_rows_deleted,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events
                 WHERE user_id % 31 = 0) AS BIGINT) AS n_users_forgotten,
           CAST(0 AS BIGINT) AS n_leaked,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
    FROM events WHERE user_id % 31 != 0
    """,
)
def q184_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten deletion pipeline: given a forget-list of
    user keys, rewrite the events table WITHOUT those users' rows
    (left-anti join — the keyed DELETE for plain-parquet tables, the
    mirror of q82's MERGE upsert), write the survivor table for real,
    then AUDIT the result by re-reading it: kept/deleted row counts,
    forgotten-user count, and a leak check (semi-join of the written
    table against the forget list — must be 0). The audit reads what
    was actually written, so a deletion bug breaks the driver hash, not
    just an in-plan assertion. At 100 TB the anti join broadcasts the
    forget list (thousands of keys against billions of rows) and the
    rewrite touches only partitions containing forgotten keys when the
    table is partitioned/bucketed by the key — here the full-table
    rewrite is the worst-case path, exercised deliberately."""

    e = table(spark, sf_dir, "events")
    forget = (
        e.select("user_id")
        .where(F.col("user_id") % 31 == 0)
        .distinct()
    )
    dest = staging_dir("htspark_forget_") + "/events_clean"
    survivors = e.join(F.broadcast(forget), "user_id", "left_anti")
    survivors.write.mode("overwrite").parquet(dest)

    cleaned = spark.read.parquet(dest)
    n_deleted = (
        e.join(F.broadcast(forget), "user_id", "left_semi")
        .agg(
            F.count("*").alias("n_rows_deleted"),
            F.countDistinct("user_id").alias("n_users_forgotten"),
        )
    )
    leaked = cleaned.join(F.broadcast(forget), "user_id", "left_semi").agg(
        F.count("*").cast("bigint").alias("n_leaked")
    )
    return (
        cleaned.agg(
            F.count("*").alias("n_rows_kept"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .crossJoin(F.broadcast(n_deleted))
        .crossJoin(F.broadcast(leaked))
        .select(
            "n_rows_kept",
            "n_rows_deleted",
            "n_users_forgotten",
            "n_leaked",
            "min_event_id",
            "max_event_id",
        )
    )


@query(
    "q187_rolling_hll_distinct",
    # Differential oracle (q12/q144's pattern): exact rolling distinct
    # + a constant within-tolerance flag the Spark side must reproduce
    # from the sketch estimate. lgConfigK=14 ≈ 0.8% rse; tolerance
    # max(2, 2%) holds with wide margin at any sf.
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           COUNT(DISTINCT e.user_id) AS exact_users_7d,
           1 AS within_tol
    FROM days d
    JOIN events e
      ON CAST(date_trunc('day', e.ts) AS DATE) > d.day - 7
     AND CAST(date_trunc('day', e.ts) AS DATE) <= d.day
    GROUP BY 1
    ORDER BY 1
    """,
)
def q187_rolling_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day from MERGED daily HLL
    sketches — the sliding-window variant of q144's calendar rollup and
    the only scalable form of a rolling COUNT(DISTINCT): exact rolling
    distincts cannot be pre-aggregated (distinct is not algebraic), but
    one ~KB sketch per day re-merges into any window. Plan: one pass
    builds O(days) daily sketches; a bounded range self-join (day joins
    its trailing 7 sketch rows — the q125 EWMA shape) unions them per
    window. The exact rolling distinct is computed ONLY for the
    differential check, via the same bounded join on raw (day, user)
    pairs. At 100 TB the daily sketch table is KBs × days; the rolling
    merge never touches raw events."""
    ev = table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts"))
    daily = ev.groupBy(day.alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    d1 = daily.select(F.col("day").alias("d"))
    trailing = d1.join(
        daily,
        (F.col("day") > F.date_sub(F.col("d"), 7))
        & (F.col("day") <= F.col("d")),
    )
    approx = trailing.groupBy("d").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_7d")
    )
    pairs = ev.select(day.alias("day"), "user_id").distinct()
    exact = (
        d1.join(
            pairs,
            (F.col("day") > F.date_sub(F.col("d"), 7))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("exact_users_7d"))
    )
    tol = F.greatest(F.lit(2.0), F.col("exact_users_7d") * 0.02)
    return (
        exact.join(approx, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "exact_users_7d",
            (
                F.abs(F.col("approx_7d") - F.col("exact_users_7d")) <= tol
            )
            .cast("int")
            .alias("within_tol"),
        )
        .orderBy("day")
    )


@query(
    "q190_snapshot_time_travel",
    # Both snapshots derive deterministically from orders, so the
    # oracle re-states each version's content directly; the Spark side
    # must recover them from the written snapshot directories.
    oracle="""
    WITH v1 AS (SELECT * FROM orders WHERE o_orderkey % 5 <> 0),
         v2 AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
                  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0
                       ELSE o_totalprice END AS o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders
         )
    SELECT 'v1' AS snapshot, COUNT(*) AS n_rows,
           (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS price_sum
    FROM v1
    UNION ALL
    SELECT 'v2', COUNT(*),
           (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END)
    FROM v2
    ORDER BY snapshot
    """,
)
def q190_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel on plain parquet: write two immutable table
    versions under `<table>/v=N/` (the copy-on-write layout every table
    format's time travel reduces to), then read each version AS OF its
    snapshot id and fingerprint both — proving the engine can serve 'the
    table as it was' without a table-format dependency. Version
    directories are written once and never mutated; readers pin
    `v=<id>` (partition-pruned, so reading v1 never scans v2's files).
    At 100 TB the copy-on-write cost is per-snapshot-delta when combined
    with q82/q191's MERGE (rewrite only changed partitions); retention
    is directory deletion. The fixture's v2 applies a deterministic
    price adjustment and restores rows v1 had filtered, so the two
    fingerprints differ meaningfully."""

    o = table(spark, sf_dir, "orders")
    base = staging_dir("htspark_tt_") + "/orders_versioned"
    v1 = o.where(F.col("o_orderkey") % 5 != 0)
    v2 = o.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 100.0
        ).otherwise(F.col("o_totalprice")),
    )
    v1.write.mode("overwrite").parquet(f"{base}/v=1")
    v2.write.mode("overwrite").parquet(f"{base}/v=2")

    def as_of(version: int):
        # Partition-style pinning: only the requested snapshot's files
        # are listed/scanned.
        return spark.read.parquet(f"{base}/v={version}")

    def fingerprint(df, tag: str):
        return df.agg(
            F.lit(tag).alias("snapshot"),
            F.count("*").alias("n_rows"),
            _dec_out(F.sum(dterm("o_totalprice", 6)), 6)
            .alias("price_sum"),
        ).select("snapshot", "n_rows", "price_sum")
    return fingerprint(as_of(1), "v1").unionByName(
        fingerprint(as_of(2), "v2")
    ).orderBy("snapshot")


@query(
    "q191_cdc_apply",
    # The change feed is derived deterministically from orders, so the
    # oracle states the final table directly: base minus deletes, with
    # updates applied and inserts added.
    oracle="""
    WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
         final AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
                       ELSE o_totalprice END AS o_totalprice
           FROM base
           WHERE o_orderkey % 11 <> 0
           UNION ALL
           SELECT o_orderkey + 50000000, 42.0
           FROM base WHERE o_orderkey % 97 = 0
         )
    SELECT COUNT(*) AS n_rows,
           (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS price_sum,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM final
    """,
)
def q191_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change-data feed (op codes I/U/D) onto a base table —
    the full MERGE semantics q82's upsert lacks: deletes remove the key,
    updates replace the row, inserts add new keys, and a key appears in
    the feed at most once (the compacted-feed precondition; a real feed
    is first deduplicated to its latest op per key, q18's pattern). One
    full-outer join on the key decides every row's fate; there is no
    per-op pass. At 100 TB this is the lakehouse CDC-apply shape:
    shuffle keyed on the primary key, or zero-shuffle when base and feed
    share the q120 bucketed layout."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    feed = (
        o.where(F.col("o_orderkey") % 11 == 0)
        .select("o_orderkey", F.lit(None).cast("double").alias("new_price"),
                F.lit("D").alias("op"))
        .unionByName(
            o.where(
                (F.col("o_orderkey") % 7 == 0)
                & (F.col("o_orderkey") % 11 != 0)
            ).select(
                "o_orderkey",
                (F.col("o_totalprice") * 1.1).alias("new_price"),
                F.lit("U").alias("op"),
            )
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 50_000_000).alias("o_orderkey"),
                F.lit(42.0).alias("new_price"),
                F.lit("I").alias("op"),
            )
        )
    )
    applied = (
        o.join(feed, "o_orderkey", "full_outer")
        .where((F.col("op").isNull()) | (F.col("op") != "D"))
        .select(
            "o_orderkey",
            F.when(F.col("op").isin("U", "I"), F.col("new_price"))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    return applied.agg(
        F.count("*").alias("n_rows"),
        _dec_out(F.sum(dterm("o_totalprice", 6)), 6)
        .alias("price_sum"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "q192_hll_intersection",
    # Differential oracle: exact intersection + a constant
    # within-tolerance flag. Inclusion-exclusion compounds the error of
    # three estimates, so the tolerance is wider than q144's:
    # max(10, 5% of exact) comfortably covers 3x the 0.8% rse of
    # lgConfigK=14 sketches at any fixture scale.
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click' AND user_id IS NOT NULL),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND user_id IS NOT NULL)
    SELECT (SELECT COUNT(*) FROM a) AS n_click,
           (SELECT COUNT(*) FROM b) AS n_purchase,
           (SELECT COUNT(*) FROM a JOIN b USING (user_id))
             AS exact_intersection,
           1 AS within_tol
    """,
)
def q192_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-algebra set intersection: |clickers ∩ purchasers| estimated
    by inclusion-exclusion over HLL sketches (|A|+|B|−|A∪B|, the union
    via hll_union) — the audience-overlap question every growth
    dashboard asks, answered WITHOUT a join of the two raw user sets.
    The two per-segment sketches are built in ONE grouped pass over
    events; union + arithmetic is a 1-row projection. At 100 TB the
    exact side's distinct+join (run here only for the differential
    check) is the expensive thing being avoided: sketches make the
    overlap query O(sketch bytes), re-usable across every segment pair
    (pre-compute one sketch per segment, intersect any two later).
    Error compounds across three estimates — the documented reason
    HLL intersections need the wider tolerance and why tiny overlaps
    of huge sets need inclusion-exclusion-free sketches (theta)."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    # Dedup to (event_type, user_id) BEFORE aggregating (the q12 shape):
    # mixing countDistinct with hll_sketch_agg in one agg would make
    # Spark build a KB-sized sketch partial per (event_type, user_id)
    # row and shuffle |users| x sketch bytes. Deduping first shuffles
    # only the two narrow key columns; HLL is duplicate-insensitive, so
    # the sketch over the deduped set is identical, and count(*) over it
    # IS the exact distinct.
    # NULL user_ids are dropped before the dedup: count(*) over the
    # deduped set must keep countDistinct/HLL ignore-NULL semantics (a
    # NULL key would otherwise survive as one extra "distinct" row).
    dedup = (
        ev.select("event_type", "user_id")
        .where(F.col("user_id").isNotNull())
        .dropDuplicates(["event_type", "user_id"])
    )
    sk = dedup.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count("*").alias("exact_n"),
    )
    one = sk.agg(
        F.hll_sketch_estimate(
            F.max(F.when(F.col("event_type") == "click", F.col("sk")))
        ).alias("est_a"),
        F.hll_sketch_estimate(
            F.max(F.when(F.col("event_type") == "purchase", F.col("sk")))
        ).alias("est_b"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
        F.max(
            F.when(F.col("event_type") == "click", F.col("exact_n"))
        ).alias("n_click"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("exact_n"))
        ).alias("n_purchase"),
    )
    a = table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    ).select("user_id").distinct()
    b = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select("user_id").distinct()
    exact = a.join(b, "user_id").agg(
        F.count("*").alias("exact_intersection")
    )
    tol = F.greatest(
        F.lit(10.0), F.col("exact_intersection") * 0.05
    )
    # Empty-segment zeros: on a shard with no click/purchase rows the
    # global agg leaves the estimates and counts NULL — an absent
    # segment has 0 distinct users and the estimate of an empty sketch
    # is 0, matching the oracle's COUNT(*)-based zeros (empty-input
    # probe find, r10).
    est = (
        F.coalesce(F.col("est_a"), F.lit(0.0))
        + F.coalesce(F.col("est_b"), F.lit(0.0))
        - F.coalesce(F.col("est_union"), F.lit(0.0))
    )
    return (
        one.crossJoin(F.broadcast(exact))
        .select(
            F.coalesce("n_click", F.lit(0)).alias("n_click"),
            F.coalesce("n_purchase", F.lit(0)).alias("n_purchase"),
            "exact_intersection",
            (F.abs(est - F.col("exact_intersection")) <= tol)
            .cast("int")
            .alias("within_tol"),
        )
    )


@query(
    "q205_referential_integrity",
    # Pure integer counting over anti-joined keys — exact in both
    # engines; the orphan rate is one double division rounded at 1e-6.
    oracle="""
    WITH checks AS (
        SELECT 'lineitem.l_orderkey->orders' AS fk,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS child_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
                   AS orphans
        UNION ALL
        SELECT 'lineitem.l_partkey->part',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM part p
                                  WHERE p.p_partkey = l.l_partkey))
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                  WHERE s.s_suppkey = l.l_suppkey))
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'customer.c_nationkey->nation',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = c.c_nationkey))
    )
    SELECT fk, child_rows, orphans,
           CAST(orphans = 0 AS INT) AS ok,
           CAST(ROUND(CAST(orphans AS DOUBLE) / child_rows, 6) AS DOUBLE)
               AS orphan_rate
    FROM checks ORDER BY fk
    """,
)
def q205_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's five
    foreign keys: orphan counts via left-anti joins, one row per FK
    edge — the standard warehouse DQ gate after an ingest/migrate run
    (complements q19/q145 content checks). Each check is one anti
    equi-join: the dimension sides (nation, customer, supplier, part)
    broadcast or AQE-shuffle by measured size; the two lineitem checks
    share the same scan. No orphan scan reads more than the key
    column; the whole audit is ONE lazy plan (no driver-side counts —
    each FK edge is a left join preserving child rows plus a
    conditional agg, and the 1-row results union).

    r14 optimization (guide §1.2 "fewer passes", §2.4): the three
    lineitem FK edges previously ran as three independent branches —
    three scans of the FACT table and three join pipelines. They now
    fold into ONE lineitem pass: one scan of the three key columns,
    three successive left joins against the (distinct) parent key sets
    — each 1:≤1, so row count is preserved and every orphan flag is
    exactly what the standalone check computed — and ONE aggregate
    emitting all three (child_rows, orphans) pairs, unpivoted to rows
    with stack(). At 100 TB this is 1 fact-table read instead of 3;
    locally it cut the query from 24 jobs / 34 stages to single-digit
    jobs. Orders/customer children are separate tables and keep their
    own single-pass checks."""
    def keyset(parent: DataFrame, pkey: str, alias: str) -> DataFrame:
        return parent.select(F.col(pkey).alias(alias)).distinct()

    def check(fk: str, child: DataFrame, key: str, parent: DataFrame,
              pkey: str) -> DataFrame:
        return (
            child.select(F.col(key).alias("k"))
            .join(keyset(parent, pkey, "pk"), F.col("k") == F.col("pk"),
                  "left")
            .agg(
                F.lit(fk).alias("fk"),
                F.count("*").alias("child_rows"),
                F.count_if(F.col("pk").isNull()).alias("orphans"),
            )
        )

    li = table(spark, sf_dir, "lineitem")
    li_folded = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(keyset(table(spark, sf_dir, "orders"), "o_orderkey", "pk_o"),
              F.col("l_orderkey") == F.col("pk_o"), "left")
        .join(keyset(table(spark, sf_dir, "part"), "p_partkey", "pk_p"),
              F.col("l_partkey") == F.col("pk_p"), "left")
        .join(keyset(table(spark, sf_dir, "supplier"), "s_suppkey", "pk_s"),
              F.col("l_suppkey") == F.col("pk_s"), "left")
        .agg(
            F.count("*").alias("child_rows"),
            F.count_if(F.col("pk_o").isNull()).alias("orph_o"),
            F.count_if(F.col("pk_p").isNull()).alias("orph_p"),
            F.count_if(F.col("pk_s").isNull()).alias("orph_s"),
        )
        .selectExpr(
            """stack(3,
               'lineitem.l_orderkey->orders', child_rows, orph_o,
               'lineitem.l_partkey->part', child_rows, orph_p,
               'lineitem.l_suppkey->supplier', child_rows, orph_s
            ) AS (fk, child_rows, orphans)"""
        )
    )
    checks = [
        li_folded,
        check("orders.o_custkey->customer", table(spark, sf_dir, "orders"),
              "o_custkey", table(spark, sf_dir, "customer"), "c_custkey"),
        check("customer.c_nationkey->nation",
              table(spark, sf_dir, "customer"), "c_nationkey",
              table(spark, sf_dir, "nation"), "n_nationkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "fk",
        "child_rows",
        "orphans",
        (F.col("orphans") == 0).cast("int").alias("ok"),
        # try_divide: an EMPTY child table has no defined orphan rate —
        # NULL, matching DuckDB's NULL on double 0/0 (ANSI division
        # crashed here; empty-input probe find, r10).
        F.round(
            F.try_divide(F.col("orphans").cast("double"), F.col("child_rows")),
            6,
        )
        .cast("double")
        .alias("orphan_rate"),
    ).orderBy("fk")


@query(
    "q222_key_sequence_gaps",
    # Pure integer bucket arithmetic: per-bucket expected span minus
    # observed distinct count — exact in both engines. Interior buckets
    # are audited against their FIXED span (bucket*1000 .. +999) so
    # holes at a bucket's own min/max key are caught; only the two
    # global edge buckets fall back to the observed global min/max.
    oracle="""
    WITH k AS (SELECT DISTINCT o_orderkey AS key FROM orders),
    b AS (
        SELECT key // 1000 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MIN(key) AS BIGINT) AS lo,
               CAST(MAX(key) AS BIGINT) AS hi
        FROM k GROUP BY key // 1000
    ),
    g AS (SELECT MIN(lo) AS gmin, MAX(hi) AS gmax FROM b),
    e AS (
        SELECT b.bucket, b.n_keys, b.lo, b.hi,
               CASE WHEN b.bucket = g.gmin // 1000 THEN g.gmin
                    ELSE b.bucket * 1000 END AS exp_lo,
               CASE WHEN b.bucket = g.gmax // 1000 THEN g.gmax
                    ELSE b.bucket * 1000 + 999 END AS exp_hi
        FROM b CROSS JOIN g
    )
    SELECT bucket, n_keys, lo, hi,
           CAST(exp_hi - exp_lo + 1 - n_keys AS BIGINT) AS missing_in_span
    FROM e
    WHERE exp_hi - exp_lo + 1 - n_keys > 0
    ORDER BY bucket
    """,
)
def q222_key_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-sequence continuity audit: find ranges of the orderkey space
    with missing ids — the ingest-completeness check run after a
    migration or CDC replay (did every source row arrive?). The
    scalable formulation: bucket keys by range (key div 1000) and
    compare each bucket's observed distinct count to its EXPECTED span
    — the fixed 1000-key span for interior buckets (so holes sitting at
    a bucket's own min or max key are still caught), clipped to the
    observed global min/max for the two edge buckets. Gaps localize to
    O(buckets) rows WITHOUT the global sort + lag() the naive
    adjacent-difference audit needs: one hash agg on the bucket id plus
    a broadcast of the 1-row global-extent agg. Blind spot (documented,
    accepted): a bucket in which EVERY key is missing emits no row —
    whole-bucket loss shows up as a bucket-id discontinuity, which is
    an O(buckets) follow-up scan, not a per-key audit."""
    k = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key")
    ).distinct()
    b = (
        # integer DIV, not double "/": exact for keys beyond 2^53
        k.groupBy(F.expr("key DIV 1000").cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_keys"),
            F.min("key").cast("long").alias("lo"),
            F.max("key").cast("long").alias("hi"),
        )
    )
    g = b.agg(F.min("lo").alias("gmin"), F.max("hi").alias("gmax"))
    e = b.crossJoin(F.broadcast(g)).select(
        "bucket",
        "n_keys",
        "lo",
        "hi",
        F.when(
            F.col("bucket") == F.expr("gmin DIV 1000"), F.col("gmin")
        )
        .otherwise(F.col("bucket") * 1000)
        .alias("exp_lo"),
        F.when(
            F.col("bucket") == F.expr("gmax DIV 1000"), F.col("gmax")
        )
        .otherwise(F.col("bucket") * 1000 + 999)
        .alias("exp_hi"),
    )
    missing = F.col("exp_hi") - F.col("exp_lo") + 1 - F.col("n_keys")
    return (
        e.select(
            "bucket",
            "n_keys",
            "lo",
            "hi",
            missing.cast("long").alias("missing_in_span"),
        )
        .where(missing > 0)
        .orderBy("bucket")
    )
