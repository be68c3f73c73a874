"""Time-series operators over the events stream-at-rest table: hypertable
rollups, gap filling, and multi-dimensional layout (SURVEY §2B E14/E17
extensions; the continuous-aggregate / data-layout surface a metrics or
training-telemetry pipeline needs at 100 TB).

Scale notes: every query here is one or two hash shuffles on (user, hour)
grain — never a per-row Python path. The gap-fill grid is generated from
per-key bounds (`sequence` + `explode`), so dense-grid size is
O(keys × span/step) and controlled by the caller's sampling predicate,
not by data skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..operators.zorder import zvalue, zvalue_sql
from .base import dsum, o_dsum, query, ts_micros


@query(
    "q94_multires_rollup",
    oracle=f"""
    WITH grains AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hr,
               value
        FROM events
    )
    SELECT COALESCE(day, '<all>') AS day,
           COALESCE(hr, '<all>') AS hr,
           GROUPING(day) + 2 * GROUPING(hr) AS gid,
           COUNT(*) AS n,
           {o_dsum('value')} AS value_sum
    FROM grains
    GROUP BY ROLLUP (day, hr)
    ORDER BY gid, day, hr
    """,
)
def q94_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly, daily, and total
    aggregates of the event stream in ONE pass via ROLLUP(day, hour) —
    the batch form of a continuous aggregate. At 100 TB this replaces
    N separate scans (one per resolution) with a single shuffle whose
    map side emits partial aggregates per grouping set."""
    e = table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hr"),
        "value",
    )
    return (
        e.rollup("day", "hr")
        .agg(
            (F.grouping("day") + 2 * F.grouping("hr")).alias("gid"),
            F.count("*").alias("n"),
            dsum("value").alias("value_sum"),
        )
        .select(
            F.coalesce("day", F.lit("<all>")).alias("day"),
            F.coalesce("hr", F.lit("<all>")).alias("hr"),
            "gid",
            "n",
            "value_sum",
        )
        .orderBy("gid", "day", "hr")
    )


@query(
    "q95_gap_fill_locf",
    oracle=f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               {o_dsum('value')} AS v
        FROM events WHERE user_id % 97 = 0 GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1),
    grid AS (
        SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    )
    SELECT g.user_id AS user_id, epoch_us(g.h) AS hour_us,
           LAST_VALUE(hv.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill,
           CAST(hv.v IS NULL AS INT) AS is_gap
    FROM grid g
    LEFT JOIN hourly hv ON g.user_id = hv.user_id AND g.h = hv.h
    ORDER BY user_id, hour_us
    """,
)
def q95_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-grid gap filling with last-observation-carried-forward:
    per-user hourly series from first to last activity, missing hours
    materialized (`sequence` + `explode` from per-key bounds — no
    driver-side calendar) and filled by `last(v, ignorenulls)` over an
    ordered window. The grid size is keys × span, independent of event
    skew; the sampling predicate stands in for the key-subset a real
    dashboard/feature query would push down."""
    e = table(spark, sf_dir, "events").where(F.col("user_id") % 97 == 0)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(dsum("value").alias("v"))
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            ts_micros("h").alias("hour_us"),
            F.last("v", ignorenulls=True).over(w).alias("v_fill"),
            F.col("v").isNull().cast("int").alias("is_gap"),
        )
        .orderBy("user_id", "hour_us")
    )


_ZX = "CAST(user_id % 256 AS INT)"
_ZY = "CAST((EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts)) // 6 AS INT)"


@query(
    "q96_zorder_stats",
    oracle=f"""
    WITH pts AS (
        SELECT {_ZX} AS x, {_ZY} AS y FROM events
    ),
    z AS (SELECT x, y, {zvalue_sql('x', 'y')} >> 8 AS bucket FROM pts)
    SELECT bucket, COUNT(*) AS n,
           MIN(x) AS x_min, MAX(x) AS x_max,
           MIN(y) AS y_min, MAX(y) AS y_max
    FROM z GROUP BY bucket ORDER BY bucket
    """,
)
def q96_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order bucket statistics (`operators/zorder.py`): Morton-code
    events on (user bucket, time-of-day bucket) and report each z-range's
    extent in both dimensions. Every bucket's x AND y spans are bounded
    (≤16 of 256 values at 8 bits ≫ 8-bit bucket shift) — the property
    that makes min/max file stats prune on either predicate after a
    z-order layout; `cluster_by_zorder` materializes it (asserted in
    tests/test_plans.py on real partitions)."""
    e = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 256).cast("int").alias("x"),
        F.floor(
            (F.hour("ts") * 60 + F.minute("ts")) / 6
        ).cast("int").alias("y"),
    )
    return (
        e.select("x", "y", F.shiftright(zvalue(F.col("x"), F.col("y")), 8).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .orderBy("bucket")
    )
