"""Table statistics for the cost-based optimizer (SURVEY §4.2: 'collect
table stats for CBO where join order matters' — an engine obligation,
exercised here so the recipe is pinned working, not aspirational).

ANALYZE requires catalog tables (not temp views); the test saves two
fixture tables, computes table + column stats, and asserts (a) the
stats land in the catalog with correct row counts, and (b) Catalyst's
stats-based size estimate of the ANALYZEd table drives broadcast
selection without any broadcast() hint."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from hadoop_trans_spark.catalog import table


@pytest.fixture
def saved_tables(spark, smoke_dir):
    tag = uuid.uuid4().hex[:8]
    li_t, n_t = f"li_{tag}", f"nation_{tag}"
    table(spark, smoke_dir, "lineitem").write.saveAsTable(li_t)
    table(spark, smoke_dir, "nation").write.saveAsTable(n_t)
    yield li_t, n_t
    for t in (li_t, n_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_analyze_populates_catalog_stats(spark, smoke_dir, saved_tables):
    li_t, n_t = saved_tables
    spark.sql(f"ANALYZE TABLE {li_t} COMPUTE STATISTICS")
    spark.sql(
        f"ANALYZE TABLE {n_t} COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_name"
    )
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {li_t}").collect()
    }
    stats = desc.get("Statistics", "")
    expected = table(spark, smoke_dir, "lineitem").count()
    assert f"{expected} rows" in stats, stats
    # column-level stats: distinct-count for the analyzed column exists
    col_desc = spark.sql(f"DESCRIBE EXTENDED {n_t} n_nationkey").collect()
    info = {r.info_name: r.info_value for r in col_desc}
    assert info.get("distinct_count") not in (None, "NULL"), info


def test_stats_drive_broadcast_selection_without_hint(
    spark, smoke_dir, saved_tables
):
    """With stats in the catalog, the 25-row nation side must be chosen
    for broadcast in a plain unhinted join against lineitem — size
    estimation from ANALYZE, not from file sizes or hints."""
    li_t, n_t = saved_tables
    spark.sql(f"ANALYZE TABLE {li_t} COMPUTE STATISTICS")
    spark.sql(f"ANALYZE TABLE {n_t} COMPUTE STATISTICS")
    df = spark.table(li_t).join(
        spark.table(n_t),
        F.col("l_suppkey") % 25 == F.col("n_nationkey"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan
