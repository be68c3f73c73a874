"""Bucketed co-located join: the exchange-free SortMergeJoin plan that
pays the shuffle once at write time (SCALE.md relational-core strategy).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_trans_spark.catalog import table
from hadoop_trans_spark.plans.explain import explain_formatted, shuffle_count
from hadoop_trans_spark.sources.bucketing import read_table, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force the join planner off the broadcast path so the test observes
    the bucketed SortMergeJoin (tiny sf0.001 sides would broadcast)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, smoke_dir, no_broadcast):
    li = table(spark, smoke_dir, "lineitem")
    orders = table(spark, smoke_dir, "orders")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        ["l_orderkey"],
        8,
        ["l_orderkey"],
    )
    try:
        joined = read_table(spark, "b_lineitem").join(
            read_table(spark, "b_orders"), "l_orderkey"
        )
        plan = explain_formatted(joined)
        assert "SortMergeJoin" in plan, plan
        assert shuffle_count(joined) == 0, plan
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_unbucketed_join_needs_exchanges(spark, smoke_dir, no_broadcast):
    """Control: the same join over plain parquet shuffles both sides."""
    li = table(spark, smoke_dir, "lineitem")
    orders = table(spark, smoke_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    assert shuffle_count(li.join(orders, "l_orderkey")) >= 2


def test_bucketed_span_index_probe_shuffles_only_increment(
    spark, smoke_dir, no_broadcast
):
    """q257's scale claim, executed: with the corpus window INDEX stored
    bucketed by h, the incremental probe's semi-join leaves the index
    exchange-free — only the (small) increment shuffles to the bucket
    layout. The standing 100 TB index never re-shuffles per batch."""
    from hadoop_trans_spark.queries.dedup import span_windows

    wins = span_windows(spark, smoke_dir)
    idx = wins.where(F.col("doc_id") % 2 == 0).select("h").distinct()
    write_bucketed(idx, "b_span_idx", ["h"], 8, ["h"])
    try:
        inc = wins.where(F.col("doc_id") % 2 == 1)
        probe = inc.join(read_table(spark, "b_span_idx"), "h", "left_semi")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # The index reads its bucket layout (no exchange above the scan);
        # the only h shuffle is the increment side. The round-robin
        # exchange is span_windows' scan parallelization, not a join cost.
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert probe.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_span_idx")
