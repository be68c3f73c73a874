"""Unit tests for merge_upsert / snapshot_diff on crafted rows."""

from __future__ import annotations

import pytest

from hadoop_trans_spark.operators.merge import merge_upsert, snapshot_diff


def _t(spark, rows):
    return spark.createDataFrame(rows, "k long, status string, price double")


def test_merge_upsert_updates_inserts_carries(spark):
    target = _t(spark, [(1, "O", 10.0), (2, "F", 20.0), (3, "O", 30.0)])
    changes = _t(spark, [(2, "P", 25.0), (9, "N", 99.0)])
    out = {r["k"]: r for r in merge_upsert(target, changes, ["k"]).collect()}
    assert set(out) == {1, 2, 3, 9}
    assert (out[2]["status"], out[2]["price"]) == ("P", 25.0)  # updated
    assert (out[9]["status"], out[9]["price"]) == ("N", 99.0)  # inserted
    assert (out[1]["status"], out[1]["price"]) == ("O", 10.0)  # carried


def test_merge_upsert_change_row_wins_even_with_nulls(spark):
    """Whole-row replacement (MERGE ... UPDATE SET *): a NULL in the
    change row overwrites the target value, it does not fall through."""
    target = _t(spark, [(1, "O", 10.0)])
    changes = _t(spark, [(1, None, 11.0)])
    [row] = merge_upsert(target, changes, ["k"]).collect()
    assert row["status"] is None and row["price"] == 11.0


def test_merge_upsert_rejects_mismatched_columns(spark):
    target = _t(spark, [(1, "O", 10.0)])
    bad = spark.createDataFrame([(1, "x")], "k long, other string")
    with pytest.raises(ValueError):
        merge_upsert(target, bad, ["k"])


def test_snapshot_diff_classifies_all_four(spark):
    old = _t(spark, [(1, "O", 10.0), (2, "F", 20.0), (3, "O", 30.0), (4, None, 1.0)])
    new = _t(spark, [(1, "O", 10.0), (2, "F", 21.0), (5, "N", 50.0), (4, "X", 1.0)])
    out = {r["k"]: r["diff_status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        5: "added",
        4: "changed",  # NULL → value is a change (null-safe compare)
    }
