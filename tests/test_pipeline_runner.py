"""Declarative pipeline runner (pipelines/runner.py): stage chaining,
write/read round-trip, verify gating, spec validation, and the
cross-stage optimization property (a late filter pushes into the early
stage's scan because stages are views, not materializations)."""

from __future__ import annotations

import json

import pytest

from hadoop_trans_spark.pipelines import run_pipeline
from hadoop_trans_spark.plans import pushed_filters


def test_chained_sql_stages_and_counts(spark, smoke_dir):
    report = run_pipeline(
        spark,
        {
            "stages": [
                {
                    "op": "sql",
                    "name": "flagged",
                    "query": "SELECT l_orderkey, l_quantity, l_returnflag"
                    " FROM lineitem",
                },
                {
                    "op": "sql",
                    "name": "returns",
                    "query": "SELECT * FROM flagged WHERE l_returnflag = 'R'",
                },
                {"op": "count", "input": "returns"},
            ]
        },
        sf_dir=smoke_dir,
    )
    n = report.counts["returns"]
    assert n > 0
    expected = (
        spark.read.parquet(f"{smoke_dir}/lineitem.parquet")
        .where("l_returnflag = 'R'")
        .count()
    )
    assert n == expected
    assert report.ok


def test_late_filter_pushes_into_early_stage_scan(spark, smoke_dir):
    """Stages register views, so Catalyst optimizes ACROSS stages: the
    second stage's filter must reach the first stage's parquet scan as a
    pushed filter — the property that distinguishes this runner from
    materialize-per-stage orchestration."""
    run_pipeline(
        spark,
        {
            "stages": [
                {
                    "op": "sql",
                    "name": "base_projection",
                    "query": "SELECT l_orderkey, l_shipdate FROM lineitem",
                },
            ]
        },
        sf_dir=smoke_dir,
    )
    df = spark.sql(
        "SELECT * FROM base_projection WHERE l_shipdate >= DATE '1997-01-01'"
    )
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_write_read_roundtrip_and_verify_gates(spark, smoke_dir, tmp_path):
    out = str(tmp_path / "nation_out")
    report = run_pipeline(
        spark,
        {
            "stages": [
                {"op": "sql", "name": "nations", "query": "SELECT * FROM nation"},
                {"op": "write", "input": "nations", "path": out},
                {"op": "read", "name": "reloaded", "path": out},
                {"op": "verify", "src": "nations", "dst": "reloaded"},
                {
                    "op": "sql",
                    "name": "truncated",
                    "query": "SELECT * FROM nation WHERE n_nationkey < 10",
                },
                {"op": "verify", "src": "nations", "dst": "truncated"},
            ]
        },
        sf_dir=smoke_dir,
    )
    assert report.verified["nations->reloaded"] is True
    assert report.verified["nations->truncated"] is False
    assert not report.ok  # any failed verify fails the pipeline


def test_declared_query_stage(spark, smoke_dir):
    report = run_pipeline(
        spark,
        {
            "stages": [
                {
                    "op": "query",
                    "name": "summary",
                    "declared": "q01_pricing_summary",
                },
                {"op": "count", "input": "summary"},
            ]
        },
        sf_dir=smoke_dir,
    )
    assert report.counts["summary"] > 0


@pytest.mark.parametrize(
    "spec,msg",
    [
        ({}, "non-empty 'stages'"),
        ({"stages": [{"op": "nope"}]}, "unknown op"),
        ({"stages": [{"op": "sql", "name": "a"}]}, "needs 'query'"),
        (
            {"stages": [{"op": "count", "input": "ghost"}]},
            "unknown",
        ),
        (
            {
                "stages": [
                    {"op": "sql", "name": "a", "query": "SELECT 1"},
                    {"op": "sql", "name": "a", "query": "SELECT 2"},
                ]
            },
            "duplicate",
        ),
        (
            {
                "stages": [
                    {"op": "sql", "name": "a", "query": "SELECT 1"},
                    {"op": "write", "input": "a", "path": "/x", "mode": "truncate"},
                ]
            },
            "bad write mode",
        ),
    ],
)
def test_malformed_specs_rejected_before_execution(spark, spec, msg):
    with pytest.raises(ValueError, match=msg):
        run_pipeline(spark, spec)


def test_cli_pipeline_subcommand(spark, smoke_dir, tmp_path, capsys):
    from hadoop_trans_spark.__main__ import main

    spec_path = tmp_path / "spec.json"
    spec_path.write_text(
        json.dumps(
            {
                "stages": [
                    {
                        "op": "sql",
                        "name": "regions",
                        "query": "SELECT * FROM region",
                    },
                    {"op": "count", "input": "regions"},
                ]
            }
        )
    )
    rc = main(["pipeline", "-spec", str(spec_path), "-data", smoke_dir])
    out = capsys.readouterr().out
    assert rc == 0
    payload = json.loads(out[out.index("{"):])
    assert payload["counts"]["regions"] == 5
    assert payload["ok"] is True
