"""Declarative pipeline runner: a JSON spec of named stages executed as
ONE Spark lineage, each stage's output registered as a view for later
stages.

The reference is three hard-wired imperative loops behind three CLI
mains (``TransTablePartition.java:43``, ``HDFSMerge.java:33``); this is
the generalization a warehouse team actually operates: declare the DAG
(sources → SQL transforms → writes/verifies) as data, let the engine
plan it. Because every ``sql`` stage only REGISTERS a view (nothing runs
until a ``write``/``verify``/``show`` sink), Catalyst optimizes across
stage boundaries — filters written in a late stage push down into an
early stage's scan, exactly what a hand-chained set of temp tables would
prevent. Spec shape:

    {"stages": [
      {"op": "sql",    "name": "enriched", "query": "SELECT ..."},
      {"op": "query",  "name": "summary",  "declared": "q01_pricing_summary"},
      {"op": "write",  "input": "enriched", "path": "/out/enriched",
       "partition_by": ["par_dt"], "mode": "overwrite"},
      {"op": "verify", "src": "enriched", "dst": "reloaded"},
      {"op": "count",  "input": "summary"}
    ]}

Ops: ``sql`` (ANSI SQL over fixture tables + prior stage views),
``query`` (a declared oracle-checked query by name), ``write``
(partitioned parquet sink), ``read`` (register a parquet path as a
view), ``count`` (force a stage, record its row count), ``verify``
(row-content equivalence of two stages via pipelines.verify — pipeline
FAILS if they differ). Scale: the runner adds no execution of its own —
every stage is the same lazy DataFrame the API surface builds, so the
100 TB properties of a pipeline are exactly those of its stages.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .verify import verify


@dataclass
class PipelineReport:
    """Outcome per stage; ``ok`` is False iff any verify stage failed."""

    counts: dict[str, int] = field(default_factory=dict)
    written: dict[str, str] = field(default_factory=dict)
    verified: dict[str, bool] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(self.verified.values())


_ALLOWED_WRITE_MODES = ("overwrite", "errorifexists", "append", "ignore")


def run_pipeline(
    spark: SparkSession,
    spec: dict[str, Any],
    sf_dir: str | None = None,
) -> PipelineReport:
    """Execute a pipeline spec; returns a :class:`PipelineReport`.

    Raises ``ValueError`` on malformed specs (unknown op, missing keys,
    duplicate/unknown stage names) BEFORE executing anything — a bad
    spec must not half-run.
    """
    stages = spec.get("stages")
    if not isinstance(stages, list) or not stages:
        raise ValueError("spec must contain a non-empty 'stages' list")

    # -- validate the whole spec up front (no partial execution) -----------
    names: set[str] = set()
    for i, st in enumerate(stages):
        op = st.get("op")
        if op in ("sql", "query", "read"):
            name = st.get("name")
            if not name or name in names:
                raise ValueError(f"stage {i}: missing or duplicate name {name!r}")
            names.add(name)
            if op == "sql" and not st.get("query"):
                raise ValueError(f"stage {i}: sql stage needs 'query'")
            if op == "query" and not st.get("declared"):
                raise ValueError(f"stage {i}: query stage needs 'declared'")
            if op == "read" and not st.get("path"):
                raise ValueError(f"stage {i}: read stage needs 'path'")
        elif op == "write":
            if st.get("input") not in names:
                raise ValueError(f"stage {i}: write input {st.get('input')!r} unknown")
            if not st.get("path"):
                raise ValueError(f"stage {i}: write stage needs 'path'")
            if st.get("mode", "overwrite") not in _ALLOWED_WRITE_MODES:
                raise ValueError(f"stage {i}: bad write mode {st.get('mode')!r}")
        elif op == "count":
            if st.get("input") not in names:
                raise ValueError(f"stage {i}: count input {st.get('input')!r} unknown")
        elif op == "verify":
            for side in ("src", "dst"):
                if st.get(side) not in names:
                    raise ValueError(f"stage {i}: verify {side} {st.get(side)!r} unknown")
        else:
            raise ValueError(f"stage {i}: unknown op {op!r}")

    if sf_dir is not None:
        from ..catalog import load_tables

        load_tables(spark, sf_dir)

    report = PipelineReport()
    views: dict[str, DataFrame] = {}

    def register(name: str, df: DataFrame) -> None:
        views[name] = df
        df.createOrReplaceTempView(name)

    for st in stages:
        op = st["op"]
        if op == "sql":
            register(st["name"], spark.sql(st["query"]))
        elif op == "query":
            from ..queries import QUERIES

            declared = st["declared"]
            if declared not in QUERIES:
                raise ValueError(f"unknown declared query {declared!r}")
            if sf_dir is None:
                raise ValueError("'query' stages need the pipeline's sf_dir")
            register(st["name"], QUERIES[declared](spark, sf_dir))
        elif op == "read":
            register(st["name"], spark.read.parquet(st["path"]))
        elif op == "write":
            writer = views[st["input"]].write.mode(st.get("mode", "overwrite"))
            if st.get("partition_by"):
                writer = writer.partitionBy(*st["partition_by"])
            writer.parquet(st["path"])
            report.written[st["input"]] = st["path"]
        elif op == "count":
            report.counts[st["input"]] = views[st["input"]].count()
        elif op == "verify":
            rep = verify(views[st["src"]], views[st["dst"]])
            report.verified[f"{st['src']}->{st['dst']}"] = rep.equal
    return report


def run_pipeline_file(
    spark: SparkSession, path: str, sf_dir: str | None = None
) -> PipelineReport:
    with open(path) as fh:
        return run_pipeline(spark, json.load(fh), sf_dir=sf_dir)
