"""Capture and parse Spark's formatted physical plans.

Rationale (SURVEY §4.2): at 100 TB the difference between a plan that
pushes `l_shipdate <= X` into the parquet scan and one that filters
post-scan is the difference between reading row-group statistics and
reading the table. These helpers make such properties testable.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text of a DataFrame's physical plan."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every scan's PushedFilters list, flattened.

    Non-empty entries prove predicate pushdown reached the parquet
    reader (row-group min/max + dictionary + Bloom skipping apply)."""
    plan = explain_formatted(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Per-scan list of column names actually read (column pruning)."""
    plan = explain_formatted(df)
    out: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1).strip()
        out.append(
            [f.split(":")[0].strip() for f in body.split(",") if ":" in f]
        )
    return out


def scan_partition_filters(df: DataFrame) -> list[str]:
    """Every scan's PartitionFilters (partition pruning evidence)."""
    plan = explain_formatted(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def broadcast_joins(df: DataFrame) -> int:
    """Number of BroadcastHashJoin nodes in the physical plan."""
    return explain_formatted(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes in the physical plan — the
    scale-limiting resource; operators should add as few as the
    semantics require."""
    plan = explain_formatted(df)
    return len(re.findall(r"\bExchange\b", plan))


def codegen_subtrees(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees Spark fuses this plan into.

    ≥1 proves the hot path compiles to fused JVM bytecode; 0 means
    something (typically a Python UDF or an unsupported operator) broke
    codegen everywhere. AQE is disabled for the duration of the explain —
    the adaptive wrapper defers codegen until execution, so the
    pre-execution plan would always report 0 (physical planning happens
    at explain time, so the toggle takes effect without rebuilding df)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    buf = io.StringIO()
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        with redirect_stdout(buf):
            df.explain(mode="codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
    return int(m.group(1)) if m else 0
