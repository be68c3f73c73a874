"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``hadoop_trans_spark.queries`` (one registry
entry per operator in SURVEY.md §2B); this module just re-exports it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    """Engine session defaults that matter for correctness parity.

    The driver owns the SparkSession; these are per-session SQL confs
    (safe to set post-creation).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.ts is parquet TIMESTAMP(NANOS): read as long, converted in
    # the catalog (hadoop_trans_spark.catalog.table).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # The driver's Python workers may not have this repo on sys.path
    # (the JVM's cwd is the driver's, not ours) — ship the package so
    # worker-side closures that reference module-level helpers resolve
    # (the runtime equivalent of spark-submit --py-files).
    from hadoop_trans_spark.shipping import ship_package

    ship_package(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from hadoop_trans_spark.queries import QUERIES

    _configure(spark)
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    from hadoop_trans_spark.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from hadoop_trans_spark.queries import ORACLE

    return dict(ORACLE)
