"""Fixture catalog: schema-checked loading of the test warehouse.

Schemas are declared (schemas-as-code, SURVEY §1.2) rather than inferred;
``load_tables`` registers each as a temp view so every query is reachable
from both the DataFrame API and ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (columnar parquet scan — pushdown-friendly)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TIMESTAMP (UTC instant) across fixture layouts.

    The driver has shipped events.ts as parquet TIMESTAMP(NANOS) — read as
    long nanos under spark.sql.legacy.parquet.nanosAsLong — and as
    TIMESTAMP(MICROS) without timezone (TIMESTAMP_NTZ).  Both truncate to
    the same µs instant DuckDB sees; with the session pinned to UTC the
    NTZ→TIMESTAMP cast preserves the wall clock exactly.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":  # legacy nanos-as-long layout
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load tables and register temp views named after each table."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """The engine's SQL entry surface (SURVEY §3.2 `engine.sql`).

    Registers the warehouse tables as views (when ``sf_dir`` is given)
    and hands the query to Spark's ANSI SQL parser — same Catalyst
    analyze/optimize/execute path as the DataFrame API, so every declared
    operator is reachable from SQL too (q62 exercises this surface).
    """
    if sf_dir is not None:
        load_tables(spark, sf_dir)
    return spark.sql(query)
