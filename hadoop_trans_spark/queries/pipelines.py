"""Pipeline fidelity queries (E3/E4/E5): run the migrate/compact pipelines
for real inside the query, then emit a content fingerprint from the
DESTINATION that the DuckDB oracle reproduces from the SOURCE tables —
proving copy fidelity end-to-end through the driver's hash gate.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..pipelines import MigrateJob, compact_table, migrate
from ..pipelines.fs import exists as fs_exists
from .base import dsum, o_dsum, query, ts_micros
from ..tmputil import staging_dir


@query(
    "q33_migrate_fidelity",
    oracle=f"""
    SELECT strftime(l_shipdate, '%Y%m') AS par_dt,
           COUNT(*) AS n_rows,
           {o_dsum('l_quantity')} AS qty_sum,
           {o_dsum('l_extendedprice')} AS price_sum,
           MIN(epoch_us(l_shipdate)) AS min_ship_us
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def q33_migrate_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a Hive-partitioned warehouse copy of lineitem
    (par_dt=yyyyMM of l_shipdate), migrate the 1996 partitions to a second
    warehouse root with the full pipeline (enumeration → conflict check →
    distributed copy → verify), then fingerprint the DESTINATION per
    partition. Matching the source-side oracle proves byte-faithful
    migration (reference R9+R11 end-to-end)."""
    base = staging_dir("htspark_migrate_")
    src_root, dst_root = f"{base}/src", f"{base}/dst"

    # Stage the migrate window plus flanking quarters — enough partitions
    # outside [start, end] to prove pruning/conflict behavior without
    # writing all ~84 months of lineitem (the staging write is fixture
    # setup, not the operator under test).
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1995-10-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .withColumn("par_dt", F.date_format("l_shipdate", "yyyyMM"))
    )
    # repartition on the partition key: each task writes its own
    # partition dirs in parallel (one task fanning out all dirs
    # serializes the whole staging write).
    li.repartition("par_dt").write.mode("overwrite").partitionBy(
        "par_dt"
    ).parquet(f"{src_root}/lineitem")

    report = migrate(
        spark,
        MigrateJob(src_root, dst_root, "lineitem", start="1996-01-01", end="1996-12-31"),
    )
    assert report.ok, f"migrate verification failed: {report.verify}"

    # A migration whose window matched ZERO source partitions (e.g. an
    # empty staging shard) copies nothing and never creates the
    # destination table dir — fingerprint the empty result instead of
    # reading a missing path (empty-input probe find, r10).
    if report.copied:
        dst = spark.read.schema(li.schema).parquet(f"{dst_root}/lineitem")
    else:
        dst = spark.createDataFrame([], li.schema)
    return (
        dst.groupBy(F.col("par_dt").cast("string").alias("par_dt"))
        .agg(
            F.count("*").alias("n_rows"),
            dsum("l_quantity").alias("qty_sum"),
            dsum("l_extendedprice").alias("price_sum"),
            F.min(ts_micros("l_shipdate")).alias("min_ship_us"),
        )
        .orderBy("par_dt")
    )


@query(
    "q34_compact_fidelity",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT event_id) AS n_ids,
           {o_dsum('"value"')} AS value_sum,
           MIN(epoch_us(ts)) AS min_ts_us,
           MAX(epoch_us(ts)) AS max_ts_us
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q34_compact_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events as many small files per day partition, run compaction
    (size-aware selection → coalesce → snappy → atomic swap), then
    fingerprint the compacted table. Matching the oracle computed on the
    original events proves content-hash invariance (reference R13–R16)."""
    base = staging_dir("htspark_compact_")
    path = f"{base}/events"

    ev = table(spark, sf_dir, "events").withColumn(
        "par_dt", F.date_format("ts", "yyyyMMdd")
    )
    # 6 files per day partition: small enough to need compaction, a third
    # of the staging cost of the previous 20 (the many-small-files
    # *condition* is what matters, not the file count).
    ev.repartition(6).write.mode("overwrite").partitionBy("par_dt").parquet(path)

    report = compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert not report.failed, f"compaction failures: {report.failed}"

    # Explicit schema on the read-back: an EMPTY events shard writes a
    # fileless partition dir and schema inference has nothing to read
    # (empty-input probe find, r10) — a production read-back of a known
    # table always carries the catalog schema anyway.
    compacted = spark.read.schema(ev.schema).parquet(path)
    return (
        compacted.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("event_id").alias("n_ids"),
            dsum("value").alias("value_sum"),
            F.min(ts_micros("ts")).alias("min_ts_us"),
            F.max(ts_micros("ts")).alias("max_ts_us"),
        )
        .orderBy("event_type")
    )


@query(
    "q245_schema_drift",
    # Closed-form oracle from the staging rule: the 199601 partition is
    # written WITHOUT l_tax (2 files), 199602 with the full fixture
    # schema (2 files) — so every lineitem file column shows 4 files
    # except l_tax (2 with, 2 missing); one physical type everywhere.
    oracle="""
    WITH cols(col_name) AS (VALUES
        ('l_orderkey'), ('l_partkey'), ('l_suppkey'), ('l_linenumber'),
        ('l_quantity'), ('l_extendedprice'), ('l_discount'), ('l_tax'),
        ('l_returnflag'), ('l_linestatus'), ('l_shipdate'))
    SELECT col_name,
           CAST(CASE WHEN col_name = 'l_tax' THEN 2 ELSE 4 END AS BIGINT)
             AS n_files_with,
           CAST(CASE WHEN col_name = 'l_tax' THEN 2 ELSE 0 END AS BIGINT)
             AS n_files_missing,
           CAST(1 AS BIGINT) AS n_types
    FROM cols ORDER BY col_name
    """,
)
def q245_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift audit (pipelines/schema_report.py): stage a
    two-partition warehouse whose older partition predates a column
    (the shape behind the round-12 silent-loss finds), then report —
    per column — how many data files carry it, how many lack it, and
    how many physical types it spans. The footer sweep runs
    executor-side (Arrow-batched mapInPandas over the path list); the
    driver only lists files. This is the query an operator runs BEFORE
    migrate/compact to know a table disagrees with itself."""
    from ..pipelines.schema_report import schema_drift_report

    base = staging_dir("htspark_drift_")
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-03-01")
        )
        .withColumn("par_dt", F.date_format("l_shipdate", "yyyyMM"))
    )
    old = li.where(F.col("par_dt") == "199601").drop("par_dt", "l_tax")
    new = li.where(F.col("par_dt") == "199602").drop("par_dt")
    old.repartition(2).write.parquet(f"{base}/lineitem/par_dt=199601")
    new.repartition(2).write.parquet(f"{base}/lineitem/par_dt=199602")
    return schema_drift_report(spark, f"{base}/lineitem")


@query(
    "q246_footer_quarantine",
    # Closed-form oracle from the corruption rule: each 1996 month is
    # staged as exactly ONE parquet file (hash repartition on par_dt —
    # all of a month's rows land in one task); 199603's footer is
    # truncated and 199604's magic is flipped, so those two files are
    # quarantined, their partitions arrive EMPTY at the destination,
    # and every other month arrives in full.
    oracle="""
    WITH m AS (
        SELECT strftime(l_shipdate, '%Y%m') AS par_dt, COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1996-07-01'
        GROUP BY 1)
    SELECT par_dt,
           CAST(CASE WHEN par_dt IN ('199603', '199604')
                     THEN 0 ELSE n END AS BIGINT) AS n_dst_rows,
           CAST(CASE WHEN par_dt IN ('199603', '199604')
                     THEN 1 ELSE 0 END AS BIGINT) AS n_quarantined
    FROM m ORDER BY par_dt
    """,
)
def q246_footer_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-container triage through the REAL migrate pipeline (r13,
    pipelines/health.py): stage a one-file-per-month 1996 warehouse,
    corrupt two files at the byte level (footer truncated / magic
    flipped), migrate the year. One corrupt file must cost one
    quarantined FILE — excluded from the copy, named in the report,
    alerted — never the job (the distributed-copy crash) and never a
    silent skip. The emitted fingerprint proves all three: healthy
    months copied in full, poisoned months copied empty, and exactly
    one quarantine entry per corrupt file."""
    import os

    base = staging_dir("htspark_footer_")
    src_root, dst_root = f"{base}/src", f"{base}/dst"
    # H1 1996 only: six staged partitions prove the contract exactly as
    # twelve did (the two poisoned months sit inside), at half the
    # staging cost — q246 was the suite's most expensive query at sf0.1.
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-07-01")
        )
        .withColumn("par_dt", F.date_format("l_shipdate", "yyyyMM"))
    )
    li.repartition("par_dt").write.mode("overwrite").partitionBy(
        "par_dt"
    ).parquet(f"{src_root}/lineitem")

    def corrupt(month: str, mode: str) -> None:
        d = f"{src_root}/lineitem/par_dt={month}"
        if not os.path.isdir(d):
            return  # empty shard: month absent, nothing to poison
        for f in os.listdir(d):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                p = os.path.join(d, f)
                raw = open(p, "rb").read()
                if mode == "truncate":
                    open(p, "wb").write(raw[: max(4, len(raw) // 2)])
                else:
                    open(p, "wb").write(raw[:-4] + b"JUNK")

    corrupt("199603", "truncate")
    corrupt("199604", "garbage")

    report = migrate(
        spark,
        MigrateJob(
            src_root, dst_root, "lineitem",
            start="1996-01-01", end="1996-06-30",
        ),
    )
    # quarantine count per month, from the report (metadata-sized).
    # r14 (guide §1.2): the month list IS the migrate's copy set — the
    # staged layout writes a par_dt dir iff the month has rows, and the
    # migrate covered every existing month of the requested range
    # (quarantined months stay in the copy set; their partitions arrive
    # empty) — so re-scanning lineitem for DISTINCT par_dt was a
    # redundant pass over the fact table. r15 (ADVICE r14): read
    # report.to_copy, not report.copied — copied resets to [] when EVERY
    # candidate file is quarantined, and in that edge the query must
    # still list each month with its quarantine count (as the old
    # DISTINCT par_dt scan did). For the current 2-of-6 injection the
    # two lists are identical.
    months = list(report.to_copy)
    qcount = {
        m: sum(1 for q in report.quarantined if f"/par_dt={m}/" in q["path"])
        for m in months
    }
    if report.copied and fs_exists(spark, f"{dst_root}/lineitem"):
        dst = spark.read.schema(li.schema).parquet(f"{dst_root}/lineitem")
    else:
        dst = spark.createDataFrame([], li.schema)
    dst_counts = dst.groupBy(
        F.col("par_dt").cast("string").alias("par_dt")
    ).agg(F.count("*").alias("n_dst_rows"))
    months_df = spark.createDataFrame(
        [(m, qcount[m]) for m in months], "par_dt string, n_quarantined long"
    )
    return (
        months_df.join(dst_counts, "par_dt", "left")
        .select(
            "par_dt",
            F.coalesce(F.col("n_dst_rows"), F.lit(0)).alias("n_dst_rows"),
            "n_quarantined",
        )
        .orderBy("par_dt")
    )
