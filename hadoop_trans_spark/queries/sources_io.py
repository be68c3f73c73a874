"""Source/sink queries (E2): CSV and JSON ingest round-trips with explicit
schemas, fingerprinted against the original table."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..sources import read_csv, read_json, read_orc, read_xml
from .base import dsum, o_dsum, query
from ..tmputil import staging_dir


@query(
    "q52_csv_roundtrip",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n,
           {o_dsum('c_acctbal')} AS bal_sum,
           min(c_name) AS first_name
    FROM customer
    GROUP BY c_mktsegment ORDER BY segment
    """,
)
def q52_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV (header) → read back with a declared schema →
    fingerprint. Proves the CSV boundary preserves content (doubles
    round-trip via their shortest decimal repr)."""
    base = staging_dir("htspark_csv_")
    c = table(spark, sf_dir, "customer")
    # Whitespace-trim off on BOTH sides of the boundary: the write-side
    # default trims edge chars <= 0x20 (incl. NUL) out of values —
    # the roundtrip must be byte-faithful (hostile probe, r12).
    (
        c.write.mode("overwrite")
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(f"{base}/customer")
    )

    schema = (
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    )
    back = read_csv(spark, f"{base}/customer", schema)
    return (
        back.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            dsum("c_acctbal").alias("bal_sum"),
            F.min("c_name").alias("first_name"),
        )
        .orderBy("segment")
    )


@query(
    "q53_json_roundtrip",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {o_dsum('"value"')} AS value_sum,
           MIN(epoch_us(ts)) AS min_ts_us
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q53_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON lines (ts as epoch-micros to sidestep text timestamp
    formats) → read back with declared schema → fingerprint."""
    base = staging_dir("htspark_json_")
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    ev.write.mode("overwrite").json(f"{base}/events")

    schema = (
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string"
    )
    back = read_json(spark, f"{base}/events", schema)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("value_sum"),
            F.min("ts_us").alias("min_ts_us"),
        )
        .orderBy("event_type")
    )


@query(
    "q78_orc_roundtrip",
    oracle=f"""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n,
           {o_dsum('o_totalprice')} AS price_sum,
           MIN(epoch_us(o_orderdate)) AS min_date_us
    FROM orders
    GROUP BY o_orderstatus ORDER BY status
    """,
)
def q78_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC (snappy) → read back → fingerprint. The second
    columnar boundary besides parquet; the oracle reads the original
    parquet, so a match proves the ORC round-trip is content-lossless
    (timestamps compared as epoch-micros)."""
    base = staging_dir("htspark_orc_")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("date_us"),
    )
    o.write.mode("overwrite").orc(f"{base}/orders")

    schema = "o_orderkey long, o_orderstatus string, o_totalprice double, date_us long"
    back = read_orc(spark, f"{base}/orders", schema)
    return (
        back.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("price_sum"),
            F.min("date_us").alias("min_date_us"),
        )
        .orderBy("status")
    )


@query(
    "q122_xml_roundtrip",
    oracle=f"""
    SELECT s_nationkey AS nation,
           COUNT(*) AS n,
           {o_dsum('s_acctbal')} AS bal_sum,
           MIN(s_name) AS first_name
    FROM supplier
    GROUP BY s_nationkey ORDER BY nation
    """,
)
def q122_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → XML (built-in Spark 4 source, rowTag per record) → read
    back with a declared schema → fingerprint. Completes the text-format
    matrix (CSV q52, JSON q53, ORC q78, XML here) against the same
    parquet-reading oracle, proving the XML boundary is content-lossless
    for longs/doubles/strings."""
    base = staging_dir("htspark_xml_")
    s = table(spark, sf_dir, "supplier")
    (
        s.write.mode("overwrite")
        .format("xml")
        .option("rowTag", "supplier")
        .save(f"{base}/supplier")
    )
    schema = (
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    )
    back = read_xml(spark, f"{base}/supplier", schema, row_tag="supplier")
    return (
        back.groupBy(F.col("s_nationkey").alias("nation"))
        .agg(
            F.count("*").alias("n"),
            dsum("s_acctbal").alias("bal_sum"),
            F.min("s_name").alias("first_name"),
        )
        .orderBy("nation")
    )


@query(
    "q90_python_datasource",
    oracle="""
    SELECT CAST(id % 7 AS INT) AS bucket,
           COUNT(*) AS n,
           MIN(md5(CAST(id AS VARCHAR))) AS min_h,
           CAST(SUM(id) AS BIGINT) AS id_sum
    FROM range(0, 1000) t(id)
    GROUP BY 1 ORDER BY 1
    """,
)
def q90_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 datasource API): a partitioned
    synthetic generator — `partitions()` declares the split, `read()`
    yields rows executor-side (sources/pydatasource.py). The oracle
    re-derives the deterministic rows from range(); matching proves the
    source honors its schema/partition contract."""
    from ..sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("synthetic_range")
        .option("n", "1000")
        .option("partitions", "4")
        .load()
    )
    return (
        df.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("h").alias("min_h"),
            F.sum("id").alias("id_sum"),
        )
        .orderBy("bucket")
    )


@query(
    "q91_variant_json",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q91_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json into the binary
    variant encoding, extract typed fields with variant_get — the
    columnar-shredding-friendly way to query JSON at 100 TB (parse once,
    not per-expression; no schema declaration needed up front)."""
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.variant_get(F.col("v"), "$.k", "bigint").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


@query(
    "q112_schema_evolution",
    oracle=f"""
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'v1' ELSE 'v2' END AS gen,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_with_priority,
           {o_dsum('o_totalprice')} AS price_sum
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
)
def q112_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolved reads (`mergeSchema`): generation v1 files written
    WITHOUT o_orderpriority, v2 files written with it; one merged-schema
    scan reads both, with the missing column null-filled for v1 rows —
    the additive-column evolution every long-lived warehouse table goes
    through. At 100 TB footer-schema merging is a planning-time
    metadata operation; pin the canonical schema in a catalog once a
    table stabilizes so the scan skips per-file merging."""
    base = staging_dir("htspark_evo_")
    o = table(spark, sf_dir, "orders")
    v1 = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = o.where(F.col("o_orderkey") % 2 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(f"{base}/t/gen=v1")
    v2.write.mode("overwrite").parquet(f"{base}/t/gen=v2")

    merged = spark.read.option("mergeSchema", "true").parquet(f"{base}/t")
    return (
        merged.groupBy("gen")
        .agg(
            F.count("*").alias("n"),
            F.count("o_orderpriority").alias("n_with_priority"),
            dsum("o_totalprice").alias("price_sum"),
        )
        .orderBy("gen")
    )


@query(
    "q120_bucketed_join",
    oracle=f"""
    SELECT o_orderpriority AS prio,
           COUNT(*) AS n_items,
           {o_dsum('l_extendedprice')} AS price_sum
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q120_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-exchange co-located join (sources/bucketing.py): orders and
    lineitem written bucketed+sorted on the join key, then joined from
    the catalog — Spark plans a SortMergeJoin with NO shuffle on either
    side (asserted in tests/test_bucketing.py). The shuffle is paid once
    at layout time and amortized over every subsequent join; at 100 TB
    this is the standard recurring fact-fact join layout. Broadcast is
    disabled for the join so the exchange-free SMJ is the plan under
    test, not a broadcast fallback."""
    import shutil
    import time
    import uuid
    from pathlib import Path

    from ..sources.bucketing import read_table, write_bucketed

    # Unique table names: managed-table locations under the shared
    # warehouse dir outlive the session's catalog, so a fixed name
    # collides on the next session's re-run. Stale q120_* locations from
    # PRIOR sessions (never in this session's catalog) are reclaimed
    # here so repeated verification runs don't grow the warehouse. The
    # mtime guard keeps this from racing a CONCURRENT session: its live
    # tables are also absent from this session's catalog, but they are
    # recent — only locations quiet for >1 h are swept. CAVEAT: mtime is
    # set at WRITE time and reads don't refresh it, so a concurrent
    # session >1 h old that still queries its q120_* tables could have
    # them swept mid-use. Fine for the short-lived test/driver sessions
    # here; a production sweep should key staleness off a per-run
    # sentinel file touched on use, not directory mtime.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix(
        "file:"
    )
    if warehouse:
        current = {t.name for t in spark.catalog.listTables()}
        cutoff = time.time() - 3600
        for d in Path(warehouse).glob("q120_*"):
            try:
                stale = d.stat().st_mtime < cutoff
            except OSError:
                continue
            if d.name not in current and stale:
                shutil.rmtree(d, ignore_errors=True)
    tag = uuid.uuid4().hex[:8]
    orders_t, lineitem_t = f"q120_orders_{tag}", f"q120_lineitem_{tag}"
    n = 8
    # repartition(n, key) uses the same Murmur3 hash as bucketing, so each
    # write task holds exactly one bucket and emits ONE file — without it
    # every task fans out a file per bucket (tasks × buckets small files).
    write_bucketed(
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .repartition(n, "o_orderkey"),
        orders_t,
        ["o_orderkey"],
        n,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .repartition(n, "l_orderkey"),
        lineitem_t,
        ["l_orderkey"],
        n,
        sort_cols=["l_orderkey"],
    )
    o = read_table(spark, orders_t)
    li = read_table(spark, lineitem_t)
    joined = o.hint("merge").join(
        li, o["o_orderkey"] == li["l_orderkey"]
    )
    return (
        joined.groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("price_sum"),
        )
        .orderBy("prio")
    )


@query(
    "q149_text_source",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS chars_sum,
           MIN(doc_id) AS min_id
    FROM documents
    WHERE lang IS NOT NULL AND text IS NOT NULL
    GROUP BY lang ORDER BY lang
    """,
)
def q149_text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text-lines boundary (the WET/WARC-derivative format LLM
    crawls actually arrive in): documents → gzip'd text lines
    ``doc_id<TAB>lang<TAB>base64(text)`` (base64 because document text
    contains the line format's own delimiters) → ``spark.read.text`` →
    regex/split parse → fingerprint against the original table. The
    parse is all JVM expressions; gzip makes each line-file a
    non-splittable stream, which is the honest trade of this format —
    at 100 TB you shard into many ~100 MB .gz files so parallelism
    comes from file count (exactly what the write below produces)."""
    base = staging_dir("htspark_text_")
    # A delimited line format cannot carry NULL fields: concat_ws SKIPS
    # nulls, so a NULL lang/text row would emit a short line that
    # shatters the 3-field parse contract on read-back (getItem(2) is an
    # out-of-bounds crash — NULL-probe find, r10). Exported docs are the
    # fully-populated ones, symmetrically with the oracle's WHERE.
    d = table(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    lines = d.select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            F.col("lang"),
            # Spark's base64 can emit MIME-chunked output (a \r\n every
            # 76 chars) which would shatter the one-record-per-line
            # contract — strip the wrapping; unbase64 accepts it.
            F.regexp_replace(
                F.base64(F.col("text").cast("binary")), "[\\r\\n]", ""
            ),
        ).alias("value")
    )
    lines.write.mode("overwrite").option("compression", "gzip").text(
        f"{base}/docs"
    )
    back = spark.read.text(f"{base}/docs").select(
        F.split(F.col("value"), "\t").alias("p")
    ).select(
        F.col("p").getItem(0).cast("long").alias("doc_id"),
        F.col("p").getItem(1).alias("lang"),
        F.unbase64(F.col("p").getItem(2)).cast("string").alias("text"),
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("chars_sum"),
            F.min("doc_id").alias("min_id"),
        )
        .orderBy("lang")
    )


@query(
    "q150_binaryfile_source",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    WHERE doc_id % 25 = 0 AND text IS NOT NULL
    ORDER BY doc_id
    """,
)
def q150_binaryfile_source(
    spark: SparkSession, sf_dir: str, blob_base: str | None = None
) -> DataFrame:
    """binaryFile data source — the ingest boundary for opaque blobs
    (images/audio in the multimodal tables, reference's byte-stream file
    model R7): one file per blob on disk, read back as (path, length,
    content binary) rows, identity = md5 over raw bytes; the doc id is
    recovered from the file name. The oracle hashes the same bytes from
    the source table, so a match proves byte-exact ingest. At 100 TB
    binaryFile scales by file count (maxPartitionBytes packs small blobs
    per task); million-blob dirs want a manifest/iceberg layer, but the
    source contract stays (path, mtime, length, content). n_bytes is
    octet_length(encode(text)) in the oracle — BYTES, not chars: the
    edge-value probe (r10) planted multibyte UTF-8 text and caught the
    previous length(text) oracle under-counting the blob size."""
    # Blob materialization for the READ-side operator under test runs
    # EXECUTOR-side (foreachPartition): each task writes its own rows,
    # so no blob ever serializes through the driver. The executor-side
    # writes land under `blob_base`, which must therefore be visible to
    # BOTH executors and the read-back scan: on a cluster pass shared
    # storage (object store / DFS — where a real pipeline's blobs
    # already live); the driver-local tempdir default is only valid in
    # local mode, and that is now enforced rather than assumed.
    if blob_base is None:
        master = spark.sparkContext.master
        if not master.startswith("local"):
            raise ValueError(
                "q150_binaryfile_source: default blob dir is driver-local "
                f"tempfs, invalid under master={master!r}; pass blob_base="
                "<shared storage path> (e.g. hdfs://... or s3a://...)"
            )
        blob_base = staging_dir("htspark_bin_")
    base = blob_base
    # NULL text = no blob to materialize (encode(None) would crash the
    # executor task) — skipped symmetrically with the oracle's WHERE
    # (NULL-probe find, r10).
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 25 == 0)
        .where(F.col("text").isNotNull())
    )
    def _write_blobs(rows) -> None:
        import pathlib

        p = pathlib.Path(base)
        for r in rows:
            (p / f"{r['doc_id']}.txt").write_bytes(r["text"].encode("utf-8"))

    d.select("doc_id", "text").foreachPartition(_write_blobs)
    back = spark.read.format("binaryFile").load(base)
    return (
        back.select(
            F.regexp_extract(F.col("path"), r"(\d+)\.txt$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "q180_range_clustered_layout",
    # The oracle states the layout INVARIANTS (file count fixed by the
    # range partitioner's N, zero strict range overlaps between files,
    # exact row conservation, global day bounds); the Spark side
    # computes them from the files actually written — a wrong layout
    # (overlapping ranges, dropped rows, wrong fan-out) breaks the hash.
    oracle="""
    SELECT CASE WHEN COUNT(*) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(8 AS BIGINT) END AS n_files,
           COUNT(*) AS total_rows,
           CAST(0 AS BIGINT) AS n_overlaps,
           strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_day,
           strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_day
    FROM lineitem
    """,
)
def q180_range_clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered data layout: write lineitem
    ``repartitionByRange(8, l_shipdate).sortWithinPartitions`` — the
    1-D sibling of the z-order layout (q96) and the layout that makes
    parquet min/max footer stats actually prune time-range scans — then
    audit the written files: per-file day bounds from a real re-read
    (``input_file_name`` groupBy), strict overlap count between
    neighboring file ranges (must be 0: the range partitioner assigns
    disjoint key ranges), row conservation, and global bounds. The
    overlap window runs over the O(n_files) audit table, never data.

    Scale contract for the audit step: the neighbor-overlap window is a
    single-task sort over ONE ROW PER FILE (metadata, never data — here
    exactly 8 rows by construction). That is the right trade up to
    ~1e6 files (a few MB of (f, d0, d1, n) rows); pointing this audit at
    a 1e7+-file lake needs the banded decomposition in
    ``operators/globalrank.py`` or a per-range-bucket pre-grouping —
    don't lift the pattern without that change.
    At 100 TB this is the recurring fact-table layout job: one range
    shuffle (sampled boundaries), in-task sort, and the same audit
    query validates the layout cheaply after every rewrite."""
    base = staging_dir("htspark_rangelayout_")
    path = f"{base}/lineitem_ranged"
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    from pyspark.sql.window import Window

    day = F.date_format("l_shipdate", "yyyy-MM-dd")
    per_file = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"), day.alias("day"))
        .groupBy("f")
        .agg(
            F.min("day").alias("d0"),
            F.max("day").alias("d1"),
            F.count("*").alias("n"),
        )
    )
    w = Window.orderBy("d0", "f").rowsBetween(-1, -1)
    audited = per_file.select(
        "n",
        "d0",
        "d1",
        F.max("d1").over(w).alias("prev_d1"),
    )
    # coalesce: an empty layout job writes zero files and conserves
    # zero rows — counts, not NULL sums (empty-input probe find, r10;
    # the oracle's fixed-fan-out invariant also only holds for
    # non-empty input, hence its CASE).
    return audited.agg(
        F.count("*").alias("n_files"),
        F.coalesce(F.sum("n"), F.lit(0).cast("bigint")).alias("total_rows"),
        F.coalesce(
            F.sum(F.when(F.col("prev_d1") > F.col("d0"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_overlaps"),
        F.min("d0").alias("min_day"),
        F.max("d1").alias("max_day"),
    )


@query(
    "q213_corrupt_json_ingest",
    # The corruption pattern is deterministic (every o_orderkey % 97 ==
    # 0 line is truncated mid-record), so the oracle derives the same
    # good/bad split arithmetically from the orders table — it never
    # parses the corrupt file itself.
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           -- COALESCE: zero lines means zero corrupt/valid COUNTS (the
           -- Spark side uses count_if), not NULL sums (empty-input
           -- probe find, r10)
           CAST(COALESCE(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS n_corrupt,
           CAST(COALESCE(SUM(CASE WHEN o_orderkey % 97 <> 0 THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS n_valid,
           {o_dsum('CASE WHEN o_orderkey % 97 <> 0 THEN o_totalprice END')}
               AS valid_revenue
    FROM orders
    """,
)
def q213_corrupt_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON-lines ingest with a _corrupt_record column: the
    orders table is written as JSONL with every 97th key's line
    truncated mid-record, then read back with an explicit schema +
    columnNameOfCorruptRecord. Malformed lines land in the corrupt
    column instead of killing the job — the contract a crawl-scale
    ingest needs (one bad record in 100 TB must not fail the batch).
    Counts and the valid-rows revenue fingerprint prove nothing is
    dropped OR double-counted. The corrupt column must be materialized
    via a cache/checkpoint barrier before filtering on it (Spark's
    documented PERMISSIVE caveat: the corrupt column is only populated
    for rows the parser actually failed)."""
    import os

    base = staging_dir("htspark_badjson_")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    jdf = o.select(
        F.when(
            F.col("o_orderkey") % 97 == 0,
            # Truncate mid-record: unclosed brace + dangling key.
            F.concat(
                F.lit('{"o_orderkey": '),
                F.col("o_orderkey").cast("string"),
                F.lit(', "o_totalprice": '),
            ),
        )
        .otherwise(F.to_json(F.struct("o_orderkey", "o_totalprice",
                                      "o_orderstatus")))
        .alias("value")
    )
    path = os.path.join(base, "orders_jsonl")
    jdf.write.mode("overwrite").text(path)

    schema = (
        "o_orderkey long, o_totalprice double, o_orderstatus string, "
        "_bad string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(path)
        .cache()  # barrier: populate _bad before filtering on it
    )
    return back.agg(
        F.count("*").alias("n_lines"),
        F.count_if(F.col("_bad").isNotNull()).alias("n_corrupt"),
        F.count_if(F.col("_bad").isNull()).alias("n_valid"),
        dsum(
            F.when(F.col("_bad").isNull(), F.col("o_totalprice"))
        ).alias("valid_revenue"),
    )


@query(
    "q221_nested_parquet_roundtrip",
    # The nested file is built from orders+lineitem and immediately
    # re-flattened; the oracle computes the same fingerprint from the
    # flat tables directly, so any shredding/assembly corruption in the
    # nested write or read breaks the match. Line arrays are sorted by
    # linenumber, so array order is deterministic.
    oracle=f"""
    SELECT o.o_orderstatus AS status,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN l.l_linenumber = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_first_lines,
           {o_dsum('l.l_extendedprice')} AS line_revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus ORDER BY status
    """,
)
def q221_nested_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-parquet boundary check: orders with their lineitems
    collected into an array<struct> column (sorted by linenumber),
    written as nested parquet, read back, re-exploded, and
    fingerprinted against the flat join — proving the writer's
    Dremel-style shredding and the reader's assembly preserve nested
    content exactly (the document-shaped layout a crawl/label store
    uses). The nest step is one orderkey-keyed collect_list agg;
    re-reading prunes to the nested columns actually referenced."""
    base = staging_dir("htspark_nested_")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    nested = (
        li.groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("l_linenumber", "l_extendedprice")
                )
            ).alias("lines")
        )
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .select("o_orderkey", "o_orderstatus", "lines")
    )
    path = f"{base}/orders_nested"
    nested.write.mode("overwrite").parquet(path)

    back = spark.read.parquet(path)
    lines = back.select(
        "o_orderstatus",
        "o_orderkey",
        F.explode("lines").alias("ln"),
    )
    return (
        lines.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count_if(F.col("ln.l_linenumber") == 1).alias("n_first_lines"),
            dsum(F.col("ln.l_extendedprice")).alias("line_revenue"),
        )
        .orderBy("status")
    )
