"""Compaction pipeline tests (reference HDFSMerge semantics 5-7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_trans_spark.catalog import table
from hadoop_trans_spark.pipelines import compact_table
from hadoop_trans_spark.pipelines.verify import verify
from hadoop_trans_spark.pipelines import fs


@pytest.fixture()
def small_files_table(spark, smoke_dir, tmp_path):
    """events written as many ~tiny files per partition (FIXTURES.md
    small-files fixture)."""
    path = str(tmp_path / "events_small")
    ev = table(spark, smoke_dir, "events").withColumn(
        "par_dt", F.date_format("ts", "yyyyMMdd")
    )
    ev.repartition(25).write.partitionBy("par_dt").parquet(path)
    return path


def _data_files(spark, path):
    return [
        p for p, _ in fs.list_files(spark, path)
        if not p.rsplit("/", 1)[-1].startswith(("_", "."))
    ]


def test_compaction_reduces_files_and_preserves_content(spark, small_files_table):
    before = spark.read.parquet(small_files_table).cache()
    before.count()
    n_files_before = len(_data_files(spark, small_files_table))

    report = compact_table(spark, small_files_table, target_file_bytes=64 * 1024 * 1024)
    assert report.compacted and not report.failed

    n_files_after = len(_data_files(spark, small_files_table))
    assert n_files_after < n_files_before
    for rel in report.compacted:
        assert report.files_after[rel] <= report.files_before[rel]

    # Content-hash invariance (semantic: merge must not alter data).
    after = spark.read.parquet(small_files_table)
    assert verify(before, after).equal


def test_semantic5_idempotent_incremental(spark, small_files_table):
    """Already-compacted partitions are excluded from the next run — the
    reference's "snappy"-name filter (`HDFSMerge.java:166`), generalized
    to a size-based qualification."""
    r1 = compact_table(spark, small_files_table, target_file_bytes=64 * 1024 * 1024)
    assert r1.compacted
    r2 = compact_table(spark, small_files_table, target_file_bytes=64 * 1024 * 1024)
    assert r2.compacted == []
    assert set(r2.skipped) >= set(r1.compacted)


def test_semantic6_output_layout(spark, small_files_table):
    """Compacted output stays inside the partition directory, snappy
    parquet (the reference wrote {table}_{day}.snappy inside the partition,
    `HDFSMerge.java:142`)."""
    report = compact_table(spark, small_files_table, target_file_bytes=64 * 1024 * 1024)
    for rel in report.compacted:
        files = _data_files(spark, f"{small_files_table}/{rel}")
        assert len(files) == 1  # tiny partition → single target file
        assert files[0].endswith(".snappy.parquet")
        assert f"/{rel}/" in files[0]


def test_semantic7_sources_survive_failed_merge(spark, small_files_table, monkeypatch):
    """Inputs are deleted only if the merge succeeded (`HDFSMerge.java:
    144-148`): inject a swap failure and assert originals intact."""
    before = spark.read.parquet(small_files_table).cache()
    before.count()
    files_before = set(_data_files(spark, small_files_table))

    from hadoop_trans_spark.pipelines import compact as compact_mod

    def failing_rename(spark_, src, dst):
        return False  # every swap fails

    monkeypatch.setattr(compact_mod.fs, "rename", failing_rename)
    report = compact_table(spark, small_files_table, target_file_bytes=64 * 1024 * 1024)
    assert report.compacted == []
    assert report.failed

    files_after = set(_data_files(spark, small_files_table))
    assert files_after == files_before  # nothing lost
    assert verify(before, spark.read.parquet(small_files_table)).equal


def test_two_level_partitions(spark, smoke_dir, tmp_path):
    """Reference `-sp true` (`HDFSMerge.java:90-103`): 2-level layout
    par_dt/par_game; compaction operates on the leaves."""
    path = str(tmp_path / "events_2level")
    ev = table(spark, smoke_dir, "events").withColumn(
        "par_dt", F.date_format("ts", "yyyyMMdd")
    )
    ev.repartition(8).write.partitionBy("par_dt", "event_type").parquet(path)
    before = spark.read.parquet(path).cache()
    before.count()

    report = compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert report.compacted
    assert all("/" in rel and "event_type=" in rel for rel in report.compacted)
    assert verify(before, spark.read.parquet(path)).equal


def test_compaction_preserves_schema_evolved_columns(spark, tmp_path):
    """Files inside one partition can disagree on schema (evolution
    mid-partition). Without mergeSchema the rewrite keeps a SAMPLED
    file's schema, so whether the evolved column survives depends on
    file listing order — nondeterministic data loss (r12 probe; the
    migrate twin failed deterministically). The read now merges
    footers; this pins the contract."""
    from hadoop_trans_spark.pipelines import compact_table

    path = str(tmp_path / "t" / "par_dt=01")
    a = spark.createDataFrame([(i, float(i)) for i in range(50)], "id long, v double")
    b = spark.createDataFrame(
        [(100 + i, float(i), f"x{i}") for i in range(50)],
        "id long, v double, note string",
    )
    a.repartition(6).write.parquet(path)
    b.repartition(6).write.mode("append").parquet(path)

    rep = compact_table(spark, str(tmp_path / "t"), target_file_bytes=64 * 1024 * 1024)
    assert not rep.failed
    after = spark.read.option("mergeSchema", "true").parquet(path)
    assert "note" in after.columns
    assert after.count() == 100
    assert after.where("note is not null").count() == 50


def test_compact_corrupt_file_fails_partition_keeps_data(
    spark, small_files_table
):
    """r13 footer probe, compact side: a corrupt parquet file must fail
    ONLY its own partition — alerted, originals left fully intact (a
    rewrite that excluded the corrupt file and then deleted originals
    would LOSE its rows) — while every other partition compacts. This
    pins the existing per-partition failure isolation as the chosen
    contract for compaction (migrate's quarantine-and-copy contract
    cannot apply here: compact DELETES sources after the swap, so a
    partition with an unreadable file must not be rewritten at all)."""
    import os

    from hadoop_trans_spark.pipelines.alerts import AlertSink

    parts = sorted(
        d for d in os.listdir(small_files_table) if d.startswith("par_dt=")
    )
    victim = f"{small_files_table}/{parts[0]}"
    files = sorted(
        f for f in os.listdir(victim)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    n_victim_files = len(files)
    target = os.path.join(victim, files[0])
    raw = open(target, "rb").read()
    open(target, "wb").write(raw[: max(4, len(raw) // 2)])  # cut footer

    sink = AlertSink()
    report = compact_table(
        spark, small_files_table, target_file_bytes=64 * 1024 * 1024,
        sink=sink,
    )
    rel = parts[0]
    assert report.failed == [rel]
    assert any(
        a.kind == "compact_failure" and a.partition == rel
        for a in sink.alerts
    )
    # victim partition untouched: same file names, corrupt file present
    assert sorted(
        f for f in os.listdir(victim)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ) == files and len(files) == n_victim_files
    # all other qualifying partitions still compacted
    assert set(report.compacted) == set(parts[1:])
