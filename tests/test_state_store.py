"""RocksDB state store (the 100 TB streaming-state path, SCALE.md):
the provider swap must be output-invariant — same windowed aggregation,
same final sink rows as the default HDFS-backed provider. This pins the
config actually recommended in the module docstring
(hadoop_trans_spark/streaming/jobs.py) as WORKING, not aspirational."""

from __future__ import annotations

from hadoop_trans_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
    tumbling_counts,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
CONF = "spark.sql.streaming.stateStore.providerClass"


def test_rocksdb_provider_matches_default_provider(spark, smoke_dir):
    default_rows = sorted(
        map(
            tuple,
            run_to_memory(
                tumbling_counts(read_events_stream(spark, smoke_dir)),
                "append",
            ).collect(),
        )
    )
    prev = spark.conf.get(CONF, None)
    try:
        spark.conf.set(CONF, ROCKSDB)
        rocks_rows = sorted(
            map(
                tuple,
                run_to_memory(
                    tumbling_counts(read_events_stream(spark, smoke_dir)),
                    "append",
                ).collect(),
            )
        )
    finally:
        if prev is None:
            spark.conf.unset(CONF)
        else:
            spark.conf.set(CONF, prev)
    assert default_rows, "fixture produced no windows"
    assert rocks_rows == default_rows


def test_pinned_state_partitions_restores_conf(spark):
    """Every streaming start site wraps _pinned_state_partitions; the
    pin must restore the session's shuffle-partition conf on BOTH the
    normal and the exception path (a leak would silently re-plan every
    later batch query in the shared driver session at 4 partitions)."""
    import pytest

    from hadoop_trans_spark.streaming.jobs import _pinned_state_partitions

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    with _pinned_state_partitions(spark):
        assert spark.conf.get(key) == "4"
    assert spark.conf.get(key) == prev

    with pytest.raises(RuntimeError):
        with _pinned_state_partitions(spark, n=2):
            assert spark.conf.get(key) == "2"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == prev


def test_stream_migrate_restart_resumes_from_checkpoint(
    spark, smoke_dir, tmp_path
):
    """The E41 continuous-migrate contract: re-running stream_migrate
    with the SAME dest + checkpoint after new files landed must append
    ONLY the not-yet-committed files (the file-source log is the resume
    identity). Run 1 ingests one file (n rows); a second identical file
    lands; run 2 must bring dest to exactly 2n — 3n would mean the
    restart reprocessed file 1, n would mean it ignored file 2."""
    import shutil

    from hadoop_trans_spark.streaming.jobs import stream_migrate

    src = tmp_path / "landing"
    src.mkdir()
    shutil.copyfile(
        f"{smoke_dir}/events.parquet", src / "events.parquet"
    )
    n = spark.read.parquet(f"{smoke_dir}/events.parquet").count()
    dest, ckpt = str(tmp_path / "dest"), str(tmp_path / "ckpt")

    out = stream_migrate(
        spark, str(src), dest=dest, checkpoint=ckpt, glob="events*.parquet"
    )
    assert spark.read.parquet(out).count() == n

    shutil.copyfile(
        f"{smoke_dir}/events.parquet", src / "events_late.parquet"
    )
    out2 = stream_migrate(
        spark, str(src), dest=dest, checkpoint=ckpt, glob="events*.parquet"
    )
    assert out2 == dest
    assert spark.read.parquet(dest).count() == 2 * n


def _load_stream_probe():
    import importlib.util
    import os

    repo = __file__.rsplit("/tests/", 1)[0]
    spec = importlib.util.spec_from_file_location(
        "stream_probe", os.path.join(repo, "tools", "stream_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stateful_restart_matches_single_run(spark, smoke_dir, tmp_path):
    """r13 streaming restart contract (VERDICT r12 item 3), pinned for
    the two state shapes with the most machinery behind them: a
    watermarked windowed aggregate (tumbling) and the custom
    applyInPandasWithState operator (streaks). The fixture is staged as
    4 ts-ordered files; a run stopped after 2 files and resumed from
    its checkpoint over the full set must produce exactly the rows of a
    never-stopped run — open-window partials, watermark position, and
    per-key custom state all live in (and must come back from) the
    state store. The full 10-family sweep is tools/stream_probe.py."""
    import os
    import shutil
    import tempfile

    from hadoop_trans_spark.streaming import (
        read_events_stream,
        tumbling_counts,
        user_streaks_updates,
    )

    sp = _load_stream_probe()
    full = str(tmp_path / "full")
    sp.stage_split(smoke_dir, full, 4)
    files = sorted(f for f in os.listdir(full) if f.startswith("events_"))
    assert len(files) == 4

    def es(d):
        return read_events_stream(spark, d, max_files_per_trigger=1)

    for build, mode, canon in [
        (lambda d: tumbling_counts(es(d)), "append", sp.canon_rows),
        (lambda d: user_streaks_updates(es(d)), "update", sp.canon_streaks),
    ]:
        single = sp.run_available_now(
            build(full), mode, tempfile.mkdtemp(prefix="ckpt_s_")
        )
        grow = tempfile.mkdtemp(prefix="grow_")
        for f in files[:2]:
            shutil.copy2(os.path.join(full, f), os.path.join(grow, f))
        ckpt = tempfile.mkdtemp(prefix="ckpt_r_")
        p1 = sp.run_available_now(build(grow), mode, ckpt)
        for f in files[2:]:
            shutil.copy2(os.path.join(full, f), os.path.join(grow, f))
        p2 = sp.run_available_now(build(grow), mode, ckpt)
        a = canon(sp.flat(single))
        b = canon(sp.flat(p1) + sp.flat(p2))
        assert a, "single run produced no rows"
        assert a == b
