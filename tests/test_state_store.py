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
