"""Materialization of multi-consumer pipeline stages.

Several operators (MinHash shingles, SimHash fingerprints, dedup pair
tables, connected-components labels) compute an intermediate that two or
more downstream plan branches consume; without materialization each
branch recomputes the stage from the scan. Locally `localCheckpoint` is
the right tool: it stores the blocks on executor storage with no extra
I/O path to configure.

The 100 TB caveat (SCALE.md): executor-local blocks die with the
executor, and on a 1000-node cluster executor loss is routine — a lost
block fails the job and re-runs it from the start. For long-running
cluster jobs configure a RELIABLE checkpoint directory
(`sc.setCheckpointDir('hdfs://.../ckpt')` or an object-store path) and
these operators automatically upgrade to `df.checkpoint()` (HDFS-backed,
replicated, survives executor loss). The switch is automatic:
`materialize_stage` uses reliable checkpointing whenever a checkpoint
dir is set, unless explicitly overridden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_stage(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    """Cut lineage and materialize `df` once for its multiple consumers.

    reliable=None (default): use a reliable `checkpoint()` iff the
    SparkContext has a checkpoint dir configured, else `localCheckpoint()`.
    Pass reliable=True/False to force either (True without a checkpoint
    dir raises, matching Spark's own error).
    """
    sc = df.sparkSession.sparkContext
    if reliable is None:
        reliable = sc.getCheckpointDir() is not None
    return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)
