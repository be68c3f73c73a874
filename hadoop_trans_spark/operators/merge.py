"""Table-maintenance operators: upsert merge (SCD1 "MERGE INTO") and
snapshot diff (CDC classification).

The reference's whole job is keeping warehouse copies in sync
(reference ``TransTablePartition.java:115-140`` copies partitions,
``CommonUtils.java:99-124`` diffs source vs destination); these operators
are the row-level generalization: apply a change set onto a target
table, and classify what changed between two snapshots.

Both are ONE full-outer equi-join on the key — shuffle on the key,
map-side nothing else. At 100 TB the join co-partitions on the key
(bucketed layouts make it exchange-free); the change set is usually the
small side and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, changes: DataFrame, keys: list[str]) -> DataFrame:
    """SCD1 upsert: rows in ``changes`` replace same-key rows in
    ``target``; unmatched change rows insert; everything else carries
    over. Whole-row replacement semantics (a change row wins even where
    it carries NULLs) — the behavior of SQL MERGE's UPDATE SET * /
    INSERT *.

    Both sides are packed into one struct each before the join, so the
    merge is a single full-outer join + one projection regardless of
    column count."""
    non_keys = [c for c in target.columns if c not in keys]
    if [c for c in changes.columns if c not in keys] != non_keys:
        raise ValueError("target/changes column sets must match")
    t = target.select(*keys, F.struct(*non_keys).alias("_t"))
    c = changes.select(*keys, F.struct(*non_keys).alias("_c"))
    j = t.join(c, keys, "full_outer")
    take = F.when(F.col("_c").isNotNull(), F.col("_c")).otherwise(F.col("_t"))
    return j.select(*keys, *[take.getField(f).alias(f) for f in non_keys])


def _row_neq(a: Column, b: Column, fields: list[str]) -> Column:
    """Null-safe any-field-differs over two structs."""
    neq = F.lit(False)
    for f in fields:
        neq = neq | ~a.getField(f).eqNullSafe(b.getField(f))
    return neq


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """CDC classification between two snapshots of the same table:
    (keys..., diff_status ∈ {added, removed, changed, unchanged}).

    The row-level generalization of the reference's file-list diff
    (``CommonUtils.java:99-124`` compared name→size maps one way; this is
    symmetric and content-based). One full-outer join; comparisons are
    null-safe so NULL→value edits classify as changed."""
    non_keys = [c for c in old.columns if c not in keys]
    o = old.select(*keys, F.struct(*non_keys).alias("_o"))
    n = new.select(*keys, F.struct(*non_keys).alias("_n"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_o").isNull(), "added")
        .when(F.col("_n").isNull(), "removed")
        .when(_row_neq(F.col("_o"), F.col("_n"), non_keys), "changed")
        .otherwise("unchanged")
    )
    return j.select(*keys, status.alias("diff_status"))
