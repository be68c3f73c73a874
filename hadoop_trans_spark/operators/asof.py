"""As-of join (E12): match each left row to the latest right row at-or-before
its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The classic distributed
formulation used here:

  1. union the two inputs into one frame (left rows carry null right-values),
  2. sort within each key by (ts, side) — right rows first on ties,
  3. `last(value, ignorenulls=True)` over an unbounded-preceding window
     fills each left row with the most recent right values,
  4. keep only left rows.

Cost model: ONE shuffle (hash on the key) + one per-partition sort — the
same cost as a single sort-merge join, with no row explosion and no range
predicate re-scan. This is the plan that survives 100 TB: both sides
partition on the key. A pathologically hot key serializes its own
partition by semantics (the per-key timeline sort is sequential, and AQE
cannot split window partitions at all); if one key dominates, range-split
its timeline into time bands with boundary carry — the banded-window
technique the global-rank operators use. A range-join + row_number alternative explodes
to |left|×|right-per-key| intermediates; the union trick never does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: latest right row with right_ts <= left_ts
    (strict: < left_ts) per `on` key. Left rows without a match keep nulls.

    ``value_cols`` are the right-side columns to attach (may include
    ``right_ts`` itself). Right-side tie-breaking at equal timestamps is
    deterministic: the row with the greatest first value column wins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    for vc in value_cols:
        if vc in left.columns:
            raise ValueError(f"value column {vc!r} collides with a left column")

    # A common event-time axis + side marker. side=0 (right) sorts before
    # side=1 (left) at equal ts so `<=` semantics hold; strict mode flips it.
    l_marked = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1 if not strict else 0)
    )
    for vc in value_cols:
        l_marked = l_marked.withColumn(vc, F.lit(None).cast(right.schema[vc].dataType))

    # Keep right_ts through the projection even when it isn't an attached
    # value column — __ts is computed from it (callers that don't attach
    # the match timestamp used to crash with UNRESOLVED_COLUMN here).
    r_cols = list(dict.fromkeys([*keys, right_ts, *value_cols]))
    r_marked = (
        right.select(*r_cols)
        .withColumn("__ts", F.col(right_ts))
        .withColumn("__side", F.lit(0 if not strict else 1))
    )
    for lc in left.columns:
        if lc not in keys and lc not in r_marked.columns:
            r_marked = r_marked.withColumn(lc, F.lit(None).cast(left.schema[lc].dataType))

    unioned = l_marked.unionByName(r_marked.select(*l_marked.columns))

    # Deterministic order: ts, side, then right id (nulls last keeps left
    # rows after all same-ts right rows regardless of id).
    w = (
        W.partitionBy(*keys)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            F.col(value_cols[0]).asc_nulls_last(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned
    fill_names = []
    for vc in value_cols:
        filled = filled.withColumn(f"__fill_{vc}", F.last(vc, ignorenulls=True).over(w))
        fill_names.append(vc)

    is_left = F.col("__side") == (1 if not strict else 0)
    out_cols = [c for c in left.columns] + [
        F.col(f"__fill_{vc}").alias(vc) for vc in fill_names
    ]
    return filled.where(is_left).select(*out_cols)
