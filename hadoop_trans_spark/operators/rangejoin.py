"""Binned point-in-interval (range) join.

Spark has no native range-join optimization: a join whose only predicate
is ``start <= point < end`` plans as BroadcastNestedLoopJoin (OK for a
tiny interval side, q09's shape) or, when neither side is broadcastable,
a cartesian product — O(N×M), a scale-killer. The classic fix (used by
Databricks' range-join hint and by interval libraries) is *binning*:
quantize the point and every day an interval covers onto fixed-width
bins, equi-join on the bin id, then re-check the exact range predicate.
The equi-join shuffles and co-partitions on ``__bin`` like any other key
join, so both sides can be arbitrarily large; each interval is
replicated only ``ceil(len/bin)+1`` times.

Reference parity: the reference's day-substring containment matching
(`CommonUtils.java:192-208`) is a driver-side O(days×files) loop over
path strings; this operator is the distributed generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def _day_number(col: str) -> F.Column:
    """Date column → days since epoch (integer), engine-portable."""
    return F.datediff(F.col(col), F.lit(_EPOCH))


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_days: int = 16,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point < end`` (dates, half-open), via bin equi-join.

    ``bin_days`` trades replication (intervals explode into
    ``len/bin_days + 1`` bin rows) against post-join filtering (a wider
    bin matches more non-qualifying pairs); set it near the typical
    interval length. Intervals with ``end <= start`` are empty under
    half-open semantics and are dropped up front — also guarding
    ``sequence()``, which would otherwise count *down* and fabricate
    bins.

    Column names must be disjoint apart from the reserved ``__bin``.
    """
    w = int(bin_days)
    if w <= 0:
        raise ValueError(f"bin_days must be positive, got {bin_days}")
    iv = (
        intervals.where(F.col(end_col) > F.col(start_col))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(_day_number(start_col) / w),
                    # end is exclusive: last occupied day is end-1
                    F.floor((_day_number(end_col) - 1) / w),
                )
            ),
        )
    )
    pt = points.withColumn("__bin", F.floor(_day_number(point_col) / w))
    return (
        pt.join(iv, "__bin")  # equi-join: shuffles on __bin, never BNLJ
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bin")
    )
