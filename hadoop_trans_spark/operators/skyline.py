"""Distributed Pareto frontier (2-D skyline) operator.

Dominance (minimize ``low``, maximize ``high``): a dominates b iff
``a.low <= b.low AND a.high >= b.high`` and a is strictly better on at
least one axis. The frontier is every row no other row dominates;
equal-point duplicates are all kept (neither strictly dominates).

Scale design — local-prune / global-refine, the algebraic shape that
makes skylines feasible on a cluster: a row dominated inside any subset
is dominated globally, so each hash bucket sweeps its own rows down to a
local frontier first (distributed, one ``applyInPandas`` over buckets),
and only the union of local frontiers — for real distributions a tiny
fraction of the input — takes the second, single-group sweep. Contrast
with the naive NOT EXISTS self-join (the oracle states it that way):
that is O(n²) candidate pairs and unshardable. The per-bucket sweep is
O(k log k) in bucket rows; the refine group is frontier-sized, i.e.
metadata-sized for non-adversarial data (worst case — input already one
big frontier — degrades to a single-task sort, which is the problem's
intrinsic output size, not an artifact).

No counterpart in the reference (hadoop-trans moves partition files
byte-wise; see SURVEY §2C) — this is part of the analytics surface a
Spark-native engine adds on top.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame, low: str, high: str, buckets: int = 32
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier (minimize low, maximize high).

    Each phase-1 bucket materializes as one pandas frame (~n/buckets
    rows), so size ``buckets`` to the input — rows/buckets must fit a
    worker's memory; the default 32 suits fixture scale, a 100 TB run
    wants O(cluster cores) or a per-bucket row target.
    """
    schema = df.schema
    cols = df.columns

    # NESTED so cloudpickle ships it BY VALUE: the driver owns the
    # session and may launch Python workers without this repo on their
    # sys.path — a module-level helper would pickle as a reference to
    # ``hadoop_trans_spark.operators.skyline`` and die on import there
    # (the repo-wide worker-closure rule; see operators/multimodal.py).
    def local(pdf: pd.DataFrame) -> pd.DataFrame:
        """Exact 2-D frontier of one in-memory group.

        Sweep ``low`` ascending: a row survives iff its ``high`` equals
        its ``low``-group's max AND strictly exceeds the running max
        over all strictly-lower ``low`` groups (a strictly-cheaper row
        with >= high would dominate; an equal-``low`` row with > high
        would dominate).
        """
        pdf = pdf.drop(columns=["_b"], errors="ignore")
        per = (
            pdf.groupby(low, as_index=False)[high]
            .max()
            .sort_values(low, kind="mergesort")
        )
        prev = per[high].cummax().shift(1)
        keep = per[prev.isna() | (per[high] > prev)]
        return pdf.merge(keep, on=[low, high])[cols]

    # Phase 1: per-bucket local frontiers — ONE hash shuffle on the
    # bucket id, embarrassingly parallel. Phase 2: one sweep over their
    # union — frontier-sized input by construction.
    pruned = df.withColumn(
        "_b", F.pmod(F.xxhash64(F.col(low)), F.lit(buckets))
    ).groupBy("_b").applyInPandas(local, schema)
    return (
        pruned.withColumn("_b", F.lit(0))
        .groupBy("_b")
        .applyInPandas(local, schema)
    )
