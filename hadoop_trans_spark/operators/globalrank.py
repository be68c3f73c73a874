"""Scalable global ordering primitives (rank / cumulative sums without a
single-partition window).

``Window.orderBy(...)`` with no ``partitionBy`` funnels the whole table
through ONE task — the classic Spark scale-killer this repo's plan tests
ban elsewhere. Every helper here uses the same sort-with-offsets
decomposition:

1. bucket every row by a sort-aligned *band* of the leading sort key
   (all rows of band B sort strictly before all rows of band B+1);
   within each band, the window runs PARTITIONED — per-band work is
   parallel;
2. band offsets = exclusive prefix sum over the band-totals table. That
   table is band-cardinality-sized (hundreds of rows for a fixed-width
   numeric band, one row per distinct prefix for a string band), so its
   prefix-sum window is metadata-sized by construction; offsets join
   back as a broadcast.

Band granularity is the balance knob: a coarser band means fewer,
bigger per-band sorts (skew), a finer one means a bigger offset table.
Production engines derive boundaries from a range sample
(``repartitionByRange`` does exactly that) — a fixed band expression
keeps the whole plan deterministic, which the cross-engine oracle
requires.

Exactness contract for :func:`banded_cumsum`: the summed columns must be
integral or decimal. The decomposition re-associates the additions
(band totals first, then within-band), which is value-identical only
for exact types; a double sum could differ in the last ulp from the
single-window order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number_banded(
    df: DataFrame,
    band: Column,
    order_cols: Sequence[Column | str],
    rank_col: str = "rn",
) -> DataFrame:
    """Append 1-based ``rank_col`` = row number under ``order_cols``.

    ``band`` must be an order-consistent coarsening of ``order_cols``:
    ascending band order must agree with the row order (every row of a
    smaller band sorts before every row of a larger one), and no order
    column may be null. The band-totals table must be small enough to
    broadcast — pick the band expression so its cardinality is bounded
    by the key DOMAIN (value range / prefix alphabet), never by the row
    count.
    """
    b = df.withColumn("_bkt", band)
    counts = b.groupBy("_bkt").agg(F.count("*").alias("_n"))
    # Exclusive prefix sum over the tiny band table (one row per
    # distinct band — metadata-sized, the only unpartitioned window).
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    win = Window.partitionBy("_bkt").orderBy(*order_cols)
    return (
        b.join(F.broadcast(offsets), "_bkt")
        .withColumn(rank_col, F.row_number().over(win) + F.col("_off"))
        .drop("_bkt", "_off")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rn",
    prefix_len: int = 4,
) -> DataFrame:
    """Append 1-based ``rank_col`` = row number under ``order_cols``.

    The leading order column must be a string (its prefix forms the
    range band); the full ``order_cols`` list must be a total order
    (include a unique key as the last tie-break) or ranks within ties
    are nondeterministic.
    """
    lead = order_cols[0]
    return global_row_number_banded(
        df,
        F.substring(F.col(lead), 1, prefix_len),
        list(order_cols),
        rank_col,
    )


def banded_cumsum(
    df: DataFrame,
    order_col: str,
    band: Column,
    cum_cols: dict[str, str],
    exclusive: bool = False,
    totals: dict[str, str] | None = None,
) -> DataFrame:
    """Append running totals under ``ORDER BY order_col`` (ascending).

    ``cum_cols`` maps output name -> existing column to accumulate; the
    accumulated columns must be integral or decimal (see module
    docstring — double sums are order-sensitive and banding re-orders
    the additions). ``band`` must be an ascending order-consistent
    coarsening of ``order_col`` (e.g. ``F.floor(F.col(v) / width)``)
    with domain-bounded cardinality; ``order_col`` must be unique per
    row (a histogram key) and non-null. ``exclusive=True`` sums strictly
    preceding rows only (frame ``(unbounded, -1)``).

    ``totals`` maps grand-total output name -> a ``cum_cols`` output
    name; each is the exact sum of that column's source over the whole
    frame, computed from the band-totals table (sum of band sums — no
    second pass over ``df``, which matters because exchange reuse does
    not dedup the histogram subtree) and cross-joined back as one
    broadcast row.
    """
    b = df.withColumn("_bkt", band)
    per = b.groupBy("_bkt").agg(
        *[F.sum(src).alias(f"_t_{out}") for out, src in cum_cols.items()]
    )
    if totals:
        # per feeds both the offsets and the grand totals; it is
        # band-cardinality-sized (metadata), so materializing it once
        # keeps the data-sized input from being recomputed per consumer
        # (exchange reuse does not dedup the shared subtree).
        from .stage import materialize_stage

        per = materialize_stage(per)
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per.select(
        "_bkt",
        *[
            F.coalesce(F.sum(f"_t_{out}").over(woff), F.lit(0)).alias(
                f"_off_{out}"
            )
            for out in cum_cols
        ],
    )
    end = -1 if exclusive else 0
    win = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    out = b.join(F.broadcast(offsets), "_bkt")
    for name, src in cum_cols.items():
        out = out.withColumn(
            name,
            F.coalesce(F.sum(src).over(win), F.lit(0))
            + F.col(f"_off_{name}"),
        )
    out = out.drop("_bkt", *[f"_off_{n}" for n in cum_cols])
    if totals:
        tot = per.agg(
            *[
                F.sum(f"_t_{cum_name}").alias(total_name)
                for total_name, cum_name in totals.items()
            ]
        )
        out = out.crossJoin(F.broadcast(tot))
    return out


def freq_banded_ids(
    vocab: DataFrame,
    count_col: str = "c",
    token_col: str = "w",
    id_col: str = "tok_id",
    prefix_len: int = 2,
) -> DataFrame:
    """Append dense 1-based ``id_col`` = rank under ``(count DESC,
    token ASC)`` — the tokenizer-dictionary assignment — without any
    window seeing the whole vocabulary.

    Two band levels, both order-consistent with the target order:

    1. the exact count value. Distinct counts are far fewer than vocab
       entries (heavy repetition in any Zipf-ish distribution), so the
       per-count offset table stays metadata-sized and broadcasts;
    2. within a count, a ``prefix_len`` prefix of the token. This splits
       the huge low-count bands (half a vocabulary is hapax) so no
       single task sorts them; the per-(count, prefix) offset table can
       approach vocab size, so its prefix sum runs PARTITIONED by count
       and joins back by shuffle, never broadcast.
    """
    b = vocab.withColumn("_p", F.substring(F.col(token_col), 1, prefix_len))
    cp = b.groupBy(count_col, "_p").agg(F.count("*").alias("_m"))
    c_tot = cp.groupBy(count_col).agg(F.sum("_m").alias("_mc"))
    w1 = Window.orderBy(F.col(count_col).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off1 = c_tot.select(
        count_col, F.coalesce(F.sum("_mc").over(w1), F.lit(0)).alias("_off1")
    )
    w2 = (
        Window.partitionBy(count_col)
        .orderBy("_p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off2 = cp.select(
        count_col,
        "_p",
        F.coalesce(F.sum("_m").over(w2), F.lit(0)).alias("_off2"),
    )
    win = Window.partitionBy(count_col, "_p").orderBy(token_col)
    return (
        b.join(off2, [count_col, "_p"])
        .join(F.broadcast(off1), count_col)
        .withColumn(
            id_col,
            F.row_number().over(win) + F.col("_off1") + F.col("_off2"),
        )
        .drop("_p", "_off1", "_off2")
    )
