"""Deterministic k-means (Lloyd) over an embedding column, expressed as
DataFrame ops — the clustering path that upgrades IVF search
(operators/similarity.py cell_centroids) from label-defined cells to
learned cells, and the classic corpus-organization primitive (topic
bucketing, stratified eval splits) of a training-data pipeline.

Determinism contract (what makes this oracle-checkable across engines):
  * init = the k vectors with smallest ids, cluster ordinal = id rank —
    no RNG, no seed state;
  * distances rounded to 6 decimals BEFORE the argmin, ties broken on
    cluster ordinal — assignment is stable under fp noise;
  * centroid updates average through decimal (order-independent under
    any partitioning / AQE re-plan).

Physical shape per iteration: centroids are k rows → broadcast to the
corpus (never a shuffle of the vectors), argmin is a per-row reduction
over the k broadcast candidates, and the update is one hash aggregation
keyed (cluster, dim) with map-side partials. Per-vector work is O(k·d);
the corpus is scanned once per iteration and never pairwise-joined with
itself. At 100 TB: iterate on a sample to convergence, then one final
assignment pass over the full corpus — same operator, sampled input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def _dbl(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def init_centroids(
    df: DataFrame, k: int, vec: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """First-k-by-id init: (cluster, c, c_sq). Deterministic, seedless."""
    first_k = df.orderBy(id_col).limit(k).select(id_col, vec)
    w = Window.orderBy(id_col)
    v = _dbl(F.col(vec))
    return first_k.select(
        (F.row_number().over(w) - 1).alias("cluster"),
        v.alias("c"),
        _dot(v, v).alias("c_sq"),
    )


def assign(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (id, v, v_sq, cluster, d2).

    Squared distance = v_sq + c_sq - 2·dot, with the single-vector terms
    hoisted out of the k-way candidate expansion; argmin via window
    row_number ordered (d2, cluster).
    """
    cand = corpus.crossJoin(F.broadcast(centroids)).withColumn(
        "d2",
        F.round(
            F.col("v_sq") + F.col("c_sq") - 2 * _dot(F.col("v"), F.col("c")),
            6,
        ),
    )
    w = Window.partitionBy("id").orderBy("d2", "cluster")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("id", "v", "v_sq", "cluster", "d2")
    )


def update_centroids(assigned: DataFrame, dim: int) -> DataFrame:
    """Per-cluster mean vector via one (cluster, dim) hash aggregation;
    means go through decimal then round(6) so the new centroids are
    bit-identical under any execution order."""
    by_dim = assigned.select(
        "cluster", F.posexplode("v").alias("pos", "val")
    )
    means = by_dim.groupBy("cluster", "pos").agg(
        F.round(F.sum(F.col("val").cast(DEC)) / F.count("val"), 6)
        .cast("double")
        .alias("m")
    )
    packed = means.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("c")
    )
    return packed.select(
        "cluster", "c", _dot(F.col("c"), F.col("c")).alias("c_sq")
    )


def kmeans_assignments(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; return the final per-vector
    assignment (id, cluster, d2)."""
    dim_probe = df.select(F.size(vec).alias("d")).first()
    dim = int(dim_probe["d"])
    v = _dbl(F.col(vec))
    corpus = df.select(
        F.col(id_col).alias("id"), v.alias("v"), _dot(v, v).alias("v_sq")
    )
    cents = init_centroids(df, k, vec=vec, id_col=id_col)
    assigned = assign(corpus, cents)
    for _ in range(iters - 1):
        cents = update_centroids(assigned, dim)
        assigned = assign(corpus, cents)
    return assigned.select("id", "cluster", "d2")
