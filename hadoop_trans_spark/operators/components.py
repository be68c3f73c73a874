"""Connected components over a pair graph (transitive-closure dedup).

Near-dup pairs are edges; a duplicate CLUSTER is a connected component.
Pairwise loser-dropping (operators.minhash.dedup_keep_canonical) can keep
the middle of a chain A≈B≈C (B loses to A, C loses to B → only A survives
iff the pair (A,C) was found; with transitivity it need not be). The
cluster-level rule — keep exactly the minimum id of each component — is
what a training-data pipeline actually runs.

Algorithm: iterative min-label propagation expressed in DataFrame ops.
Each node starts labeled with its own id; every round each node takes the
min of its label and its neighbors' labels; converges when no label
changes. Rounds needed = graph diameter (near-dup clusters are shallow —
a handful of rounds). Each round is one equi-join + one groupBy — all
shuffle-partitioned by node id, no driver materialization; the
convergence check is a metadata-sized count.

Scale notes (100 TB): label propagation is the classic BSP formulation
(Pregel-style); for adversarially long chains use the large-star/
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) which converges in O(log n) rounds with the same
join/groupBy primitives. Each round materializes its label table via
operators.stage.materialize_stage to cut lineage growth (reliable
checkpoint when a checkpoint dir is configured; see SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stage import materialize_stage


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, comp) for every node in `pairs`; comp = min node id reachable.

    Only nodes that appear in at least one pair are returned (isolated
    rows of the original table are their own components by definition and
    never need to shuffle).
    """
    edges = materialize_stage(
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            pairs.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .distinct()
    )
    labels = materialize_stage(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    for _ in range(max_iter):
        # Min label among neighbors, one hop: join labels onto edge
        # destinations, aggregate per source.
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("comp").alias("nbr_comp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nbr_comp").alias("nbr_min"))
        )
        # r14 (guide §2.4): the previous label rides the materialized
        # row as `prev`, so the convergence check is a filter+count over
        # the checkpoint just written — the old shape re-joined
        # new_labels against old labels (a second O(nodes) shuffle join
        # per round) for the same answer.
        new_labels = materialize_stage(
            labels.join(nbr_min.withColumnRenamed("src", "id"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_min", "comp")
                ).alias("comp"),
                F.col("comp").alias("prev"),
            )
        )
        changed = (
            new_labels.where(F.col("comp") != F.col("prev")).count()
        )
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    return labels


def cluster_best_members(
    comp: DataFrame, scored: DataFrame, id_col: str, score_col: str
) -> DataFrame:
    """Per cluster: the highest-scoring member (ties → lowest id) plus
    member count — the quality-ranked keep rule real curation pipelines
    use instead of min-id. One join (cluster table is O(dups), tiny) and
    one window over it."""
    from pyspark.sql import Window as W

    members = comp.join(
        scored.select(F.col(id_col).alias("id"), F.col(score_col).alias("score")),
        "id",
    )
    w = W.partitionBy("comp").orderBy(F.col("score").desc(), F.col("id"))
    return (
        members.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(W.partitionBy("comp")))
        .where(F.col("rn") == 1)
        .select(
            F.col("comp").alias("cluster_id"),
            F.col("id").alias("keep_doc"),
            F.col("score").alias("keep_score"),
            "n_members",
        )
    )


def dedup_keep_cluster_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one row (minimum id) per near-dup CLUSTER.

    Transitive closure of the pair graph, then a left-anti join of the
    corpus against the non-canonical member set — like the pairwise rule,
    one broadcast-able metadata join at 100 TB; the corpus itself never
    reshuffles."""
    comp = connected_components(pairs)
    losers = comp.where(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
