"""Iterative graph analytics on DataFrames: PageRank (Page et al. '99).

The repo already has the other canonical iterative-join algorithm
(transitive-closure label propagation, operators/components.py); PageRank
is its weighted cousin and the standard "importance over a relationship
graph" primitive (entity ranking, seed selection for crawl/curation).

Physical shape per iteration: ONE equi-join of the rank table with the
edge list on the source id, then ONE hash aggregation by destination —
the same shape Pregel/GraphX lowers to, expressed directly in DataFrame
ops so Catalyst/AQE handle it. At 100 TB: pre-partition edges and ranks
on the join key once (bucketing or repartition) so every iteration's
join is co-located, and cut lineage with a reliable checkpoint every few
iterations (operators/stage.py) — the rank table is O(nodes), tiny next
to the edge list, and never collected to the driver.

Determinism contract (cross-engine oracle-checkable): per-edge
contributions are rounded to 1e-12 and summed through DECIMAL(38,12)
(order-independent), and each new rank rounds to 1e-12 — identical
values under any partitioning, AQE re-plan, or engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stage import materialize_stage

DEC12 = "decimal(38,12)"


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    prematerialized: bool = False,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """Rank nodes of a directed edge list (columns ``src``, ``dst``).

    Every node MUST have out-degree >= 1 (symmetrize the edge list for
    undirected graphs — also what removes dangling-mass bookkeeping).
    The precondition is ENFORCED, not assumed: a sink (dst-only) node
    would silently leak its inbound mass every iteration, producing
    non-mass-conserving ranks, so the operator raises ValueError naming
    the sink count instead. Returns (node, pr).

    The node/sink tally is the only driver-side scalar (one ~O(nodes)
    action, like the k-means centroid collect): it sizes the jump term
    (1-d)/N and checks the precondition in the same pass.

    ``prematerialized=True`` promises the caller already cut the edge
    list's lineage (e.g. checkpointed the pre-symmetrization pair table,
    of which ``edges`` is a shuffle-free union of projections) — the
    operator then skips its own checkpoint, halving materialized bytes
    for symmetrized graphs.
    """
    # The edge list feeds every iteration's join PLUS outdeg and the node
    # table; materialized once so the (possibly expensive) derivation
    # upstream isn't recomputed per reference — on a cluster this is the
    # "build the edge list once, co-partitioned on src" step.
    if not prematerialized:
        edges = materialize_stage(edges)
    # r14 (guide §2.4): `out` is the ONE O(nodes) aggregate the loop
    # body needs every iteration — materialized once so no iteration
    # re-scans the edge list to re-derive it. For every graph this
    # operator ACCEPTS (outdeg >= 1 enforced below), the node table IS
    # out's key set, so `nodes` is a free projection of that checkpoint
    # instead of a second edge-list pass (union + distinct + its own
    # checkpoint, the pre-r14 shape); the precondition check reduces to
    # "no dst is missing from out" (one dst-only anti-join).
    out = materialize_stage(
        edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    )
    nodes = out.select(F.col("src").alias("node"))
    sinks = (
        edges.select(F.col("dst").alias("node"))
        .distinct()
        .join(nodes, "node", "left_anti")
        .count()
    )
    n = out.count()  # O(nodes) checkpoint scan, metadata-sized action
    if sinks:
        raise ValueError(
            f"pagerank: {sinks} of {n + sinks} nodes have out-degree 0 "
            "(dst-only sinks); their inbound mass would vanish each "
            "iteration. Symmetrize the edge list or add self-loops/"
            "dangling-mass redistribution before calling."
        )
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    jump = (1.0 - damping) / n  # IEEE double, same op the oracle runs
    # r14 (guide §2.4, §3): attach outdeg to the edge list ONCE instead
    # of re-joining `out` inside every iteration — iters joins removed
    # from the loop for one up-front equi-join + materialization. The
    # division still happens per edge with the identical operands
    # (round(pr/outdeg, 12)), so ranks are bit-identical. At 100 TB the
    # materialized (src, dst, outdeg) table is the co-partitioned edge
    # input the module docstring calls for; per iteration only the
    # O(nodes) rank table moves (AQE broadcasts it when it fits).
    ed = materialize_stage(edges.join(out, "src"))
    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for i in range(iters):
        contrib = (
            ed.join(pr, ed["src"] == pr["node"])
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("pr") / F.col("outdeg"), 12)
                .cast(DEC12)
                .alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = nodes.join(sums, "node", "left").select(
            "node",
            F.round(
                F.lit(jump)
                + F.lit(damping)
                * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                12,
            ).alias("pr"),
        )
        # Cut lineage periodically, not every round: the nested plan is
        # linear-depth (each pr referenced once), so a few iterations
        # optimize fine, while each eager checkpoint costs a blocking
        # job (~1 s locally, a full stage barrier on a cluster). The
        # interval bounds plan depth / recovery cost for long runs.
        if (i + 1) % checkpoint_interval == 0 and (i + 1) < iters:
            pr = materialize_stage(pr)
    return pr
