"""Graph analytics queries: PageRank over the customer-supplier
transaction graph (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.graph import pagerank
from .base import query


def _pagerank_oracle(iters: int = 3) -> str:
    """Unrolled fixed-iteration PageRank as a DuckDB CTE chain, arithmetic
    mirrored op-for-op against operators/graph.py: 1e0 - 85e-2 (NOT a
    0.15 literal — IEEE 1.0-0.85 is 0.15000000000000002 and both engines
    must compute the same double), per-edge contributions rounded to
    1e-12 and summed through DECIMAL(38,12), ranks re-rounded to 1e-12.
    """
    sql = """
    WITH pairs AS (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs
    ),
    outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    p0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS pr
           FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
    c{i} AS (SELECT e.dst AS node,
                SUM(CAST(ROUND(p.pr / o.outdeg, 12) AS DECIMAL(38,12))) AS s
             FROM edges e
             JOIN p{i - 1} p ON e.src = p.node
             JOIN outdeg o ON e.src = o.src
             GROUP BY 1),
    p{i} AS (SELECT n.node,
                ROUND((1e0 - 85e-2) / (SELECT n FROM nn)
                      + 85e-2 * CAST(COALESCE(c.s, 0) AS DOUBLE), 12) AS pr
             FROM nodes n LEFT JOIN c{i} c ON n.node = c.node)"""
    sql += f"""
    SELECT 's' || CAST(node // 2 AS VARCHAR) AS node, pr
    FROM p{iters} WHERE node % 2 = 1 ORDER BY node
    """
    return sql


@query("q123_pagerank", oracle=_pagerank_oracle(3))
def q123_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) over the symmetrized
    customer-supplier graph derived from orders ⋈ lineitem — "which
    suppliers sit at the center of the purchase network". Per iteration:
    one rank⋈edges equi-join + one groupBy(dst) — the Pregel shape in
    plain DataFrame ops; see operators/graph.py for the 100 TB notes
    (co-partitioned edges, periodic checkpoint, O(nodes) rank table)."""
    from ..operators.stage import materialize_stage

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # Nodes share one bigint id space (customer 2k, supplier 2k+1):
    # integer join/agg keys shuffle a fraction of the bytes of string
    # labels, and the label is reconstructed only on the final output.
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # Materialize the pair table (the expensive join+distinct); the
    # symmetrized edge list is a shuffle-free union of two projections
    # of it, so pagerank() can skip re-checkpointing the doubled rows.
    pairs = materialize_stage(pairs)
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    pr = pagerank(edges, iters=3, damping=0.85, prematerialized=True)
    return (
        pr.where(F.col("node") % 2 == 1)
        .select(
            F.concat(F.lit("s"), F.expr("CAST(node DIV 2 AS STRING)")).alias(
                "node"
            ),
            "pr",
        )
        .orderBy("node")
    )


@query(
    "q140_triangle_count",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT supplier, COUNT(*) AS n_triangles
    FROM (SELECT a AS supplier FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY supplier
    ORDER BY supplier
    """,
)
def q140_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counting on the supplier co-occurrence graph
    (suppliers sharing an order are connected) — the clustering-structure
    primitive behind community detection and spam/fraud graph features.
    Edges are oriented low-id → high-id, so each triangle a<b<c is
    enumerated exactly once by two equi-joins (wedge build (a,b)+(b,c),
    then closure check (a,c) against the edge set); the per-vertex count
    is one hash aggregate over the 3-way vertex fan-out. At 100 TB the
    standard upgrade is degree ordering (orient low-degree → high-degree
    instead of by id) which bounds wedge fan-out by arboricity, and
    hash-partitioning edges by wedge-center vertex — both reshape THIS
    plan, not replace it. No broadcast hints: AQE picks sides from
    measured sizes (the edge table's size is data-dependent)."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
            "left_semi",
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    verts = (
        tri.select(F.col("a").alias("supplier"))
        .unionAll(tri.select(F.col("b").alias("supplier")))
        .unionAll(tri.select(F.col("c").alias("supplier")))
    )
    return (
        verts.groupBy("supplier")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy("supplier")
    )
