"""Connected-components dedup clustering (operators.components).

The property pairwise loser-dropping cannot give: a CHAIN A≈B≈C (without
the A≈C pair) must collapse to exactly its minimum member.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_trans_spark.operators.components import (
    connected_components,
    dedup_keep_cluster_canonical,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_chain_collapses_to_min(spark):
    # 1-2, 2-3, 3-4 is one component; 10-11 another. (1,4) never observed.
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    comp = {
        r["id"]: r["comp"] for r in connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_keep_cluster_canonical_on_chain(spark):
    docs = spark.range(1, 8).select(F.col("id").alias("doc_id"))
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_cluster_canonical(docs, pairs).collect()
    )
    # chain {1,2,3} keeps 1; pair {5,6} keeps 5; isolated 4 and 7 survive.
    assert kept == [1, 4, 5, 7]


def test_pairwise_rule_vs_cluster_rule(spark):
    """The failure mode that motivates clustering: B≈A and C≈B drop B and
    C pairwise, but if instead the observed pairs are (A,B) and (B,C)
    only, the pairwise rule already handles it — the distinguishing case
    is when the MIDDLE id is lowest: pairs (2,5), (5,9) with doc 2 lowest
    behave the same, but pairs (5,2)... ids are ordered, so construct
    (2,5),(5,9): pairwise drops 5 and 9 → keeps 2; cluster keeps 2. Chains
    where pairwise over-keeps: (1,3),(2,3) — 3 loses twice, 1 and 2 both
    survive though 1≈3≈2 implies 1 and 2 are likely dups. The cluster
    rule keeps only 1."""
    docs = spark.range(1, 4).select(F.col("id").alias("doc_id"))
    pairs = _pairs(spark, [(1, 3), (2, 3)])
    kept_cluster = sorted(
        r["doc_id"]
        for r in dedup_keep_cluster_canonical(docs, pairs).collect()
    )
    assert kept_cluster == [1]

    from hadoop_trans_spark.operators.minhash import dedup_keep_canonical

    kept_pairwise = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect()
    )
    assert kept_pairwise == [1, 2]  # over-keeps 2 — the documented gap


def test_empty_pairs(spark):
    docs = spark.range(5).select(F.col("id").alias("doc_id"))
    pairs = _pairs(spark, [])
    assert connected_components(pairs).count() == 0
    assert dedup_keep_cluster_canonical(docs, pairs).count() == 5


def test_random_graphs_match_union_find(spark):
    """Fuzz: component labels agree with a driver-side union-find oracle
    on seeded random graphs (chains, stars, cliques arise naturally)."""
    import random

    def uf_components(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # fully compress, then label = min member of the set
        roots = {}
        for x in range(n_nodes):
            roots.setdefault(find(x), []).append(x)
        label = {}
        for members in roots.values():
            m = min(members)
            for x in members:
                label[x] = m
        return label

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 30
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(5, 25))
            }
        )
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], "id_a long, id_b long"
        )
        got = {
            r["id"]: r["comp"]
            for r in connected_components(pairs).collect()
        }
        want = uf_components(n, edges)
        touched = {x for e in edges for x in e}
        assert got == {x: want[x] for x in touched}, f"seed {seed}"
