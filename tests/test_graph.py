"""PageRank operator tests: conservation, known-graph values, and the
per-iteration plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_trans_spark.operators.graph import pagerank


def _pr(spark, edge_list, iters=3):
    e = spark.createDataFrame(edge_list, "src string, dst string")
    return {
        r["node"]: r["pr"] for r in pagerank(e, iters=iters).collect()
    }


def test_pagerank_mass_conserved_and_star_ordering(spark):
    # undirected star a-b, a-c (symmetrized): hub must outrank leaves,
    # leaves tie exactly, total mass stays 1.
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")]
    for iters in (1, 2, 3):
        pr = _pr(spark, edges, iters=iters)
        assert abs(sum(pr.values()) - 1.0) < 1e-9, pr
        assert pr["a"] > pr["b"] == pr["c"], pr


def test_pagerank_two_cycle_is_stationary(spark):
    # 1<->2: uniform 0.5 is the fixed point; iteration must not drift.
    pr = _pr(spark, [("1", "2"), ("2", "1")], iters=4)
    assert pr == {"1": 0.5, "2": 0.5}, pr


def test_pagerank_known_values_one_iteration(spark):
    # hand-computed: star with outdeg(a)=2, leaves outdeg 1, N=3:
    # p1(a) = 0.15/3 + 0.85*(1/3 + 1/3); p1(leaf) = 0.15/3 + 0.85*(1/6)
    pr = _pr(spark, [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")], iters=1)
    assert abs(pr["a"] - (0.05 + 0.85 * (2 / 3))) < 1e-9
    assert abs(pr["b"] - (0.05 + 0.85 * (1 / 6))) < 1e-9


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank(e, iters=2).count() == 0


def test_pagerank_invariant_under_repartition(spark):
    """Decimal-summed contributions make ranks bit-identical regardless
    of partitioning — the determinism contract that lets an iterative
    operator be oracle-checked at all."""
    import random

    rng = random.Random(7)
    pairs = {(f"n{rng.randrange(40)}", f"n{rng.randrange(40)}") for _ in range(120)}
    edge_list = [(a, b) for a, b in pairs if a != b]
    sym = edge_list + [(b, a) for a, b in edge_list]
    e1 = spark.createDataFrame(sym, "src string, dst string")
    e8 = e1.repartition(8)
    pr1 = {r["node"]: r["pr"] for r in pagerank(e1, iters=3).collect()}
    pr8 = {r["node"]: r["pr"] for r in pagerank(e8, iters=3).collect()}
    assert pr1 == pr8
    assert abs(sum(pr1.values()) - 1.0) < 1e-8


def test_pagerank_rejects_sink_nodes(spark):
    """A dst-only node leaks its inbound mass every iteration, so the
    out-degree>=1 precondition is enforced, not just documented."""
    import pytest

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "sink")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="out-degree 0"):
        pagerank(e, iters=1)
