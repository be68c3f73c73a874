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
