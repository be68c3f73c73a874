"""Third-engine rederivations for the graph family.

PageRank, triangle counting, BFS reachability, degree distribution and
Adamic-Adar are textbook algorithms; here each is re-implemented over
plain Python dicts/sets from the raw parquet (adjacency built with
loops, no SQL joins) and compared to the full query output. The
PageRank model reproduces the repo's cross-engine determinism contract
exactly: per-edge contributions double-rounded HALF_UP at 1e-12, summed
exactly in Decimal, damped update re-rounded at 1e-12, output through
the decimal domain at 1e-9 — stated a third time, independently.

Run at sf0.01 too when touched:

    SF_SMOKE_DIR=/root/testdata/sf0.01 python -m pytest \
        tests/test_third_engine_graph.py -q
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from hadoop_trans_spark.queries import QUERIES


def _sql(q: str):
    return duckdb.sql(q).fetchall()


def _rows(spark, smoke_dir, name):
    return [r.asDict() for r in QUERIES[name](spark, smoke_dir).collect()]


def _q(x: float, places: int) -> Decimal:
    return Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-places), ROUND_HALF_UP
    )


def _supplier_backbone_edges(smoke_dir: str) -> list[tuple[int, int]]:
    """Top-2000 supplier co-purchase edges by (weight desc, u, v) — the
    q140/q147 backbone, rebuilt from per-order distinct supplier sets."""
    rows = _sql(
        f"select l_orderkey, l_suppkey from "
        f"read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    per_order: dict[int, set] = {}
    for o, s in rows:
        per_order.setdefault(o, set()).add(int(s))
    w = Counter()
    for sups in per_order.values():
        sups = sorted(sups)
        for i in range(len(sups)):
            for j in range(i + 1, len(sups)):
                w[(sups[i], sups[j])] += 1
    ranked = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))
    return [uv for uv, _ in ranked[:2000]]


def _part_pairs(smoke_dir: str) -> set[tuple[int, int]]:
    rows = _sql(
        f"select l_orderkey, l_partkey from "
        f"read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    per_order: dict[int, set] = {}
    for o, p in rows:
        per_order.setdefault(o, set()).add(int(p))
    pairs = set()
    for ps in per_order.values():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pairs.add((ps[i], ps[j]))
    return pairs


def test_pagerank_matches_python(spark, smoke_dir):
    """q123: 3 damped iterations over the symmetrized customer-supplier
    graph with the pinned rounding contract."""
    rows = _sql(
        f"select distinct o.o_custkey, l.l_suppkey from "
        f"read_parquet('{smoke_dir}/orders.parquet') o join "
        f"read_parquet('{smoke_dir}/lineitem.parquet') l "
        f"on o.o_orderkey = l.l_orderkey"
    )
    edges: dict[int, list[int]] = {}
    for c, s in rows:
        a, b = int(c) * 2, int(s) * 2 + 1
        edges.setdefault(a, []).append(b)
        edges.setdefault(b, []).append(a)
    nodes = sorted(edges)
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    base = (1e0 - 85e-2) / n
    for _ in range(3):
        acc = {v: Decimal(0) for v in nodes}
        for src, dsts in edges.items():
            contrib = _q(pr[src] / len(dsts), 12)
            for dst in dsts:
                acc[dst] += contrib
        pr = {
            v: float(_q(base + 85e-2 * float(acc[v]), 12)) for v in nodes
        }
    expect = [
        {
            "node": f"s{v // 2}",
            "pr": float(_q(pr[v], 12).quantize(Decimal("0.000000001"), ROUND_HALF_UP)),
        }
        for v in nodes
        if v % 2 == 1
    ]
    expect.sort(key=lambda r: r["node"])
    assert _rows(spark, smoke_dir, "q123_pagerank") == expect


def test_triangle_count_matches_python(spark, smoke_dir):
    """q140: per-vertex triangle counts over the oriented backbone —
    wedges (a<b, b<c) closed by (a, c)."""
    e = set(_supplier_backbone_edges(smoke_dir))
    out: dict[int, list[int]] = {}
    for u, v in e:
        out.setdefault(u, []).append(v)
    counts = Counter()
    for a, bs in out.items():
        for b in bs:
            for c in out.get(b, ()):
                if (a, c) in e:
                    counts[a] += 1
                    counts[b] += 1
                    counts[c] += 1
    expect = [
        {"supplier": s, "n_triangles": counts[s]} for s in sorted(counts)
    ]
    got = _rows(spark, smoke_dir, "q140_triangle_count")
    assert got == expect
    assert expect, "backbone has no triangles — closure untested"


def test_recursive_bfs_matches_python(spark, smoke_dir):
    """q147: hop distance ≤ 3 from the busiest supplier over the
    symmetrized backbone — plain frontier expansion."""
    rows = _sql(
        f"select l_suppkey, count(*) from "
        f"read_parquet('{smoke_dir}/lineitem.parquet') group by 1"
    )
    seed = sorted(rows, key=lambda r: (-r[1], r[0]))[0][0]
    adj: dict[int, list[int]] = {}
    for u, v in _supplier_backbone_edges(smoke_dir):
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    dist = {int(seed): 0}
    frontier = [int(seed)]
    for d in range(1, 4):
        nxt = []
        for node in frontier:
            for nbr in adj.get(node, ()):
                if nbr not in dist:
                    dist[nbr] = d
                    nxt.append(nbr)
        frontier = nxt
    expect = [
        {"suppkey": k, "hops": dist[k]} for k in sorted(dist)
    ]
    assert _rows(spark, smoke_dir, "q147_recursive_bfs") == expect
    # the walk expanded beyond the seed (the sf0.001 backbone is near-
    # complete, saturating at hop 1; sf0.01 reaches the 3-hop cap)
    assert len(dist) > 1


def test_degree_distribution_matches_python(spark, smoke_dir):
    """q200: histogram of part co-purchase degrees — pure set algebra."""
    deg = Counter()
    for u, v in _part_pairs(smoke_dir):
        deg[u] += 1
        deg[v] += 1
    hist = Counter(deg.values())
    expect = [
        {"degree": d, "n_nodes": hist[d]} for d in sorted(hist)
    ]
    assert _rows(spark, smoke_dir, "q200_degree_distribution") == expect


def test_adamic_adar_matches_python(spark, smoke_dir):
    """q204: AA link prediction — hub-pruned (deg ≤ 64) wedges, degree-1
    intermediates excluded, per-term 1/ln(deg) double-rounded at 1e-9
    then summed exactly, existing edges removed, top-20 by
    (rounded score desc, u, v)."""
    pairs = _part_pairs(smoke_dir)
    nbrs: dict[int, set] = {}
    for u, v in pairs:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    deg = {n: len(s) for n, s in nbrs.items()}
    scores: dict[tuple[int, int], Decimal] = {}
    common: dict[tuple[int, int], int] = {}
    for node, d in deg.items():
        if d > 64 or d <= 1:
            continue
        term = _q(1.0 / math.log(d), 9)
        # the hub prune applies to the INTERMEDIATE node only — its
        # neighbors join at any degree
        wedge_nbrs = sorted(nbrs[node])
        for i in range(len(wedge_nbrs)):
            for j in range(i + 1, len(wedge_nbrs)):
                key = (wedge_nbrs[i], wedge_nbrs[j])
                scores[key] = scores.get(key, Decimal(0)) + term
                common[key] = common.get(key, 0) + 1
    cand = [
        (u, v, common[(u, v)], float(s.quantize(Decimal("0.000001"), ROUND_HALF_UP)))
        for (u, v), s in scores.items()
        if (u, v) not in pairs
    ]
    top = sorted(cand, key=lambda r: (-r[3], r[0], r[1]))[:20]
    expect = [
        {"u": u, "v": v, "common": c, "aa_score": s} for u, v, c, s in top
    ]
    assert _rows(spark, smoke_dir, "q204_adamic_adar") == expect
