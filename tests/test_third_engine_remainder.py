"""Third-engine rederivations for the round-9 remainder — the declared
queries that had no independent (non-SQL) model yet: broadcast/range/
bloom join shapes, sketch differentials' exact sides, IO roundtrips'
content fingerprints, skyline, RAKE, winsorize, market basket, pattern
match, and the bracket families. Each output is re-derived from the raw
parquet with plain Python (dicts, sorts, Decimal, hashlib, re) and
compared to the full Spark query output — no repo SQL, no repo
operators, so a misconception shared by the Spark query and its DuckDB
oracle cannot hide here.

Run at sf0.01 too when touched:

    SF_SMOKE_DIR=/root/testdata/sf0.01 python -m pytest \
        tests/test_third_engine_remainder.py -q
"""

from __future__ import annotations

import datetime
import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal
from itertools import combinations

import duckdb

from hadoop_trans_spark.queries import QUERIES


def _sql(smoke_dir: str, table: str, cols: str):
    return duckdb.sql(
        f"select {cols} from read_parquet('{smoke_dir}/{table}.parquet')"
    ).fetchall()


def _rows(spark, smoke_dir, name):
    return [r.asDict() for r in QUERIES[name](spark, smoke_dir).collect()]


def _dec(x: float, places: int = 6) -> Decimal:
    """double → decimal cast/round the way Spark does it (HALF_UP on the
    decimal the float prints as)."""
    return Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-places), ROUND_HALF_UP
    )


def _dsum(values) -> float:
    """Model of queries/base.dsum: quantize each double at 1e-6, exact
    decimal sum (already scale-6, so the final round is a no-op)."""
    return float(sum((_dec(v) for v in values), Decimal(0)))


def _round(x: float, places: int = 6) -> float:
    return float(_dec(x, places))


# --- joins ------------------------------------------------------------------


def test_broadcast_join_matches_python(spark, smoke_dir):
    """q04: lineitem ⋈ part(p_size<=20) revenue by brand."""
    brand = {
        k: b
        for k, b, s in _sql(smoke_dir, "part", "p_partkey, p_brand, p_size")
        if s <= 20
    }
    rev: dict[str, Decimal] = defaultdict(Decimal)
    n: Counter = Counter()
    for pk, e, d in _sql(
        smoke_dir, "lineitem", "l_partkey, l_extendedprice, l_discount"
    ):
        b = brand.get(pk)
        if b is not None:
            rev[b] += _dec(e * (1 - d))
            n[b] += 1
    expect = [
        {"brand": b, "revenue": float(rev[b]), "n_items": n[b]}
        for b in sorted(rev)
    ]
    assert _rows(spark, smoke_dir, "q04_broadcast_join") == expect


def test_binned_range_join_matches_python(spark, smoke_dir):
    """q92: lineitems inside ±15-day windows around the top-5 orders,
    half-open [start, end) exactly as the operator declares."""
    orders = _sql(smoke_dir, "orders", "o_orderkey, o_orderdate, o_totalprice")
    top5 = sorted(orders, key=lambda r: (-r[2], r[0]))[:5]
    windows = [
        (k, d - datetime.timedelta(days=15), d + datetime.timedelta(days=15))
        for k, d, _ in top5
    ]
    agg: dict[int, list] = {}
    for ship, qty in _sql(smoke_dir, "lineitem", "l_shipdate, l_quantity"):
        for pid, w0, w1 in windows:
            if w0 <= ship < w1:
                cur = agg.setdefault(pid, [0, Decimal(0)])
                cur[0] += 1
                cur[1] += _dec(qty)
    expect = [
        {"promo_id": pid, "n_items": c, "qty_sum": float(q)}
        for pid, (c, q) in sorted(agg.items())
    ]
    assert _rows(spark, smoke_dir, "q92_binned_range_join") == expect


def test_bloom_prefilter_join_matches_semi_join_model(spark, smoke_dir):
    """q138: the bloom is a no-false-negative prefilter + exact verify,
    so the output must equal the plain high-balance semi-join."""
    dim = {
        k
        for k, b in _sql(smoke_dir, "supplier", "s_suppkey, s_acctbal")
        if b > 4500
    }
    rev: dict[int, Decimal] = defaultdict(Decimal)
    n: Counter = Counter()
    for sk, e, d in _sql(
        smoke_dir, "lineitem", "l_suppkey, l_extendedprice, l_discount"
    ):
        if sk in dim:
            rev[sk] += _dec(e * (1 - d))
            n[sk] += 1
    expect = [
        {"suppkey": k, "n_items": n[k], "revenue": float(rev[k])}
        for k in sorted(rev)
    ]
    assert _rows(spark, smoke_dir, "q138_bloom_prefilter_join") == expect


def test_correlated_subquery_matches_python(spark, smoke_dir):
    """q146: above-own-nation-average balance + EXISTS a qty>=45 line."""
    sup = _sql(
        smoke_dir, "supplier", "s_suppkey, s_name, s_nationkey, s_acctbal"
    )
    by_nation: dict[int, list] = defaultdict(list)
    for _, _, nk, bal in sup:
        by_nation[nk].append(bal)
    avg = {nk: math.fsum(v) / len(v) for nk, v in by_nation.items()}
    heavy = {
        sk
        for sk, q in _sql(smoke_dir, "lineitem", "l_suppkey, l_quantity")
        if q >= 45
    }
    expect = [
        {"s_suppkey": k, "s_name": nm, "acctbal": _round(bal)}
        for k, nm, nk, bal in sorted(sup)
        if bal > avg[nk] and k in heavy
    ]
    assert _rows(spark, smoke_dir, "q146_correlated_subquery") == expect


def test_discount_brackets_matches_python(spark, smoke_dir):
    """q208: TPC-H Q19 disjunctive bracket revenue (single row)."""
    part = {
        k: (b, s)
        for k, b, s in _sql(smoke_dir, "part", "p_partkey, p_brand, p_size")
    }
    rev, n = Decimal(0), 0
    for pk, q, e, d in _sql(
        smoke_dir,
        "lineitem",
        "l_partkey, l_quantity, l_extendedprice, l_discount",
    ):
        b, s = part[pk]
        hit = (
            (b == "Brand#12" and 1 <= s <= 5 and 1 <= q <= 11)
            or (b == "Brand#23" and 1 <= s <= 10 and 10 <= q <= 20)
            or (b == "Brand#34" and 1 <= s <= 15 and 20 <= q <= 30)
        )
        if hit:
            rev += _dec(e * (1 - d))
            n += 1
    # SUM over zero rows is NULL in Spark (sf0.001 has no bracket hits).
    assert _rows(spark, smoke_dir, "q208_discount_brackets") == [
        {"revenue": float(rev) if n else None, "n_lines": n}
    ]


def test_price_brackets_matches_python(spark, smoke_dir):
    """q212: half-open bracket assignment via the 5-bound dimension."""
    bounds = [
        ("micro", 0.0, 20000.0),
        ("small", 20000.0, 60000.0),
        ("medium", 60000.0, 120000.0),
        ("large", 120000.0, 200000.0),
        ("jumbo", 200000.0, 1000000000.0),
    ]
    rev: dict[str, Decimal] = defaultdict(Decimal)
    n: Counter = Counter()
    for (p,) in _sql(smoke_dir, "orders", "o_totalprice"):
        for name, lo, hi in bounds:
            if lo <= p < hi:
                rev[name] += _dec(p)
                n[name] += 1
    expect = [
        {"bracket": b, "n_orders": n[b], "revenue": float(rev[b])}
        for b in sorted(rev)
    ]
    assert _rows(spark, smoke_dir, "q212_price_brackets") == expect


# --- sketch differentials: exact sides --------------------------------------


def test_approx_distinct_exact_side_matches_python(spark, smoke_dir):
    """q12: exact per-flag distinct orders re-derived; the HLL estimate
    must sit within its declared 5% flag."""
    seen: dict[str, set] = defaultdict(set)
    for f, k in _sql(smoke_dir, "lineitem", "l_returnflag, l_orderkey"):
        if k is not None:
            seen[f].add(k)
    got = _rows(spark, smoke_dir, "q12_approx_distinct")
    assert [
        {"flag": r["flag"], "exact_orders": r["exact_orders"]} for r in got
    ] == [{"flag": f, "exact_orders": len(seen[f])} for f in sorted(seen)]
    assert all(r["within_5pct"] == 1 for r in got)


def test_hll_intersection_exact_side_matches_python(spark, smoke_dir):
    """q192: exact click/purchase audiences and their intersection."""
    users: dict[str, set] = {"click": set(), "purchase": set()}
    for t, u in _sql(smoke_dir, "events", "event_type, user_id"):
        if t in users and u is not None:
            users[t].add(u)
    [got] = _rows(spark, smoke_dir, "q192_hll_intersection")
    assert got["n_click"] == len(users["click"])
    assert got["n_purchase"] == len(users["purchase"])
    assert got["exact_intersection"] == len(users["click"] & users["purchase"])
    assert got["within_tol"] == 1


def test_approx_percentile_exact_side_matches_python(spark, smoke_dir):
    """q111: exact interpolated p50/p95 per flag (Spark `percentile`
    linear interpolation at rank p*(n-1)); sketch flag must hold."""
    vals: dict[str, list] = defaultdict(list)
    for f, e in _sql(smoke_dir, "lineitem", "l_returnflag, l_extendedprice"):
        vals[f].append(e)

    def interp(v: list, p: float) -> float:
        v = sorted(v)
        h = (len(v) - 1) * p
        lo = int(math.floor(h))
        hi = min(lo + 1, len(v) - 1)
        return v[lo] + (h - lo) * (v[hi] - v[lo])

    got = _rows(spark, smoke_dir, "q111_approx_percentile_diff")
    assert [
        {k: r[k] for k in ("l_returnflag", "p50_exact", "p95_exact")}
        for r in got
    ] == [
        {
            "l_returnflag": f,
            "p50_exact": _round(interp(vals[f], 0.5)),
            "p95_exact": _round(interp(vals[f], 0.95)),
        }
        for f in sorted(vals)
    ]
    assert all(r["approx_within_2pct"] for r in got)


# --- IO roundtrips: content fingerprints ------------------------------------


def test_xml_roundtrip_matches_python(spark, smoke_dir):
    """q122: the XML write→read must be content-lossless, so its output
    equals the per-nation aggregate over the raw supplier parquet."""
    rows = _sql(
        smoke_dir, "supplier", "s_suppkey, s_name, s_nationkey, s_acctbal"
    )
    bal: dict[int, Decimal] = defaultdict(Decimal)
    n: Counter = Counter()
    first: dict[int, str] = {}
    for _, nm, nk, b in rows:
        bal[nk] += _dec(b)
        n[nk] += 1
        first[nk] = min(first.get(nk, nm), nm)
    expect = [
        {
            "nation": nk,
            "n": n[nk],
            "bal_sum": float(bal[nk]),
            "first_name": first[nk],
        }
        for nk in sorted(bal)
    ]
    assert _rows(spark, smoke_dir, "q122_xml_roundtrip") == expect


def test_text_source_roundtrip_matches_python(spark, smoke_dir):
    """q149: gzip'd TSV+base64 lines boundary — per-lang fingerprint of
    the read-back must equal the raw documents aggregate."""
    agg: dict[str, list] = {}
    for i, lang, text in _sql(smoke_dir, "documents", "doc_id, lang, text"):
        cur = agg.setdefault(lang, [0, 0, i])
        cur[0] += 1
        cur[1] += len(text)
        cur[2] = min(cur[2], i)
    expect = [
        {"lang": g, "n_docs": c, "chars_sum": s, "min_id": m}
        for g, (c, s, m) in sorted(agg.items())
    ]
    assert _rows(spark, smoke_dir, "q149_text_source") == expect


def test_binaryfile_source_matches_hashlib(spark, smoke_dir):
    """q150: byte-exact blob ingest — md5 over utf-8 bytes via hashlib."""
    expect = [
        {
            "doc_id": i,
            "n_bytes": len(t.encode("utf-8")),
            "content_md5": hashlib.md5(t.encode("utf-8")).hexdigest(),
        }
        for i, t in sorted(_sql(smoke_dir, "documents", "doc_id, text"))
        if i % 25 == 0
    ]
    assert _rows(spark, smoke_dir, "q150_binaryfile_source") == expect


def test_corrupt_json_ingest_matches_python(spark, smoke_dir):
    """q213: deterministic corruption split (every 97th key truncated)
    re-derived arithmetically; valid revenue decimal-summed."""
    rows = _sql(smoke_dir, "orders", "o_orderkey, o_totalprice")
    bad = [k for k, _ in rows if k % 97 == 0]
    good = [(k, p) for k, p in rows if k % 97 != 0]
    assert _rows(spark, smoke_dir, "q213_corrupt_json_ingest") == [
        {
            "n_lines": len(rows),
            "n_corrupt": len(bad),
            "n_valid": len(good),
            "valid_revenue": _dsum(p for _, p in good),
        }
    ]


def test_nested_parquet_roundtrip_matches_python(spark, smoke_dir):
    """q221: Dremel shred/assemble must preserve nested content — output
    equals the flat orders⋈lineitem fingerprint."""
    status = {
        k: s for k, s in _sql(smoke_dir, "orders", "o_orderkey, o_orderstatus")
    }
    orders: dict[str, set] = defaultdict(set)
    firsts: Counter = Counter()
    rev: dict[str, Decimal] = defaultdict(Decimal)
    for ok, ln, e in _sql(
        smoke_dir, "lineitem", "l_orderkey, l_linenumber, l_extendedprice"
    ):
        st = status[ok]
        orders[st].add(ok)
        if ln == 1:
            firsts[st] += 1
        rev[st] += _dec(e)
    expect = [
        {
            "status": st,
            "n_orders": len(orders[st]),
            "n_first_lines": firsts[st],
            "line_revenue": float(rev[st]),
        }
        for st in sorted(orders)
    ]
    assert _rows(spark, smoke_dir, "q221_nested_parquet_roundtrip") == expect


def test_range_clustered_layout_invariants_match_python(spark, smoke_dir):
    """q180: the layout audit's invariants (8 files, row conservation,
    zero strict overlaps, global day bounds) from the raw table."""
    days = [d for (d,) in _sql(smoke_dir, "lineitem", "l_shipdate")]
    assert _rows(spark, smoke_dir, "q180_range_clustered_layout") == [
        {
            "n_files": 8,
            "total_rows": len(days),
            "n_overlaps": 0,
            "min_day": min(days).strftime("%Y-%m-%d"),
            "max_day": max(days).strftime("%Y-%m-%d"),
        }
    ]


# --- layout / ordering operators --------------------------------------------


def test_zorder_stats_match_python_morton(spark, smoke_dir):
    """q96: Morton interleave re-implemented bitwise in Python."""

    def zvalue(x: int, y: int) -> int:
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    agg: dict[int, list] = {}
    for u, ts in _sql(smoke_dir, "events", "user_id, ts"):
        x = u % 256
        y = (ts.hour * 60 + ts.minute) // 6
        b = zvalue(x, y) >> 8
        cur = agg.setdefault(b, [0, x, x, y, y])
        cur[0] += 1
        cur[1] = min(cur[1], x)
        cur[2] = max(cur[2], x)
        cur[3] = min(cur[3], y)
        cur[4] = max(cur[4], y)
    expect = [
        {
            "bucket": b,
            "n": c,
            "x_min": x0,
            "x_max": x1,
            "y_min": y0,
            "y_max": y1,
        }
        for b, (c, x0, x1, y0, y1) in sorted(agg.items())
    ]
    assert _rows(spark, smoke_dir, "q96_zorder_stats") == expect


def test_pareto_frontier_matches_quadratic_python(spark, smoke_dir):
    """q154: exact O(n²) dominance check (minimize price, maximize
    size; equal points all kept) — the naive model the distributed
    local-prune/global-refine operator must reproduce."""
    pts = [
        (k, p, int(s))
        for k, p, s in _sql(
            smoke_dir, "part", "p_partkey, p_retailprice, p_size"
        )
    ]
    expect = [
        {"p_partkey": k, "price": p, "size": s}
        for k, p, s in sorted(pts)
        if not any(
            (p2 <= p and s2 >= s) and (p2 < p or s2 > s)
            for _, p2, s2 in pts
        )
    ]
    assert _rows(spark, smoke_dir, "q154_pareto_frontier") == expect


# --- aggregates / maintenance -----------------------------------------------


def test_agg_battery_modern_matches_python(spark, smoke_dir):
    """q136: count_if / bool_and / bool_or / exact median / max_by /
    min_by per priority, with the query's decimal tie key."""
    rows = _sql(
        smoke_dir, "orders", "o_orderkey, o_orderpriority, o_orderstatus, o_totalprice"
    )
    by_p: dict[str, list] = defaultdict(list)
    for k, pr, st, tp in rows:
        by_p[pr].append((k, st, tp))

    def tiekey(k: int, tp: float) -> int:
        return int(_dec(tp * 100, 0)) * 1_000_000_000_000 + k

    expect = []
    for pr in sorted(by_p):
        g = by_p[pr]
        prices = sorted(tp for _, _, tp in g)
        n = len(prices)
        med = (
            prices[n // 2]
            if n % 2
            else (prices[n // 2 - 1] + prices[n // 2]) / 2
        )
        expect.append(
            {
                "o_orderpriority": pr,
                "n_orders": n,
                "n_finished": sum(1 for _, st, _ in g if st == "F"),
                "all_positive": all(tp > 0 for _, _, tp in g),
                "any_jumbo": any(tp > 400000 for _, _, tp in g),
                "median_price": _round(float(_dec(med, 9))),
                "top_order": max(g, key=lambda r: tiekey(r[0], r[2]))[0],
                "bottom_order": min(g, key=lambda r: tiekey(r[0], r[2]))[0],
            }
        )
    assert _rows(spark, smoke_dir, "q136_agg_battery_modern") == expect


def test_incremental_rollup_matches_scratch_python(spark, smoke_dir):
    """q161: base+delta merge must be indistinguishable from the
    from-scratch monthly rollup (algebraic mergeability)."""
    agg: dict[tuple, list] = {}
    for d, pr, tp in _sql(
        smoke_dir, "orders", "o_orderdate, o_orderpriority, o_totalprice"
    ):
        key = (d.strftime("%Y-%m"), pr)
        cur = agg.setdefault(key, [Decimal(0), 0])
        cur[0] += _dec(tp)
        cur[1] += 1
    expect = [
        {
            "month": m,
            "o_orderpriority": pr,
            "revenue": float(r),
            "n_orders": c,
        }
        for (m, pr), (r, c) in sorted(agg.items())
    ]
    assert _rows(spark, smoke_dir, "q161_incremental_rollup") == expect


def test_winsorize_matches_python(spark, smoke_dir):
    """q206: percentile_disc cutoffs from cumulative distinct-value
    counts, then clip counts and the decimal winsorized mean."""
    by_seg: dict[str, list] = defaultdict(list)
    for seg, v in _sql(smoke_dir, "customer", "c_mktsegment, c_acctbal"):
        by_seg[seg].append(v)
    expect = []
    for seg in sorted(by_seg):
        vs = by_seg[seg]
        n = len(vs)
        hist = Counter(vs)
        cum, p05, p95 = 0, None, None
        for v in sorted(hist):
            cum += hist[v]
            if p05 is None and cum >= math.ceil(0.05 * n):
                p05 = v
            if p95 is None and cum >= math.ceil(0.95 * n):
                p95 = v
        total = sum(_dec(min(max(v, p05), p95)) for v in vs)
        expect.append(
            {
                "seg": seg,
                "n": n,
                "p05": p05,
                "p95": p95,
                "n_clipped_low": sum(1 for v in vs if v < p05),
                "n_clipped_high": sum(1 for v in vs if v > p95),
                "winsorized_mean": float(
                    (total / n).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                ),
            }
        )
    assert _rows(spark, smoke_dir, "q206_winsorize_acctbal") == expect


# --- mining / text ----------------------------------------------------------


def test_market_basket_matches_python(spark, smoke_dir):
    """q178: A-priori first round re-derived with Counter/combinations."""
    brand = {
        k: b for k, b in _sql(smoke_dir, "part", "p_partkey, p_brand")
    }
    baskets: dict[int, set] = defaultdict(set)
    for ok, pk in _sql(smoke_dir, "lineitem", "l_orderkey, l_partkey"):
        baskets[ok].add(brand[pk])
    n_orders = len(baskets)
    freq = Counter()
    for items in baskets.values():
        freq.update(items)
    keep = {b for b, c in freq.items() if c >= 20}
    support = Counter()
    for items in baskets.values():
        support.update(combinations(sorted(items & keep), 2))
    expect = [
        {
            "b1": b1,
            "b2": b2,
            "support": s,
            "lift": _round(float(s) * n_orders / (float(freq[b1]) * freq[b2])),
        }
        for (b1, b2), s in sorted(support.items())
        if s >= 50
    ]
    assert _rows(spark, smoke_dir, "q178_market_basket") == expect


def test_event_pattern_match_matches_python_re(spark, smoke_dir):
    """q179: per-user event string + non-overlapping `vc*p` via re."""
    per_user: dict[int, list] = defaultdict(list)
    for u, ts, eid, et in _sql(
        smoke_dir, "events", "user_id, ts, event_id, event_type"
    ):
        per_user[u].append((ts, eid, et[0]))
    expect = []
    for u in sorted(per_user):
        evs = sorted(per_user[u])
        seq = "".join(ch for _, _, ch in evs)
        m = len(re.findall("vc*p", seq))
        expect.append(
            {
                "user_id": u,
                "n_events": len(evs),
                "n_funnels": m,
                "converted": 1 if m else 0,
            }
        )
    assert _rows(spark, smoke_dir, "q179_event_pattern_match") == expect


def test_rake_keywords_match_python(spark, smoke_dir):
    """q201: RAKE re-implemented with Python re (same two regex passes,
    word degree/freq scores, top-20 by score then phrase)."""
    stop = "the|a|an|of|and|or|to|in|is|on|for|with|as|by|at|it"
    occurrences = []
    for (text,) in _sql(smoke_dir, "documents", "text"):
        s = re.sub("[^a-z]+", " ", text.lower())
        s = re.sub(rf"\b({stop})\b", "|", s)
        for piece in re.split(r"\|", s):
            phrase = re.sub(" +", " ", piece).strip(" ")
            if phrase:
                ws = phrase.split(" ")
                if 1 <= len(ws) <= 4:
                    occurrences.append((phrase, ws))
    freq: Counter = Counter()
    degree: Counter = Counter()
    for _, ws in occurrences:
        for w in ws:
            freq[w] += 1
            degree[w] += len(ws)
    n_occ: Counter = Counter(p for p, _ in occurrences)
    words_of = {p: ws for p, ws in occurrences}
    scored = [
        {
            "phrase": p,
            "n_occurrences": n_occ[p],
            "score": _round(
                math.fsum(degree[w] / freq[w] for w in words_of[p])
            ),
        }
        for p in n_occ
    ]
    scored.sort(key=lambda r: (-r["score"], r["phrase"]))
    assert _rows(spark, smoke_dir, "q201_rake_keywords") == scored[:20]


def test_audience_jaccard_matches_python(spark, smoke_dir):
    """q231: exact pairwise audience Jaccard from distinct (user, type)."""
    aud: dict[str, set] = defaultdict(set)
    for u, t in _sql(smoke_dir, "events", "user_id, event_type"):
        aud[t].add(u)
    types = sorted(aud)
    expect = []
    for ta, tb in combinations(types, 2):
        nab = len(aud[ta] & aud[tb])
        if nab:
            expect.append(
                {
                    "ta": ta,
                    "tb": tb,
                    "n_a": len(aud[ta]),
                    "n_b": len(aud[tb]),
                    "nab": nab,
                    "jaccard": _round(
                        float(nab) / (len(aud[ta]) + len(aud[tb]) - nab)
                    ),
                }
            )
    assert _rows(spark, smoke_dir, "q231_audience_jaccard") == expect


# --- similarity -------------------------------------------------------------


def test_ivf_topk_matches_python(spark, smoke_dir):
    """q45: IVF two-stage probe re-derived — per-label mean centroids,
    top-2 cells by rounded centroid cosine, exact top-3 within."""
    rows = duckdb.sql(
        f"select vec_id, label, embedding::DOUBLE[] as v "
        f"from read_parquet('{smoke_dir}/embeddings.parquet')"
    ).fetchall()
    corpus = [(i, lab, list(v)) for i, lab, v in rows]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    cents = {}
    for lab in {lab for _, lab, _ in corpus}:
        vecs = [v for _, la, v in corpus if la == lab]
        cents[lab] = [
            math.fsum(v[d] for v in vecs) / len(vecs)
            for d in range(len(vecs[0]))
        ]
    expect = []
    for qid, _, qv in sorted(r for r in corpus if r[0] < 5):
        qn = math.sqrt(dot(qv, qv))
        ranked_cells = sorted(
            cents,
            key=lambda lab: (
                -_dec(
                    dot(qv, cents[lab])
                    / (qn * math.sqrt(dot(cents[lab], cents[lab])))
                ),
                lab,
            ),
        )[:2]
        cand = [
            (
                -_dec(dot(qv, cv) / (qn * math.sqrt(dot(cv, cv)))),
                cid,
            )
            for cid, lab, cv in corpus
            if lab in ranked_cells and cid != qid
        ]
        for rank, (negcos, cid) in enumerate(sorted(cand)[:3], 1):
            expect.append(
                {
                    "q_id": qid,
                    "c_id": cid,
                    "cos": float(-negcos),
                    "rank": rank,
                }
            )
    assert _rows(spark, smoke_dir, "q45_ivf_topk") == expect
