"""Third-engine rederivations for the relational/analytic surface —
projections, filters, outer joins, theta joins, as-of, ntile, heavy
hitters, data-quality audits, GDPR deletes, CDC/time-travel arithmetic,
HLL exact sides, attribution credits, rank movers, and the three UDF
lanes — each re-derived from raw parquet with plain Python (dicts,
sorts, Decimal) and compared to the full query output.

Run at sf0.01 too when touched:

    SF_SMOKE_DIR=/root/testdata/sf0.01 python -m pytest \
        tests/test_third_engine_relational.py -q
"""

from __future__ import annotations

import datetime
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from hadoop_trans_spark.queries import QUERIES

EPOCH = datetime.datetime(1970, 1, 1)


def _sql(q: str):
    return duckdb.sql(q).fetchall()


def _rows(spark, smoke_dir, name):
    return [r.asDict() for r in QUERIES[name](spark, smoke_dir).collect()]


def _dec(x: float, places: int = 6) -> Decimal:
    return Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-places), ROUND_HALF_UP
    )


def _dsum(values) -> float:
    return float(sum(_dec(v) for v in values))


def _us(dt: datetime.datetime) -> int:
    return (dt - EPOCH) // datetime.timedelta(microseconds=1)


def test_projection_cast_matches_python(spark, smoke_dir):
    """q02: rename/upper/cast/round/lit projection."""
    rows = _sql(
        f"select p_partkey, p_brand, p_size, p_retailprice from "
        f"read_parquet('{smoke_dir}/part.parquet') order by p_partkey"
    )
    expect = [
        {
            "part_id": k,
            "brand": b.upper(),
            "size_l": s,
            "price2": float(_dec(p, 2)),
            "src": "catalog",
        }
        for k, b, s, p in rows
    ]
    assert _rows(spark, smoke_dir, "q02_projection_cast") == expect


def test_filter_predicates_match_python(spark, smoke_dir):
    """q03: IN / BETWEEN / LIKE / IS NOT NULL / NOT(%) battery."""
    rows = _sql(
        f"select o_orderkey, o_orderstatus, o_orderpriority, o_totalprice, "
        f"o_custkey from read_parquet('{smoke_dir}/orders.parquet') "
        f"order by o_orderkey"
    )
    expect = [
        {
            "o_orderkey": k,
            "o_orderstatus": st,
            "o_orderpriority": pr,
            "total": float(p),
        }
        for k, st, pr, p, c in rows
        if st in ("O", "F")
        and 1000 <= p <= 200000
        and pr.startswith("1-")
        and c is not None
        and k % 7 != 0
    ]
    assert _rows(spark, smoke_dir, "q03_filter_predicates") == expect


def test_full_outer_reconcile_matches_python(spark, smoke_dir):
    """q07: full-outer with COALESCE defaults on both sides."""
    li = Counter(
        k
        for (k,) in _sql(
            f"select l_suppkey from read_parquet('{smoke_dir}/lineitem.parquet')"
        )
    )
    sup = {
        k: n
        for k, n in _sql(
            f"select s_suppkey, s_name from "
            f"read_parquet('{smoke_dir}/supplier.parquet')"
        )
        if k % 3 != 0
    }
    expect = [
        {
            "suppkey": k,
            "n_li": li.get(k, 0),
            "name": sup.get(k, "<missing>"),
        }
        for k in sorted(li.keys() | sup.keys())
    ]
    assert _rows(spark, smoke_dir, "q07_full_outer_reconcile") == expect


def test_theta_size_bucket_matches_python(spark, smoke_dir):
    """q09: BETWEEN-range theta join against a literal bucket table."""
    rows = _sql(
        f"select p_size, p_retailprice from "
        f"read_parquet('{smoke_dir}/part.parquet')"
    )
    buckets = {"tiny": (0, 10), "small": (11, 25), "large": (26, 50)}
    groups: dict[str, list] = {}
    for size, price in rows:
        for name, (lo, hi) in buckets.items():
            if lo <= size <= hi:
                groups.setdefault(name, []).append(price)
    expect = [
        {"bucket": b, "n_parts": len(ps), "price_sum": _dsum(ps)}
        for b, ps in sorted(groups.items())
    ]
    assert _rows(spark, smoke_dir, "q09_theta_size_bucket") == expect


def test_asof_join_matches_python(spark, smoke_dir):
    """q10: each click left-matched to the user's latest view at-or-
    before. Tie-free by fixture construction (asserted): per user no two
    views share a timestamp."""
    rows = _sql(
        f"select event_id, user_id, ts, event_type from "
        f"read_parquet('{smoke_dir}/events.parquet') "
        f"where event_type in ('click','view')"
    )
    views: dict[int, list] = {}
    for eid, u, ts, et in rows:
        if et == "view":
            views.setdefault(int(u), []).append((_us(ts), int(eid)))
    for u, vs in views.items():
        assert len({t for t, _ in vs}) == len(vs), "view ts tie — model invalid"
        vs.sort()
    expect = []
    for eid, u, ts, et in rows:
        if et != "click":
            continue
        ct = _us(ts)
        best = None
        for vt, vid in views.get(int(u), ()):
            if vt <= ct:
                best = (vt, vid)
            else:
                break
        expect.append(
            {
                "click_id": int(eid),
                "user_id": int(u),
                "click_us": ct,
                "view_id": best[1] if best else None,
                "view_us": best[0] if best else None,
            }
        )
    expect.sort(key=lambda r: r["click_id"])
    assert _rows(spark, smoke_dir, "q10_asof_click_to_view") == expect


def test_verify_fingerprint_matches_python(spark, smoke_dir):
    """q19: the migrate-verify fingerprint block over lineitem."""
    rows = _sql(
        f"select l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
        f"l_returnflag, l_linestatus, l_shipdate from "
        f"read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    ship_us = [_us(r[6]) for r in rows]
    expect = [
        {
            "n_rows": len(rows),
            "n_keys": len({r[0] * 8 + r[1] for r in rows}),
            "qty_sum": _dsum(r[2] for r in rows),
            "price_sum": _dsum(r[3] for r in rows),
            "str_bytes": sum(len(r[4]) + len(r[5]) for r in rows),
            "min_ship_us": min(ship_us),
            "max_ship_us": max(ship_us),
        }
    ]
    assert _rows(spark, smoke_dir, "q19_verify_fingerprint") == expect


def test_partition_enumeration_matches_python(spark, smoke_dir):
    """q25: yyyyMM keys covered by a date range, from a plain date walk."""
    d = datetime.date(1996, 11, 15)
    end = datetime.date(1997, 3, 2)
    keys = set()
    while d <= end:
        keys.add(f"{d.year}{d.month:02d}")
        d += datetime.timedelta(days=1)
    expect = [{"partition_key": k} for k in sorted(keys)]
    assert _rows(spark, smoke_dir, "q25_partition_enumeration") == expect


def test_date_funcs_match_python(spark, smoke_dir):
    """q26: the date-function battery via datetime arithmetic."""
    rows = _sql(
        f"select o_orderkey, o_orderdate from "
        f"read_parquet('{smoke_dir}/orders.parquet') "
        f"where o_orderkey < 500 order by o_orderkey"
    )
    base = datetime.date(1995, 1, 1)
    expect = []
    for k, ts in rows:
        d = ts.date()
        expect.append(
            {
                "okey": k,
                "d_str": d.isoformat(),
                "part_key": f"{d.year}{d.month:02d}",
                "y": d.year,
                "m": d.month,
                "dom": d.day,
                "dow": (d.weekday() + 1) % 7 + 1,
                "plus30": (d + datetime.timedelta(days=30)).isoformat(),
                "days_since": (d - base).days,
                "month_start": d.replace(day=1).isoformat(),
                "unix_sec": int((ts - EPOCH).total_seconds()),
            }
        )
    assert _rows(spark, smoke_dir, "q26_date_funcs") == expect


def test_array_words_match_python(spark, smoke_dir):
    """q30: split/distinct/sort/slice/contains array battery."""
    rows = _sql(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet') "
        f"where doc_id < 100 order by doc_id"
    )
    expect = []
    for d, t in rows:
        ws = t.split(" ")
        distinct = list(dict.fromkeys(ws))
        expect.append(
            {
                "doc_id": int(d),
                "vocab": ",".join(sorted(distinct)),
                "n_vocab": len(distinct),
                "head5": " ".join(ws[:5]),
                "has_spark": "spark" in ws,
            }
        )
    assert _rows(spark, smoke_dir, "q30_array_words") == expect


def test_salted_join_matches_python(spark, smoke_dir):
    """q61: the salted-join result equals the plain dict join."""
    cust = dict(
        _sql(
            f"select c_custkey, c_nationkey from "
            f"read_parquet('{smoke_dir}/customer.parquet')"
        )
    )
    nation = dict(
        _sql(
            f"select n_nationkey, n_name from "
            f"read_parquet('{smoke_dir}/nation.parquet')"
        )
    )
    groups: dict[str, list] = {}
    for ck, price in _sql(
        f"select o_custkey, o_totalprice from "
        f"read_parquet('{smoke_dir}/orders.parquet')"
    ):
        nk = cust.get(ck)
        if nk is None:
            continue
        groups.setdefault(nation[nk], []).append(price)
    expect = [
        {"n_name": n, "n_orders": len(ps), "total": _dsum(ps)}
        for n, ps in sorted(groups.items())
    ]
    assert _rows(spark, smoke_dir, "q61_salted_join") == expect


def test_observe_metrics_match_python(spark, smoke_dir):
    """q93: the observed-metrics fingerprint over the filtered scan."""
    rows = _sql(
        f"select l_quantity, l_discount from "
        f"read_parquet('{smoke_dir}/lineitem.parquet') "
        f"where l_shipdate <= timestamp '1998-09-02'"
    )
    expect = [
        {
            "n_rows": len(rows),
            "qty_sum": _dsum(q for q, _ in rows),
            "n_discounted": sum(d > 0.05 for _, d in rows),
        }
    ]
    assert _rows(spark, smoke_dir, "q93_observe_metrics") == expect


def test_column_profile_matches_python(spark, smoke_dir):
    """q102: per-column null/distinct/extent profile."""
    rows = _sql(
        f"select l_orderkey, l_linenumber, l_returnflag, l_shipdate from "
        f"read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    n = len(rows)

    def profile(name, vals, fmt):
        nonnull = [v for v in vals if v is not None]
        return {
            "col_name": name,
            "n_rows": n,
            "n_nonnull": len(nonnull),
            "n_distinct": len(set(nonnull)),
            "min_str": fmt(min(nonnull)),
            "max_str": fmt(max(nonnull)),
        }

    expect = sorted(
        [
            profile("l_orderkey", [r[0] for r in rows], str),
            profile("l_linenumber", [r[1] for r in rows], str),
            profile("l_returnflag", [r[2] for r in rows], str),
            profile(
                "l_shipdate",
                [r[3] for r in rows],
                lambda d: d.strftime("%Y-%m-%d %H:%M:%S"),
            ),
        ],
        key=lambda r: r["col_name"],
    )
    assert _rows(spark, smoke_dir, "q102_column_profile") == expect


def test_ntile_deciles_match_python(spark, smoke_dir):
    """q109: NTILE(10) re-derived from the ceil-split definition —
    the first (n mod 10) buckets get one extra row."""
    rows = _sql(
        f"select o_orderstatus, o_totalprice, o_orderkey from "
        f"read_parquet('{smoke_dir}/orders.parquet')"
    )
    by_status: dict[str, list] = {}
    for st, p, k in rows:
        by_status.setdefault(st, []).append((p, k))
    groups: dict[tuple, list] = {}
    for st, members in by_status.items():
        members.sort()
        n = len(members)
        q, r = divmod(n, 10)
        idx = 0
        for bucket in range(1, 11):
            size = q + (1 if bucket <= r else 0)
            for p, _k in members[idx : idx + size]:
                groups.setdefault((st, bucket), []).append(p)
            idx += size
    expect = [
        {
            "o_orderstatus": st,
            "decile": b,
            "n": len(ps),
            "lo": float(_dec(min(ps))),
            "hi": float(_dec(max(ps))),
            "price_sum": _dsum(ps),
        }
        for (st, b), ps in sorted(groups.items())
    ]
    assert _rows(spark, smoke_dir, "q109_ntile_deciles") == expect


def test_heavy_hitters_match_python(spark, smoke_dir):
    """q129: exact top-10 part frequencies; the sketch guarantee flag
    must be 1 on every row."""
    counts = Counter(
        k
        for (k,) in _sql(
            f"select l_partkey from read_parquet('{smoke_dir}/lineitem.parquet')"
        )
    )
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = [
        {"rnk": i, "l_partkey": k, "n": n, "sketch_ok": 1}
        for i, (k, n) in enumerate(ranked, 1)
    ]
    assert _rows(spark, smoke_dir, "q129_heavy_hitters") == expect


def test_contrastive_pairs_match_python(spark, smoke_dir):
    """q135: adjacent 200-char chunks (runts < 64 dropped) as
    anchor/positive hash pairs."""
    import hashlib

    rows = _sql(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet') "
        f"order by doc_id"
    )
    expect = []
    for d, t in rows:
        chunks = {}
        for off in range(0, len(t), 200):
            c = t[off : off + 200]
            if len(c) >= 64:
                chunks[off // 200] = c
        for idx in sorted(chunks):
            if idx + 1 in chunks:
                a, b = chunks[idx], chunks[idx + 1]
                expect.append(
                    {
                        "doc_id": int(d),
                        "pair_idx": idx,
                        "anchor_hash": hashlib.md5(a.encode()).hexdigest(),
                        "positive_hash": hashlib.md5(b.encode()).hexdigest(),
                        "anchor_len": len(a),
                        "positive_len": len(b),
                    }
                )
    assert _rows(spark, smoke_dir, "q135_contrastive_pairs") == expect


def test_map_in_arrow_matches_python(spark, smoke_dir):
    """q139: the Arrow-batch charge computation is plain double math."""
    rows = _sql(
        f"select l_orderkey, l_linenumber, l_extendedprice, l_discount from "
        f"read_parquet('{smoke_dir}/lineitem.parquet') "
        f"where l_orderkey % 25 = 0 order by l_orderkey, l_linenumber"
    )
    expect = [
        {"l_orderkey": k, "l_linenumber": ln, "charge": p * (1 - d)}
        for k, ln, p, d in rows
    ]
    assert _rows(spark, smoke_dir, "q139_map_in_arrow") == expect


def test_pandas_udf_tokens_match_python(spark, smoke_dir):
    """q49: the pandas-UDF token counts equal re.findall counts."""
    token = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", re.ASCII)
    rows = _sql(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet') "
        f"order by doc_id"
    )
    expect = [
        {"doc_id": int(d), "n_tokens_udf": len(token.findall(t))}
        for d, t in rows
    ]
    assert _rows(spark, smoke_dir, "q49_pandas_udf_tokens") == expect


def test_grouped_median_matches_python(spark, smoke_dir):
    """q50: per-priority median (mean of middle two for even counts)."""
    groups: dict[str, list] = {}
    for pr, p in _sql(
        f"select o_orderpriority, o_totalprice from "
        f"read_parquet('{smoke_dir}/orders.parquet')"
    ):
        groups.setdefault(pr, []).append(p)
    expect = []
    for pr, ps in sorted(groups.items()):
        ps.sort()
        n = len(ps)
        med = ps[n // 2] if n % 2 else (ps[n // 2 - 1] + ps[n // 2]) / 2.0
        expect.append(
            {"prio": pr, "median_price": float(_dec(med)), "n": n}
        )
    assert _rows(spark, smoke_dir, "q50_grouped_agg_median") == expect


def test_dq_audit_matches_python(spark, smoke_dir):
    """q145: the five data-quality rules re-counted directly."""
    li = _sql(
        f"select l_quantity, l_discount, l_shipdate, l_orderkey from "
        f"read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    orders = _sql(
        f"select o_orderkey, o_totalprice from "
        f"read_parquet('{smoke_dir}/orders.parquet')"
    )
    okeys = {k for k, _ in orders}
    lo = datetime.datetime(1992, 1, 1)
    hi = datetime.datetime(1999, 1, 1)
    rules = {
        "discount_in_range": (
            len(li),
            sum(d < 0 or d > 0.1 for _, d, _, _ in li),
        ),
        "lineitem_fk_orders": (
            len(li),
            sum(k not in okeys for _, _, _, k in li),
        ),
        "price_positive": (len(orders), sum(p <= 0 for _, p in orders)),
        "quantity_in_range": (
            len(li),
            sum(q < 1 or q > 50 for q, _, _, _ in li),
        ),
        "shipdate_in_window": (
            len(li),
            sum(s is None or s < lo or s >= hi for _, _, s, _ in li),
        ),
    }
    expect = [
        {
            "rule": r,
            "n_checked": nc,
            "n_violations": nv,
            "passed": int(nv == 0),
        }
        for r, (nc, nv) in sorted(rules.items())
    ]
    assert _rows(spark, smoke_dir, "q145_dq_audit") == expect


def test_null_semantics_match_python(spark, smoke_dir):
    """q166: NULLIF grouping, ignore-null counts, null-safe join keys."""
    orders = Counter(
        None if st == "O" else st
        for (st,) in _sql(
            f"select o_orderstatus from read_parquet('{smoke_dir}/orders.parquet')"
        )
    )
    items = Counter(
        None if st == "O" else st
        for (st,) in _sql(
            f"select l_linestatus from read_parquet('{smoke_dir}/lineitem.parquet')"
        )
    )
    expect = sorted(
        (
            {
                "k": "<null>" if k is None else k,
                "n_rows": n,
                "n_nonnull_keys": 0 if k is None else n,
                "n_items": items.get(k, 0),
            }
            for k, n in orders.items()
        ),
        key=lambda r: r["k"],
    )
    assert _rows(spark, smoke_dir, "q166_null_semantics") == expect


def test_forget_users_matches_python(spark, smoke_dir):
    """q184: GDPR forget — kept/deleted/leak accounting."""
    rows = _sql(
        f"select user_id, event_id from read_parquet('{smoke_dir}/events.parquet')"
    )
    kept = [e for u, e in rows if u % 31 != 0]
    gone = [(u, e) for u, e in rows if u % 31 == 0]
    expect = [
        {
            "n_rows_kept": len(kept),
            "n_rows_deleted": len(gone),
            "n_users_forgotten": len({u for u, _ in gone}),
            "n_leaked": 0,
            "min_event_id": min(kept),
            "max_event_id": max(kept),
        }
    ]
    assert _rows(spark, smoke_dir, "q184_forget_users") == expect


def test_snapshot_time_travel_matches_python(spark, smoke_dir):
    """q190: two snapshot versions' fingerprints from the mutation rule."""
    rows = _sql(
        f"select o_orderkey, o_totalprice from "
        f"read_parquet('{smoke_dir}/orders.parquet')"
    )
    v1 = [p for k, p in rows if k % 5 != 0]
    v2 = [p + 100.0 if k % 3 == 0 else p for k, p in rows]
    expect = [
        {"snapshot": "v1", "n_rows": len(v1), "price_sum": _dsum(v1)},
        {"snapshot": "v2", "n_rows": len(v2), "price_sum": _dsum(v2)},
    ]
    assert _rows(spark, smoke_dir, "q190_snapshot_time_travel") == expect


def test_cdc_apply_matches_python(spark, smoke_dir):
    """q191: update/delete/insert change stream applied arithmetically."""
    rows = _sql(
        f"select o_orderkey, o_totalprice from "
        f"read_parquet('{smoke_dir}/orders.parquet')"
    )
    final = [
        (k, p * 1.1 if k % 7 == 0 else p) for k, p in rows if k % 11 != 0
    ] + [(k + 50_000_000, 42.0) for k, _p in rows if k % 97 == 0]
    expect = [
        {
            "n_rows": len(final),
            "price_sum": _dsum(p for _, p in final),
            "min_key": min(k for k, _ in final),
            "max_key": max(k for k, _ in final),
        }
    ]
    assert _rows(spark, smoke_dir, "q191_cdc_apply") == expect


def test_hll_rollup_exact_side_matches_python(spark, smoke_dir):
    """q144: exact weekly distinct users (Monday weeks); sketch flags 1."""
    rows = _sql(
        f"select user_id, ts from read_parquet('{smoke_dir}/events.parquet')"
    )
    weeks: dict[str, set] = {}
    for u, ts in rows:
        d = ts.date()
        wk = d - datetime.timedelta(days=d.weekday())
        weeks.setdefault(wk.isoformat(), set()).add(int(u))
    expect = [
        {"week_start": w, "exact_users": len(us), "within_tol": 1}
        for w, us in sorted(weeks.items())
    ]
    assert _rows(spark, smoke_dir, "q144_hll_sketch_rollup") == expect


def test_rolling_hll_exact_side_matches_python(spark, smoke_dir):
    """q187: exact trailing-7-day distinct users per active day."""
    rows = _sql(
        f"select user_id, ts from read_parquet('{smoke_dir}/events.parquet')"
    )
    by_day: dict[datetime.date, set] = {}
    for u, ts in rows:
        by_day.setdefault(ts.date(), set()).add(int(u))
    expect = []
    for day in sorted(by_day):
        users = set()
        for back in range(7):
            users |= by_day.get(day - datetime.timedelta(days=back), set())
        expect.append(
            {
                "day": day.isoformat(),
                "exact_users_7d": len(users),
                "within_tol": 1,
            }
        )
    assert _rows(spark, smoke_dir, "q187_rolling_hll_distinct") == expect


def test_first_last_touch_matches_python(spark, smoke_dir):
    """q218: full purchase value credited to the first and last click in
    the trailing 24 h, summed per click-day in exact Decimal."""
    rows = _sql(
        f"select event_id, user_id, ts, event_type, value from "
        f"read_parquet('{smoke_dir}/events.parquet') "
        f"where event_type in ('click','purchase')"
    )
    clicks: dict[int, list] = {}
    for eid, u, ts, et, _v in rows:
        if et == "click":
            clicks.setdefault(int(u), []).append((ts, int(eid)))
    first_c: dict[str, Decimal] = {}
    last_c: dict[str, Decimal] = {}
    for eid, u, ts, et, v in rows:
        if et != "purchase":
            continue
        window = [
            (ct, cid)
            for ct, cid in clicks.get(int(u), ())
            if ct < ts and ct >= ts - datetime.timedelta(hours=24)
        ]
        if not window:
            continue
        val = _dec(v)
        fday = min(window)[0].date().isoformat()
        lday = max(window)[0].date().isoformat()
        first_c[fday] = first_c.get(fday, Decimal(0)) + val
        last_c[lday] = last_c.get(lday, Decimal(0)) + val
    expect = [
        {
            "day": d,
            "first_touch_credit": float(first_c.get(d, Decimal(0))),
            "last_touch_credit": float(last_c.get(d, Decimal(0))),
        }
        for d in sorted(first_c.keys() | last_c.keys())
    ]
    assert _rows(spark, smoke_dir, "q218_first_last_touch") == expect


def test_rank_movers_match_python(spark, smoke_dir):
    """q234: brand revenue ranks before/after 1996, top-10 swings."""
    parts = dict(
        _sql(
            f"select p_partkey, p_brand from read_parquet('{smoke_dir}/part.parquet')"
        )
    )
    rev: dict[tuple, Decimal] = {}
    for pk, ship, price in _sql(
        f"select l_partkey, l_shipdate, l_extendedprice from "
        f"read_parquet('{smoke_dir}/lineitem.parquet')"
    ):
        brand = parts.get(pk)
        if brand is None:
            continue
        cur = int(ship >= datetime.datetime(1996, 1, 1))
        rev[(brand, cur)] = rev.get((brand, cur), Decimal(0)) + _dec(price)
    ranks: dict[int, dict[str, int]] = {0: {}, 1: {}}
    for cur in (0, 1):
        per = [(float(v), b) for (b, c), v in rev.items() if c == cur]
        per.sort(key=lambda r: (-r[0], r[1]))
        ranks[cur] = {b: i for i, (_v, b) in enumerate(per, 1)}
    movers = [
        (b, ranks[0][b], ranks[1][b]) for b in ranks[0] if b in ranks[1]
    ]
    top = sorted(movers, key=lambda r: (-abs(r[1] - r[2]), r[0]))[:10]
    expect = [
        {
            "brand": b,
            "rank_before": rb,
            "rank_after": ra,
            "delta": rb - ra,
        }
        for b, rb, ra in top
    ]
    assert _rows(spark, smoke_dir, "q234_rank_movers") == expect
