"""Third-engine rederivations for the events/time-series remainder —
sessionization, sweep-line concurrency, attribution, interpolation,
TWAP, Holt, cross-correlation, Kaplan-Meier, Markov stationary, and the
rank-sum AUC — each re-derived from the raw parquet with plain Python
(sorted lists, dicts, Decimal, math) and compared to the full query
output. No repo SQL, no repo operators.

Run at sf0.01 too when touched:

    SF_SMOKE_DIR=/root/testdata/sf0.01 python -m pytest \
        tests/test_third_engine_timeseries_remainder.py -q
"""

from __future__ import annotations

import datetime
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

import duckdb

from hadoop_trans_spark.queries import QUERIES

EPOCH = datetime.datetime(1970, 1, 1)
US_DAY = 86_400_000_000
GAP_US = 30 * 60 * 1_000_000


def _sql(smoke_dir: str, table: str, cols: str):
    return duckdb.sql(
        f"select {cols} from read_parquet('{smoke_dir}/{table}.parquet')"
    ).fetchall()


def _rows(spark, smoke_dir, name):
    return [r.asDict() for r in QUERIES[name](spark, smoke_dir).collect()]


def _dec(x: float, places: int = 6) -> Decimal:
    return Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-places), ROUND_HALF_UP
    )


def _round(x: float, places: int = 6) -> float:
    return float(_dec(x, places))


def _us(dt: datetime.datetime) -> int:
    return (dt - EPOCH) // datetime.timedelta(microseconds=1)


def _sessions(smoke_dir: str):
    """30-min-gap sessions per user in strict (ts, event_id) order —
    q81's definition, reused by the q127 sweep-line."""
    per_user: dict[int, list] = defaultdict(list)
    for u, ts, eid, v in _sql(
        smoke_dir, "events", "user_id, ts, event_id, value"
    ):
        per_user[u].append((_us(ts), eid, v))
    out = []
    for u in sorted(per_user):
        evs = sorted(per_user[u])
        sid, prev = 0, None
        cur: list = []
        for t, eid, v in evs:
            if prev is None or t - prev >= GAP_US:
                if cur:
                    out.append((u, sid, cur))
                sid += 1
                cur = []
            cur.append((t, v))
            prev = t
        out.append((u, sid, cur))
    return out


def test_sessionize_batch_matches_python(spark, smoke_dir):
    """q81: gap-based islands rollup."""
    expect = [
        {
            "user_id": u,
            "session_no": sid,
            "session_start": evs[0][0],
            "n_events": len(evs),
            "value_sum": float(sum((_dec(v) for _, v in evs), Decimal(0))),
        }
        for u, sid, evs in _sessions(smoke_dir)
    ]
    assert _rows(spark, smoke_dir, "q81_sessionize_batch") == expect


def test_session_concurrency_matches_sweep_line(spark, smoke_dir):
    """q127: textbook global sweep-line over session intervals (end
    exclusive, +1 µs past the last event; ends sort before starts)."""
    deltas = []
    for _, _, evs in _sessions(smoke_dir):
        deltas.append((evs[0][0], 1))
        deltas.append((evs[-1][0] + 1, -1))
    deltas.sort()
    run = 0
    day_max: dict[str, int] = {}
    for t, d in deltas:
        run += d
        day = (EPOCH + datetime.timedelta(microseconds=t)).strftime("%Y-%m-%d")
        day_max[day] = max(day_max.get(day, run), run)
    expect = [
        {"day": d, "max_concurrent": m} for d, m in sorted(day_max.items())
    ]
    assert _rows(spark, smoke_dir, "q127_session_concurrency") == expect


def test_linear_attribution_matches_python(spark, smoke_dir):
    """q167: equal split of purchase value across the 24h click
    touches, decimal credit rollup per click day."""
    ev = _sql(smoke_dir, "events", "user_id, ts, event_type, value")
    clicks: dict[int, list] = defaultdict(list)
    for u, ts, et, _ in ev:
        if et == "click":
            clicks[u].append(ts)
    day_touch: Counter = Counter()
    day_credit: dict[str, Decimal] = defaultdict(Decimal)
    for u, pts, et, val in ev:
        if et != "purchase":
            continue
        touches = [
            c
            for c in clicks.get(u, [])
            if c < pts and c >= pts - datetime.timedelta(hours=24)
        ]
        if not touches:
            continue
        credit = _dec(val / len(touches), 9)
        for c in touches:
            day = c.strftime("%Y-%m-%d")
            day_touch[day] += 1
            day_credit[day] += credit
    expect = [
        {
            "day": d,
            "n_touches": day_touch[d],
            "credit": float(
                day_credit[d].quantize(Decimal("0.000001"), ROUND_HALF_UP)
            ),
        }
        for d in sorted(day_touch)
    ]
    assert _rows(spark, smoke_dir, "q167_linear_attribution") == expect


def test_linear_interpolation_matches_python(spark, smoke_dir):
    """q176: per-user hourly grid with straight-line gap fill."""
    hourly: dict[tuple, Decimal] = defaultdict(Decimal)
    for u, ts, v in _sql(smoke_dir, "events", "user_id, ts, value"):
        if u % 97 != 0:
            continue
        h = _us(ts.replace(minute=0, second=0, microsecond=0))
        hourly[(u, h)] += _dec(v)
    per_user: dict[int, dict] = defaultdict(dict)
    for (u, h), s in hourly.items():
        per_user[u][h] = float(s)
    expect = []
    for u in sorted(per_user):
        obs = per_user[u]
        hs = sorted(obs)
        for h in range(hs[0], hs[-1] + 1, 3_600_000_000):
            if h in obs:
                expect.append(
                    {"user_id": u, "hour_us": h, "v_interp": obs[h], "is_gap": 0}
                )
            else:
                prev = max(x for x in hs if x < h)
                nxt = min(x for x in hs if x > h)
                frac = float(h - prev) / float(nxt - prev)
                interp = _round(obs[prev] + (obs[nxt] - obs[prev]) * frac)
                expect.append(
                    {"user_id": u, "hour_us": h, "v_interp": interp, "is_gap": 1}
                )
    assert _rows(spark, smoke_dir, "q176_linear_interpolation") == expect


def test_twap_matches_python(spark, smoke_dir):
    """q210: interval-weighted average, decimal numerator, exact µs
    weights; zero-length intervals and the final reading dropped."""
    per_user: dict[int, list] = defaultdict(list)
    for u, ts, eid, v in _sql(
        smoke_dir, "events", "user_id, ts, event_id, value"
    ):
        per_user[u].append((_us(ts), eid, v))
    expect = []
    for u in sorted(per_user):
        evs = sorted(per_user[u])
        num, span, n = Decimal(0), 0, 0
        for (t0, _, v), (t1, _, _) in zip(evs, evs[1:]):
            dt = t1 - t0
            if dt > 0:
                num += _dec(v) * dt
                span += dt
                n += 1
        if n:
            expect.append(
                {
                    "user_id": u,
                    "n_intervals": n,
                    "span_us": span,
                    "twap": _round(float(num) / span),
                }
            )
    assert _rows(spark, smoke_dir, "q210_twap_per_user") == expect


def test_holt_forecast_matches_python(spark, smoke_dir):
    """q203: Holt recursion replayed as the identical double fold
    (alpha=0.5, beta=0.3, l=y1, b=y2-y1) over decimal daily sums."""
    daily: dict[datetime.date, Decimal] = defaultdict(Decimal)
    for d, e in _sql(smoke_dir, "lineitem", "l_shipdate, l_extendedprice"):
        daily[d] += _dec(e)
    ys = [float(daily[d]) for d in sorted(daily)]
    level, trend = ys[0], ys[1] - ys[0]
    for y in ys[2:]:
        new_level = 0.5 * y + 0.5 * (level + trend)
        trend = 0.3 * (new_level - level) + 0.7 * trend
        level = new_level
    expect = [
        {"h": h, "forecast": _round(level + h * trend)} for h in range(1, 8)
    ]
    assert _rows(spark, smoke_dir, "q203_holt_forecast") == expect


def test_cross_correlation_matches_python(spark, smoke_dir):
    """q224: lagged Pearson between daily click and purchase counts —
    integer moment sums are exact, formula replayed in operand order."""
    clicks: Counter = Counter()
    buys: Counter = Counter()
    for ts, et in _sql(smoke_dir, "events", "ts, event_type"):
        day = ts.date()
        if et == "click":
            clicks[day] += 1
        elif et == "purchase":
            buys[day] += 1
    days = sorted(set(clicks) | set(buys))
    expect = []
    for lag in range(-3, 4):
        pairs = [
            (clicks[a], buys[a + datetime.timedelta(days=lag)])
            for a in days
            if a + datetime.timedelta(days=lag) in set(days)
        ]
        n = float(len(pairs))
        sx = float(sum(x for x, _ in pairs))
        sy = float(sum(y for _, y in pairs))
        sxy = float(sum(x * y for x, y in pairs))
        sxx = float(sum(x * x for x, _ in pairs))
        syy = float(sum(y * y for _, y in pairs))
        xcorr = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        expect.append(
            {"lag": lag, "n_pairs": len(pairs), "xcorr": _round(xcorr)}
        )
    assert _rows(spark, smoke_dir, "q224_cross_correlation") == expect


def test_kaplan_meier_matches_python(spark, smoke_dir):
    """q225: survival curve from the duration histogram — reverse-cumsum
    at-risk, exp of the ordered ln cumsum, absorbed at zero."""
    ev = _sql(smoke_dir, "events", "user_id, ts, event_type")
    signup: dict[int, datetime.datetime] = {}
    for u, ts, et in ev:
        if et == "signup" and (u not in signup or ts < signup[u]):
            signup[u] = ts
    first_buy: dict[int, datetime.datetime] = {}
    for u, ts, et in ev:
        if (
            et == "purchase"
            and u in signup
            and ts > signup[u]
            and (u not in first_buy or ts < first_buy[u])
        ):
            first_buy[u] = ts
    horizon = max(_us(ts) for _, ts, _ in ev)
    hist: dict[int, list] = defaultdict(lambda: [0, 0])
    for u, s_ts in signup.items():
        if u in first_buy:
            day = math.floor((_us(first_buy[u]) - _us(s_ts)) / 86400000000.0)
            hist[day][0] += 1
        else:
            day = math.floor((horizon - _us(s_ts)) / 86400000000.0)
            hist[day][1] += 1
    days = sorted(hist)
    total = sum(d + c for d, c in hist.values())
    expect, ln_sum, absorbed, seen = [], 0.0, False, 0
    for day in days:
        d, c = hist[day]
        n_risk = total - seen
        seen += d + c
        if d >= n_risk:
            absorbed = True
        else:
            ln_sum += math.log(1.0 - float(d) / n_risk)
        expect.append(
            {
                "day": day,
                "n_risk": n_risk,
                "d": d,
                "c": c,
                "survival": 0.0 if absorbed else _round(math.exp(ln_sum)),
            }
        )
    assert _rows(spark, smoke_dir, "q225_kaplan_meier") == expect


def test_markov_stationary_matches_python(spark, smoke_dir):
    """q239: the identical 16-step power iteration (per-step products
    quantized at 1e-12, decimal-summed) from per-user transitions."""
    per_user: dict[int, list] = defaultdict(list)
    for u, ts, eid, et in _sql(
        smoke_dir, "events", "user_id, ts, event_id, event_type"
    ):
        per_user[u].append((_us(ts), eid, et))
    nab: Counter = Counter()
    for u, evs in per_user.items():
        evs = sorted(evs)
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            nab[(a, b)] += 1
    out_tot: Counter = Counter()
    for (a, _), c in nab.items():
        out_tot[a] += c
    tp = {(a, b): float(c) / out_tot[a] for (a, b), c in nab.items()}
    states = sorted(out_tot)
    v = {s: 1.0 / len(states) for s in states}
    for _ in range(16):
        nxt: dict[str, Decimal] = defaultdict(Decimal)
        for (a, b), p_ab in tp.items():
            if a in v:
                nxt[b] += _dec(v[a] * p_ab, 12)
        v = {s: float(q) for s, q in nxt.items()}
    expect = [
        {"state": s, "stationary_p": _round(v[s])} for s in sorted(v)
    ]
    assert _rows(spark, smoke_dir, "q239_markov_stationary") == expect


def test_auc_rank_matches_python(spark, smoke_dir):
    """q198: Mann-Whitney AUC with midrank ties from the raw documents
    table — exact rank sums via Fractions, one double division."""
    rows = _sql(smoke_dir, "documents", "n_chars, lang")
    scores = sorted({s for s, _ in rows})
    cnt: Counter = Counter(s for s, _ in rows)
    pos: Counter = Counter(s for s, lang in rows if lang == "en")
    npos = sum(pos.values())
    nneg = sum(cnt.values()) - npos
    below, possum = 0, Fraction(0)
    for s in scores:
        possum += pos[s] * (Fraction(below) + Fraction(cnt[s] + 1, 2))
        below += cnt[s]
    num = float(possum - Fraction(npos * (npos + 1), 2))
    auc = num / (float(npos) * float(nneg))
    assert _rows(spark, smoke_dir, "q198_auc_rank") == [
        {"npos": npos, "nneg": nneg, "auc": _round(auc)}
    ]
