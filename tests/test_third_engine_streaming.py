"""Third-engine rederivations for the streaming family (E37–E39).

The streaming queries' DuckDB oracles are an independent engine but share
repo-authored SQL (the lag/islands session query, the time_bucket watermark
WHEREs), so a misconception encoded in both the streaming job and its
oracle string would pass every sweep.  These tests break that correlation
by modeling the EVENT-TIME CONTRACT itself in pandas/pure Python — epoch-
microsecond integer arithmetic for bucketing, explicit watermark
subtraction, gap-and-island session merging — and comparing the full
output of the real Structured Streaming micro-batch pipeline against the
model.  No repo SQL, no repo operators, no DuckDB interval/time_bucket
semantics anywhere in the model path (DuckDB is used only to project raw
parquet columns).

Contracts pinned here (Structured Streaming, append mode):

* watermark = max(event time seen) − delay; a window/session is emitted
  exactly once, when its END ≤ the final watermark.
* tumbling window of an event at t: start = t − (t mod size).
* sliding windows (size 1 h, slide 30 m): the two starts
  t − (t mod slide) − k·slide, k ∈ {0, 1}.
* session merge rule: an event extends its predecessor's session iff
  ts − prev_ts < gap (end = last event + gap, so ts strictly inside
  [start, last+gap) merges; a gap of exactly `gap` starts a new session).
* late-data drop: a row arriving when its window end ≤ the in-force
  watermark contributes nothing — neither to counts nor to emitted rows.

Run at sf0.01 too when touched:

    SF_SMOKE_DIR=/root/testdata/sf0.01 python -m pytest \
        tests/test_third_engine_streaming.py -q
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd

from hadoop_trans_spark.queries import QUERIES

US_MIN = 60_000_000
US_HOUR = 3_600_000_000
DELAY_US = 10 * US_MIN  # withWatermark("ts", "10 minutes") everywhere here
GAP_US = 30 * US_MIN  # session_window gap


def _events(smoke_dir: str, cols: str) -> pd.DataFrame:
    """Raw column projection only — no transformation SQL in the model."""
    return duckdb.sql(
        f"select {cols} from read_parquet('{smoke_dir}/events.parquet')"
    ).df()


def _us(s: pd.Series) -> pd.Series:
    """Naive parquet timestamp → epoch microseconds (the fixture's ts is a
    µs-precision wall clock treated as UTC; unix_micros on the Spark side
    reads the identical instant under the repo's UTC session)."""
    return s.astype("datetime64[us]").astype("int64")


def _rows(spark, smoke_dir, name):
    return [r.asDict() for r in QUERIES[name](spark, smoke_dir).collect()]


def _dec6(x: float) -> Decimal:
    """double → decimal(38,6) cast the way Spark does it: HALF_UP quantize
    of the decimal the float prints as."""
    return Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def test_stream_tumbling_matches_event_time_model(spark, smoke_dir):
    """q54: hourly tumbling counts + exact decimal sums, append mode."""
    ev = _events(smoke_dir, "ts, event_type, value")
    t = _us(ev["ts"])
    wm = int(t.max()) - DELAY_US
    ws = t - (t % US_HOUR)
    m = pd.DataFrame(
        {"ws": ws, "event_type": ev["event_type"], "value": ev["value"]}
    )
    m = m[m["ws"] + US_HOUR <= wm]
    expect = []
    for (w, et), grp in sorted(m.groupby(["ws", "event_type"], sort=True).groups.items()):
        g = m.loc[grp]
        s = sum(_dec6(v) for v in g["value"])
        expect.append(
            {
                "window_start": int(w),
                "event_type": et,
                "n_events": len(g),
                "sum_value": float(s),
            }
        )
    got = _rows(spark, smoke_dir, "q54_stream_tumbling")
    assert got == expect


def test_stream_sliding_matches_event_time_model(spark, smoke_dir):
    """q55: 1 h windows sliding every 30 m — each event lands in exactly
    two windows; only watermark-finalized windows are emitted."""
    slide = 30 * US_MIN
    ev = _events(smoke_dir, "ts, event_type")
    t = _us(ev["ts"])
    wm = int(t.max()) - DELAY_US
    counts: dict[tuple[int, str], int] = {}
    for tu, et in zip(t.tolist(), ev["event_type"].tolist()):
        for k in (0, 1):
            w = tu - (tu % slide) - k * slide
            if w + US_HOUR <= wm:
                counts[(w, et)] = counts.get((w, et), 0) + 1
    expect = [
        {"window_start": w, "event_type": et, "n_events": n}
        for (w, et), n in sorted(counts.items())
    ]
    got = _rows(spark, smoke_dir, "q55_stream_sliding")
    assert got == expect


def test_stream_session_matches_gap_island_model(spark, smoke_dir):
    """q56: 30-minute-gap sessions per user, modeled as a pure-Python
    gap-and-island scan (no lag/cumsum SQL — the oracle's construction is
    exactly what this test must NOT share)."""
    ev = _events(smoke_dir, "user_id, ts")
    ev = ev.assign(tu=_us(ev["ts"]))
    wm = int(ev["tu"].max()) - DELAY_US
    expect = []
    for uid, grp in ev.groupby("user_id", sort=True):
        ts_sorted = sorted(grp["tu"].tolist())
        sessions: list[list[int]] = []
        for tu in ts_sorted:
            if sessions and tu - sessions[-1][-1] < GAP_US:
                sessions[-1].append(tu)
            else:
                sessions.append([tu])
        for s in sessions:
            end = s[-1] + GAP_US
            if end <= wm:
                expect.append(
                    {
                        "user_id": int(uid),
                        "session_start": s[0],
                        "session_end": end,
                        "n_events": len(s),
                    }
                )
    expect.sort(key=lambda r: (r["user_id"], r["session_start"]))
    got = _rows(spark, smoke_dir, "q56_stream_session")
    assert got == expect


def test_stream_late_drop_matches_event_time_model(spark, smoke_dir):
    """q59: the held-back rows (event_id % 997 == 0, staged as the third
    micro-batch) arrive behind the in-force watermark and are dropped;
    append mode emits hourly windows of the on-time rows only.

    Model preconditions asserted rather than assumed (they make the two
    watermark formulations — max over on-time vs max over all rows seen —
    coincide, and guarantee every late row is genuinely droppable):

    * max(late ts) ≤ max(first-batch ts): the late batch never advances
      the watermark past the on-time maximum;
    * every late row's window end ≤ max(first-batch ts) − delay, the
      watermark in force when the late batch arrives (batch-N data sets
      the filter watermark of batch N+2; the staging's middle batch exists
      precisely so batch 0's maximum governs the late batch).
    """
    ev = _events(smoke_dir, "event_id, ts")
    tu = _us(ev["ts"])
    late = ev["event_id"] % 997 == 0
    batch0 = (~late) & (ev["event_id"] % 13 != 0)
    wm_in_force = int(tu[batch0].max()) - DELAY_US
    assert int(tu[late].max()) <= int(tu[batch0].max())
    late_ends = tu[late] - (tu[late] % US_HOUR) + US_HOUR
    assert (late_ends <= wm_in_force).all(), "fixture late rows not droppable"

    ontime = tu[~late]
    wm = int(ontime.max()) - DELAY_US
    ws = ontime - (ontime % US_HOUR)
    ws = ws[ws + US_HOUR <= wm]
    expect = [
        {"window_start": int(w), "n_events": int(n)}
        for w, n in sorted(ws.value_counts().items())
    ]
    got = _rows(spark, smoke_dir, "q59_stream_late_drop")
    assert got == expect

    # Negative control: the drop is exercised, not vacuous — counting the
    # late rows would change at least one emitted window.
    ws_late = late_ends - US_HOUR
    assert (ws_late.isin([r["window_start"] for r in expect])).any()


def test_stream_windowed_topk_matches_event_time_model(spark, smoke_dir):
    """q183: top-3 event types per finalized hour window — same staging
    and watermark contract as q59, then a rank by (count desc, type asc)
    computed in pure Python over the model's finalized counts."""
    ev = _events(smoke_dir, "event_id, ts, event_type")
    tu = _us(ev["ts"])
    ontime = ev["event_id"] % 997 != 0
    wm = int(tu[ontime].max()) - DELAY_US
    counts: dict[tuple[int, str], int] = {}
    for t, et in zip(tu[ontime].tolist(), ev.loc[ontime, "event_type"].tolist()):
        w = t - (t % US_HOUR)
        if w + US_HOUR <= wm:
            counts[(w, et)] = counts.get((w, et), 0) + 1
    by_window: dict[int, list[tuple[int, str]]] = {}
    for (w, et), n in counts.items():
        by_window.setdefault(w, []).append((n, et))
    expect = []
    for w in sorted(by_window):
        ranked = sorted(by_window[w], key=lambda p: (-p[0], p[1]))
        for rk, (n, et) in enumerate(ranked[:3], 1):
            expect.append(
                {"window_start": w, "event_type": et, "n_events": n, "rk": rk}
            )
    got = _rows(spark, smoke_dir, "q183_stream_windowed_topk")
    assert got == expect


def test_stream_chained_rollup_matches_event_time_model(spark, smoke_dir):
    """q141: chained stateful aggregation — 15-minute per-user counts fed
    into hourly totals / active-slot counts / peak burst, remodeled as two
    plain dict passes."""
    q15 = 15 * US_MIN
    ev = _events(smoke_dir, "user_id, ts")
    tu = _us(ev["ts"])
    wm = int(tu.max()) - DELAY_US
    fine: dict[tuple[int, int], int] = {}
    for t, u in zip(tu.tolist(), ev["user_id"].tolist()):
        k = (t - (t % q15), int(u))
        fine[k] = fine.get(k, 0) + 1
    hourly: dict[int, list[int]] = {}
    for (w15, _u), c in fine.items():
        w = w15 - (w15 % US_HOUR)
        if w + US_HOUR <= wm:
            hourly.setdefault(w, []).append(c)
    expect = [
        {
            "window_start": w,
            "n_events": sum(cs),
            "n_user_slots": len(cs),
            "max_burst": max(cs),
        }
        for w, cs in sorted(hourly.items())
    ]
    got = _rows(spark, smoke_dir, "q141_stream_chained_rollup")
    assert got == expect


def test_stream_approx_distinct_exact_side_matches_pandas(spark, smoke_dir):
    """q132: the differential check's EXACT side (distinct users per
    finalized hourly window) re-derived with pandas nunique; the sketch
    side must have set every within_tol flag."""
    ev = _events(smoke_dir, "user_id, ts")
    tu = _us(ev["ts"])
    wm = int(tu.max()) - DELAY_US
    m = pd.DataFrame({"ws": tu - (tu % US_HOUR), "user_id": ev["user_id"]})
    m = m[m["ws"] + US_HOUR <= wm]
    exact = {
        int(w): int(g["user_id"].nunique()) for w, g in m.groupby("ws")
    }
    got = _rows(spark, smoke_dir, "q132_stream_approx_distinct")
    assert {r["window_start"]: r["exact_users"] for r in got} == exact
    assert all(r["within_tol"] == 1 for r in got)


def _interval_pairs(smoke_dir: str):
    """All (click, view) matches: same user, view_ts in
    [click_ts − 30 min, click_ts] — the q79/q148/q202 join predicate,
    evaluated by nested per-user scans (no SQL join anywhere)."""
    ev = _events(smoke_dir, "event_id, user_id, ts, event_type")
    ev = ev.assign(tu=_us(ev["ts"]))
    clicks = ev[ev["event_type"] == "click"]
    views = ev[ev["event_type"] == "view"]
    views_by_user: dict[int, list[tuple[int, int]]] = {}
    for vid, u, vt in zip(
        views["event_id"].tolist(), views["user_id"].tolist(), views["tu"].tolist()
    ):
        views_by_user.setdefault(int(u), []).append((int(vid), int(vt)))
    pairs = []  # (click_id, user, click_us, view_id, view_us)
    unmatched_clicks = []  # (click_id, user, click_us)
    for cid, u, ct in zip(
        clicks["event_id"].tolist(), clicks["user_id"].tolist(), clicks["tu"].tolist()
    ):
        hits = [
            (vid, vt)
            for vid, vt in views_by_user.get(int(u), [])
            if ct - 30 * US_MIN <= vt <= ct
        ]
        for vid, vt in hits:
            pairs.append((int(cid), int(u), int(ct), vid, vt))
        if not hits:
            unmatched_clicks.append((int(cid), int(u), int(ct)))
    matched_view_ids = {p[3] for p in pairs}
    unmatched_views = [
        (int(vid), int(u), int(vt))
        for u, vs in views_by_user.items()
        for vid, vt in vs
        if vid not in matched_view_ids
    ]
    wm = min(int(clicks["tu"].max()), int(views["tu"].max())) - DELAY_US
    return pairs, unmatched_clicks, unmatched_views, wm


def _join_key(r: dict):
    return (
        r["click_id"] is None,
        r["click_id"] or 0,
        r["view_id"] is None,
        r["view_id"] or 0,
    )


def test_stream_stream_inner_join_matches_model(spark, smoke_dir):
    """q79: inner interval join emits exactly the matched pairs."""
    pairs, _, _, _ = _interval_pairs(smoke_dir)
    expect = [
        {
            "click_id": cid,
            "view_id": vid,
            "user_id": u,
            "click_us": ct,
            "view_us": vt,
        }
        for cid, u, ct, vid, vt in pairs
    ]
    expect.sort(key=_join_key)
    got = sorted(_rows(spark, smoke_dir, "q79_stream_stream_join"), key=_join_key)
    assert got == expect


def test_stream_stream_left_join_emission_rule(spark, smoke_dir):
    """q148: matched pairs always; NULL-padded clicks only once the
    combined watermark (min of both sides' max event time − delay) has
    passed their event time — newer unmatched clicks are still
    unresolved at end-of-stream and must be absent."""
    pairs, unmatched_clicks, _, wm = _interval_pairs(smoke_dir)
    expect = [
        {
            "click_id": cid,
            "user_id": u,
            "click_us": ct,
            "view_id": vid,
            "view_us": vt,
        }
        for cid, u, ct, vid, vt in pairs
    ]
    resolved = [c for c in unmatched_clicks if c[2] < wm]
    expect += [
        {
            "click_id": cid,
            "user_id": u,
            "click_us": ct,
            "view_id": None,
            "view_us": None,
        }
        for cid, u, ct in resolved
    ]
    expect.sort(key=_join_key)
    got = sorted(
        _rows(spark, smoke_dir, "q148_stream_stream_left_join"), key=_join_key
    )
    assert got == expect
    # The rule's interesting clause is exercised: some unmatched click is
    # newer than the watermark and therefore withheld.
    assert len(resolved) < len(unmatched_clicks)


def test_stream_stream_full_outer_emission_rule(spark, smoke_dir):
    """q202: each side's NULL-padded rows emit under its OWN state
    horizon — clicks once wm > click_ts (they awaited views in
    [click_ts−30m, click_ts]), views once wm > view_ts + 30m (they
    awaited clicks in [view_ts, view_ts+30m])."""
    pairs, unmatched_clicks, unmatched_views, wm = _interval_pairs(smoke_dir)
    expect = [
        {
            "click_id": cid,
            "user_id": u,
            "click_us": ct,
            "view_id": vid,
            "view_us": vt,
        }
        for cid, u, ct, vid, vt in pairs
    ]
    expect += [
        {
            "click_id": cid,
            "user_id": u,
            "click_us": ct,
            "view_id": None,
            "view_us": None,
        }
        for cid, u, ct in unmatched_clicks
        if ct < wm
    ]
    expect += [
        {
            "click_id": None,
            "user_id": u,
            "click_us": None,
            "view_id": vid,
            "view_us": vt,
        }
        for vid, u, vt in unmatched_views
        if vt + 30 * US_MIN < wm
    ]
    expect.sort(key=_join_key)
    got = sorted(
        _rows(spark, smoke_dir, "q202_stream_stream_full_outer"), key=_join_key
    )
    assert got == expect


def test_stream_dedup_exactly_once(spark, smoke_dir):
    """q57: a doubled stream deduplicated by key must reproduce the raw
    table's per-type counts and exact decimal sums."""
    ev = _events(smoke_dir, "event_type, value")
    expect = [
        {
            "event_type": et,
            "n_events": len(g),
            "sum_value": float(sum(_dec6(v) for v in g["value"])),
        }
        for et, g in ev.groupby("event_type", sort=True)
    ]
    got = _rows(spark, smoke_dir, "q57_stream_dedup")
    assert got == expect


def _events_fingerprint(smoke_dir: str) -> dict:
    ev = _events(smoke_dir, "event_id, value")
    assert ev["event_id"].is_unique  # upsert-by-key == append for unique keys
    return {
        "n_rows": len(ev),
        "n_ids": int(ev["event_id"].nunique()),
        "min_id": int(ev["event_id"].min()),
        "max_id": int(ev["event_id"].max()),
        "sum_value": float(sum(_dec6(v) for v in ev["value"])),
    }


def test_stream_migrate_fingerprint(spark, smoke_dir):
    """q58: the incremental append sink's destination carries exactly the
    source rows (pandas-side fingerprint)."""
    assert _rows(spark, smoke_dir, "q58_stream_migrate") == [
        _events_fingerprint(smoke_dir)
    ]


def test_stream_upsert_sink_fingerprint(spark, smoke_dir):
    """q89: two identical micro-batches upserted by key converge to one
    row per key — the final target fingerprints like the distinct source."""
    assert _rows(spark, smoke_dir, "q89_stream_upsert_sink") == [
        _events_fingerprint(smoke_dir)
    ]


def test_stream_static_join_matches_pandas(spark, smoke_dir):
    """q88: stream-static broadcast enrich — per-segment counts, exact
    decimal sums, and distinct users re-derived by a pandas dict join."""
    ev = _events(smoke_dir, "user_id, value")
    cust = duckdb.sql(
        f"select c_custkey, c_mktsegment from "
        f"read_parquet('{smoke_dir}/customer.parquet')"
    ).df()
    seg = {
        int(k): s
        for k, s in zip(cust["c_custkey"], cust["c_mktsegment"])
        if int(k) <= 150
    }
    rows: dict[str, list] = {}
    users: dict[str, set] = {}
    for u, v in zip(ev["user_id"].tolist(), ev["value"].tolist()):
        s = seg.get(int(u))
        if s is not None:
            rows.setdefault(s, []).append(v)
            users.setdefault(s, set()).add(int(u))
    expect = [
        {
            "segment": s,
            "n_events": len(vs),
            "value_sum": float(sum(_dec6(v) for v in vs)),
            "n_users": len(users[s]),
        }
        for s, vs in sorted(rows.items())
    ]
    got = _rows(spark, smoke_dir, "q88_stream_static_join")
    assert got == expect


def test_stream_complete_totals_matches_pandas(spark, smoke_dir):
    """q189: complete-mode final state == batch aggregate per type."""
    ev = _events(smoke_dir, "event_type, value")
    expect = [
        {
            "event_type": et,
            "n_events": len(g),
            "sum_value": float(sum(_dec6(v) for v in g["value"])),
        }
        for et, g in ev.groupby("event_type", sort=True)
    ]
    got = _rows(spark, smoke_dir, "q189_stream_complete_totals")
    assert got == expect


def test_stream_restart_tumbling_matches_event_time_model(spark, smoke_dir):
    """q250: the tumbling emission rule computed ACROSS a checkpoint
    stop/resume must equal the same pandas event-time model q54 is held
    to — the model cannot see the restart, so agreement proves the
    state round-trip emitted exactly the never-stopped set."""
    ev = _events(smoke_dir, "ts, event_type, value")
    t = _us(ev["ts"])
    wm = int(t.max()) - DELAY_US
    ws = t - (t % US_HOUR)
    m = pd.DataFrame(
        {"ws": ws, "event_type": ev["event_type"], "value": ev["value"]}
    )
    m = m[m["ws"] + US_HOUR <= wm]
    expect = []
    for (w, et), grp in sorted(
        m.groupby(["ws", "event_type"], sort=True).groups.items()
    ):
        g = m.loc[grp]
        s = sum(_dec6(v) for v in g["value"])
        expect.append(
            {
                "window_start": int(w),
                "event_type": et,
                "n_events": len(g),
                "sum_value": float(s),
            }
        )
    got = _rows(spark, smoke_dir, "q250_stream_restart_tumbling")
    assert got == expect
    assert expect, "fixture produced no finalized windows"


def test_stream_restart_session_matches_gap_island_model(spark, smoke_dir):
    """q254: the session gap-merge computed ACROSS a checkpoint
    stop/resume must equal the same pure-Python gap-and-island model
    q56 is held to — the model cannot see the restart, so agreement
    proves an open session straddling the stop emitted ONCE, merged,
    not as two half-sessions."""
    ev = _events(smoke_dir, "user_id, ts")
    ev = ev.assign(tu=_us(ev["ts"]))
    wm = int(ev["tu"].max()) - DELAY_US
    expect = []
    for uid, grp in ev.groupby("user_id", sort=True):
        ts_sorted = sorted(grp["tu"].tolist())
        sessions: list[list[int]] = []
        for tu in ts_sorted:
            if sessions and tu - sessions[-1][-1] < GAP_US:
                sessions[-1].append(tu)
            else:
                sessions.append([tu])
        for s in sessions:
            end = s[-1] + GAP_US
            if end <= wm:
                expect.append(
                    {
                        "user_id": int(uid),
                        "session_start": s[0],
                        "session_end": end,
                        "n_events": len(s),
                    }
                )
    expect.sort(key=lambda r: (r["user_id"], r["session_start"]))
    got = _rows(spark, smoke_dir, "q254_stream_restart_session")
    assert got == expect
    assert expect, "fixture produced no finalized sessions"
