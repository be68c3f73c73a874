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
