"""Unit tests for bench.py's calibration handling (no Spark needed).

The BENCH stdout line carries a drift-calibration block so the judge can
separate code delta from machine drift; these pin the vintage check —
a calibration produced against anything but the NEWEST BENCH_r*.json
round must surface as a machine-readable error, never ride along as if
fresh — and the unreadable-file marker.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MOVER_THRESHOLD, compute_movers, load_calibration


def _write(d, name, obj):
    with open(os.path.join(d, name), "w") as fh:
        json.dump(obj, fh)


def test_no_calibration_file(tmp_path):
    assert load_calibration(str(tmp_path)) is None


def test_fresh_calibration_passes_through(tmp_path):
    calib = {"prev_round": 7, "prev_commit": "abc1234", "drift_factor": 1.05}
    _write(tmp_path, "calibration.json", calib)
    _write(tmp_path, "BENCH_r06.json", {"parsed": {"value": 1.0}})
    _write(tmp_path, "BENCH_r07.json", {"parsed": {"value": 2.0}})
    assert load_calibration(str(tmp_path)) == calib


def test_stale_calibration_flagged(tmp_path):
    _write(tmp_path, "calibration.json", {"prev_round": 6, "drift_factor": 1.1})
    _write(tmp_path, "BENCH_r07.json", {"parsed": {"value": 2.0}})
    got = load_calibration(str(tmp_path))
    assert got == {
        "error": "calibration stale",
        "calibrated_against_round": 6,
        "latest_bench_round": 7,
    }


def test_stale_check_survives_double_digit_rounds(tmp_path):
    # r10 must compare numerically (not lexically) against r9.
    _write(tmp_path, "calibration.json", {"prev_round": 9})
    _write(tmp_path, "BENCH_r09.json", {"parsed": {"value": 1.0}})
    _write(tmp_path, "BENCH_r10.json", {"parsed": {"value": 1.0}})
    got = load_calibration(str(tmp_path))
    assert got["error"] == "calibration stale"
    assert got["latest_bench_round"] == 10
    _write(tmp_path, "calibration.json", {"prev_round": 10})
    assert load_calibration(str(tmp_path)) == {"prev_round": 10}


def test_unreadable_calibration_marked(tmp_path):
    with open(os.path.join(tmp_path, "calibration.json"), "w") as fh:
        fh.write("{not json")
    assert load_calibration(str(tmp_path)) == {
        "error": "calibration.json unreadable"
    }


def test_no_bench_rounds_yet_keeps_calibration(tmp_path):
    # A repo with no BENCH_r*.json (fresh clone pre-round-1) has nothing
    # to vintage-check against; keep the file rather than false-flagging.
    calib = {"prev_round": 1}
    _write(tmp_path, "calibration.json", calib)
    assert load_calibration(str(tmp_path)) == calib


def test_same_round_rerun_not_false_flagged(tmp_path):
    # ADVICE r8: a round-9 calibration (prev_round=8) must stay fresh
    # after the driver captures BENCH_r09.json, IF that artifact's own
    # embedded calibration block carries the same prev_commit — it's the
    # very calibration that produced the line, not a stale leftover.
    calib = {"prev_round": 8, "prev_commit": "abc1234", "drift_factor": 1.02}
    _write(tmp_path, "calibration.json", calib)
    _write(
        tmp_path,
        "BENCH_r09.json",
        {"parsed": {"value": 5.0, "calibration": {"prev_commit": "abc1234"}}},
    )
    assert load_calibration(str(tmp_path)) == calib


def test_genuinely_stale_still_flagged_despite_embedded_block(tmp_path):
    # A DIFFERENT prev_commit in the newest BENCH's embedded block means
    # the on-disk file is from an older round — still stale.
    _write(
        tmp_path,
        "calibration.json",
        {"prev_round": 7, "prev_commit": "old0000"},
    )
    _write(
        tmp_path,
        "BENCH_r09.json",
        {"parsed": {"value": 5.0, "calibration": {"prev_commit": "new1111"}}},
    )
    got = load_calibration(str(tmp_path))
    assert got["error"] == "calibration stale"


def test_stale_without_prev_commit_still_flagged(tmp_path):
    # No prev_commit to disambiguate with -> conservative: stale.
    _write(tmp_path, "calibration.json", {"prev_round": 8})
    _write(
        tmp_path,
        "BENCH_r09.json",
        {"parsed": {"value": 5.0, "calibration": {"prev_commit": "abc1234"}}},
    )
    assert load_calibration(str(tmp_path))["error"] == "calibration stale"


def test_movers_flags_drift_adjusted_regressions(tmp_path):
    _write(
        tmp_path,
        "BENCH_r08.json",
        {"parsed": {"queries": {"q1": 1.0, "q2": 2.0, "q3": 1.0}}},
    )
    calib = {"prev_round": 8, "drift_factor": 1.1}
    # q1: 1.6 / (1.0*1.1) = 1.45 -> mover; q2: 2.2/2.2 = 1.0 -> not;
    # q3: 1.3 / 1.1 = 1.18 -> below threshold.
    timings = {"q1": 1.6, "q2": 2.2, "q3": 1.3}
    movers = compute_movers(timings, str(tmp_path), calib)
    assert [m["query"] for m in movers] == ["q1"]
    assert movers[0]["drift_adj_ratio"] > MOVER_THRESHOLD
    assert movers[0]["prev_s"] == 1.0 and movers[0]["cur_s"] == 1.6


def test_movers_uses_newest_round_and_raw_ratio_without_calibration(tmp_path):
    _write(tmp_path, "BENCH_r08.json", {"parsed": {"queries": {"q1": 9.0}}})
    _write(tmp_path, "BENCH_r09.json", {"parsed": {"queries": {"q1": 1.0}}})
    # Stale-marked calibration must NOT contribute its drift factor.
    movers = compute_movers(
        {"q1": 1.3}, str(tmp_path), {"error": "calibration stale"}
    )
    assert [m["query"] for m in movers] == ["q1"]
    assert movers[0]["drift_adj_ratio"] == 1.3


def test_movers_empty_without_bench_artifacts(tmp_path):
    assert compute_movers({"q1": 1.0}, str(tmp_path), None) == []


def test_missed_recalibration_cannot_self_perpetuate(tmp_path):
    # Round 10 forgets bench_calibrate: the round-9 calibration
    # (prev_round=8) had its prev_commit embedded into BENCH_r09 AND,
    # via the bypass, would be re-embedded into BENCH_r10. The
    # prev_round==latest-1 leg must flag it stale anyway — a matching
    # embedded commit only vouches for the round right after it.
    calib = {"prev_round": 8, "prev_commit": "9a53057"}
    _write(tmp_path, "calibration.json", calib)
    _write(
        tmp_path,
        "BENCH_r09.json",
        {"parsed": {"value": 5.0, "calibration": {"prev_commit": "9a53057"}}},
    )
    _write(
        tmp_path,
        "BENCH_r10.json",
        {"parsed": {"value": 5.0, "calibration": {"prev_commit": "9a53057"}}},
    )
    got = load_calibration(str(tmp_path))
    assert got["error"] == "calibration stale"
    assert got["latest_bench_round"] == 10


def test_movers_fall_back_past_parsed_null_artifact(tmp_path):
    # A truncated driver capture ('parsed': null — the rounds-1-2
    # failure mode) must not disable movers: the newest artifact WITH a
    # per-query map becomes the baseline, and drift gating keys on that
    # baseline round.
    _write(tmp_path, "BENCH_r09.json", {"parsed": {"queries": {"q1": 1.0}}})
    _write(tmp_path, "BENCH_r10.json", {"parsed": None})
    calib = {"prev_round": 9, "drift_factor": 1.0}
    movers = compute_movers({"q1": 1.5}, str(tmp_path), calib)
    assert [m["query"] for m in movers] == ["q1"]
    assert movers[0]["drift_adj_ratio"] == 1.5


def test_movers_ignore_drift_from_a_different_baseline_round(tmp_path):
    # calibration maps r8->today, but the movers baseline is BENCH_r09
    # (this round's own artifact landed): factor must NOT apply.
    _write(tmp_path, "BENCH_r09.json", {"parsed": {"queries": {"q1": 1.0}}})
    calib = {"prev_round": 8, "drift_factor": 2.0}
    movers = compute_movers({"q1": 1.3}, str(tmp_path), calib)
    assert [m["query"] for m in movers] == ["q1"]
    assert movers[0]["drift_adj_ratio"] == 1.3
