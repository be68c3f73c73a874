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

from bench import load_calibration


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
