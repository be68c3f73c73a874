"""Machine-drift calibration for round-over-round bench comparison.

Raw bench totals are not comparable across rounds: round 6 re-ran the
round-5-end code on the round-6 machine and measured 190.2 s where round
5 had recorded 166.3 s — ~15% pure machine drift that a naive
BENCH_r6-vs-BENCH_r5 diff misreads as a code regression. This tool makes
that protocol a one-command artifact:

  1. check out the PREVIOUS round's end commit into a temp git worktree;
  2. run its own bench.py there at $SPARK_GRAFT_SF_DIR (driver default
     /root/testdata/sf0.1) on today's machine;
  3. write calibration.json at the repo root:
       {"prev_round": N, "prev_commit": sha,
        "prev_recorded_s": <BENCH_rN.json parsed.value>,
        "prev_rerun_s": <today's rerun>, "sf": ...}

bench.py embeds calibration.json (when present) into bench_results.json
and a compact slice into its stdout line, so BENCH_r{N+1}.json carries
the drift factor machine-readably: code delta = current_total /
(prev_recorded * prev_rerun / prev_recorded) — i.e. compare
current_total against prev_rerun_s, not against the stale recording.

Usage: python tools/bench_calibrate.py [prev_commit] [--inject-bench]
  prev_commit defaults to the parent of the latest driver round-artifact
  commit ("round N: verdict/..."), i.e. the code state the driver
  benchmarked at the end of the previous round.

--inject-bench copies THIS repo's bench.py over the worktree's before
running, so the baseline is the previous round's QUERY CODE measured
under the current round's TIMING PROTOCOL. Required whenever the
protocol changes (round 12: count() -> noop-sink write — count() let
Catalyst prune unreferenced final-stage expressions, so v1 numbers
under-measure pruning-transparent queries and a raw v2-vs-v1 ratio
conflates protocol with code). The calibration records
"bench_injected": true so the conflated drift_factor (machine drift x
protocol change vs the old recorded total) is machine-readably
attributable.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(*args: str, cwd: str = REPO, env: dict | None = None) -> str:
    return subprocess.run(
        args, cwd=cwd, env=env, check=True, capture_output=True, text=True
    ).stdout


def latest_bench() -> tuple[int, float | None]:
    """(round, recorded total) from the newest BENCH_r{N}.json.

    A truncated driver capture records ``"parsed": null`` (the rounds-1-2
    failure mode, recurred in BENCH_r09.json); the total then usually
    survives only if ``"value": N`` happens to fall inside the 2000-char
    ``tail``. Tolerate the miss — the calibration's real payload is the
    same-machine RERUN (prev_rerun_s + full per-query map); the recorded
    total only feeds the informational drift_factor, which goes null."""
    best = None
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m is None:
            # side artifacts like BENCH_r14_c8.json (the driver's 8-core
            # scaling run) are not round benches — skip, don't crash.
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            with open(p) as fh:
                data = json.load(fh)
            value = (data.get("parsed") or {}).get("value")
            if value is None:
                m = re.search(r'"value": ([0-9.]+)', data.get("tail") or "")
                value = float(m.group(1)) if m else None
            best = (n, value)
    if best is None:
        raise SystemExit("no BENCH_r*.json found — nothing to calibrate against")
    return best


def default_prev_commit(prev_round: int) -> str:
    """The code state the driver benchmarked: the parent of the driver's
    'round N: ...' artifact commit (artifact files don't affect bench)."""
    out = sh(
        "git", "log", "--format=%H %s", "--grep", f"^round {prev_round}:", "-n", "1"
    ).strip()
    if not out:
        raise SystemExit(
            f"no 'round {prev_round}:' driver commit found — pass prev_commit"
        )
    sha = out.split()[0]
    return sh("git", "rev-parse", f"{sha}^").strip()


def main() -> None:
    prev_round, prev_recorded = latest_bench()
    recorded_source = f"BENCH_r{prev_round:02d}.json"
    env_recorded = os.environ.get("SPARK_GRAFT_PREV_RECORDED")
    if prev_recorded is None and env_recorded:
        # Manual override for a parsed:null artifact whose total survives
        # only in prose (e.g. VERDICT.md quoting the driver's number).
        prev_recorded = float(env_recorded)
        recorded_source = "SPARK_GRAFT_PREV_RECORDED override"
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    inject_bench = "--inject-bench" in sys.argv[1:]
    prev_commit = args[0] if args else default_prev_commit(prev_round)
    prev_commit = sh("git", "rev-parse", "--short", prev_commit).strip()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    wt = tempfile.mkdtemp(prefix="bench_calib_")
    try:
        sh("git", "worktree", "add", "--detach", wt, prev_commit)
        if inject_bench:
            shutil.copyfile(
                os.path.join(REPO, "bench.py"), os.path.join(wt, "bench.py")
            )
            # The injected bench must not read the MAIN repo's BENCH_r*/
            # calibration artifacts through the worktree checkout — they
            # ride the checkout anyway (committed), which is fine: its
            # own movers/calibration output is discarded; only value +
            # queries are kept.
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        # Isolate the worktree run's Python path from the main repo.
        env.pop("PYTHONPATH", None)
        proc = subprocess.run(
            [sys.executable, os.path.join(wt, "bench.py")],
            cwd=wt,
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        if proc.returncode != 0:
            raise SystemExit(
                f"prev-commit bench failed rc={proc.returncode}:\n"
                + proc.stderr[-2000:]
            )
        line = proc.stdout.strip().splitlines()[-1]
        rerun = json.loads(line)
        # The worktree run's bench_results.json carries the FULL per-query
        # map (the stdout line is headline-only to survive driver-capture
        # truncation). Persisting it here gives this round's compute_movers
        # a same-machine, all-query baseline with drift 1.0 by construction
        # — cross-round coverage no longer depends on what fit in the
        # 2000-char BENCH tail (VERDICT r9 item 4).
        rerun_queries = {}
        try:
            with open(os.path.join(wt, "bench_results.json")) as fh:
                rerun_queries = json.load(fh).get("queries") or {}
        except (OSError, ValueError):
            pass
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)

    calib = {
        "prev_round": prev_round,
        "prev_commit": prev_commit,
        "prev_recorded_s": prev_recorded,
        "prev_recorded_source": recorded_source if prev_recorded else None,
        "prev_rerun_s": rerun["value"],
        "drift_factor": (
            round(rerun["value"] / prev_recorded, 4) if prev_recorded else None
        ),
        "sf": rerun.get("sf"),
        "bench_injected": inject_bench,
        "queries": rerun_queries,
    }
    with open(os.path.join(REPO, "calibration.json"), "w") as fh:
        json.dump(calib, fh, indent=1)
    print(json.dumps(calib))


if __name__ == "__main__":
    main()
