"""Per-query job/stage profile: how many Spark jobs and stages one
declared query triggers end-to-end (build + noop-sink execute), and its
wall time. The companion diagnostic to bench.py for this round's
optimization work: on top of shuffle bytes, *fixed per-job overhead* is
a real cost at both ends of the scale ladder (driver round-trips on a
cluster, scheduler latency locally), so a query that runs 14 jobs where
3 would do is leaving wall-clock on the table even when its shuffle
volume is optimal.

Usage: python tools/job_profile.py [--sf sfX] [--runs N] q245 q202 ...
Prints one line per query: jobs, stages, tasks, wall seconds (min over
N runs, default 1; stage memos cleared per draw like bench.py).
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MEMOIZED, execute  # noqa: E402
from hadoop_trans_spark.operators.stage import clear_stage_memo  # noqa: E402
from hadoop_trans_spark.queries import QUERIES  # noqa: E402
from hadoop_trans_spark.session import get_spark  # noqa: E402


def profile_once(spark, name: str, sf_dir: str) -> dict:
    sc = spark.sparkContext
    group = f"profile_{uuid.uuid4().hex}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    execute(QUERIES[name](spark, sf_dir))
    wall = time.perf_counter() - t0
    # Clear via setLocalProperty (ADVICE r14): setJobGroup(None, None)
    # passes None where PySpark declares str and only works because py4j
    # forwards null today.
    sc.setLocalProperty("spark.jobGroup.id", None)
    sc.setLocalProperty("spark.job.description", None)
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    stages = tasks = 0
    for j in job_ids:
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = tracker.getStageInfo(s)
            if si is not None:
                stages += 1
                tasks += si.numTasks
    return {"jobs": len(job_ids), "stages": stages, "tasks": tasks, "wall": wall}


def main() -> None:
    args = sys.argv[1:]
    sf = "sf0.1"
    runs = 1
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    sf_dir = sf if os.path.isabs(sf) else f"/root/testdata/{sf}"
    names = [n for n in QUERIES if n.startswith(tuple(args))] if args else list(QUERIES)
    spark = get_spark(app_name="job_profile")
    execute(QUERIES["q01_pricing_summary"](spark, sf_dir))  # warm-up
    print(f"{'query':46s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s} {'wall_s':>8s}")
    for name in names:
        best = None
        for _ in range(runs):
            if name in MEMOIZED:
                clear_stage_memo(MEMOIZED[name])
            r = profile_once(spark, name, sf_dir)
            if best is None or r["wall"] < best["wall"]:
                best = r
        print(
            f"{name:46s} {best['jobs']:5d} {best['stages']:6d} "
            f"{best['tasks']:6d} {best['wall']:8.2f}"
        )


if __name__ == "__main__":
    main()
