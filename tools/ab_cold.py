"""Cold-JVM, driver-protocol A/B runner (VERDICT r14 item 1).

One invocation = ONE fresh process/JVM running the named queries under
the bench protocol (engine session, q01 warm-up, per-query best-of-2
with a third draw for heavy queries, noop-sink action), with optional
session-conf overrides so the SAME code can be timed under different
configurations. Prints one JSON line.

The driver's bench is cold-JVM per round; warm in-session A/Bs (ab_time)
cannot see costs that only exist cold (codegen, first-touch, conf-
dependent planning), which is how the r14 SHJ conf shipped unproven.
Launch this repeatedly from a shell loop — each run is a fresh JVM:

  python tools/ab_cold.py q204 q209 --conf spark.sql.join.preferSortMergeJoin=true
  python tools/ab_cold.py q204 q209 --conf spark.local.dir=/tmp

Flags:
  --sf sfX|/abs/path   data dir (default sf0.1)
  --conf k=v           extra session conf (repeatable; overrides engine
                       defaults — get_spark applies extra_conf last)
  --label s            echoed into the output line for bookkeeping
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MEMOIZED, execute, time_headline  # noqa: E402
from hadoop_trans_spark.operators.stage import clear_stage_memo  # noqa: E402
from hadoop_trans_spark.queries import QUERIES  # noqa: E402
from hadoop_trans_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf, label = "sf0.1", ""
    conf: dict[str, str] = {}
    prefixes: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf = args[i + 1]
            i += 2
        elif a == "--conf":
            k, _, v = args[i + 1].partition("=")
            conf[k] = v
            i += 2
        elif a == "--label":
            label = args[i + 1]
            i += 2
        else:
            prefixes.append(a)
            i += 1
    if not prefixes:
        raise SystemExit(__doc__.strip())
    sf_dir = sf if os.path.isabs(sf) else f"/root/testdata/{sf}"
    names = [q for q in QUERIES if q.startswith(tuple(prefixes))]
    if not names:
        raise SystemExit(f"no queries match prefixes {prefixes}")

    spark = get_spark(app_name="ab_cold", extra_conf=conf or None)
    execute(QUERIES["q01_pricing_summary"](spark, sf_dir))  # warm-up

    timings: dict[str, float] = {}
    for name in names:

        def run_once(i: int, name: str = name) -> float:
            if name in MEMOIZED:
                clear_stage_memo(MEMOIZED[name])
            t0 = time.perf_counter()
            execute(QUERIES[name](spark, sf_dir))
            return time.perf_counter() - t0

        best, _ = time_headline(run_once)
        timings[name] = round(best, 4)

    print(
        json.dumps(
            {
                "label": label,
                "conf": conf,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                "sf": sf,
                "queries": timings,
                "total": round(sum(timings.values()), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
