"""Capture .explain("formatted") for declared queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> q123 q204 ...
Writes plans/r{N}/<query>_<suffix>.txt for each named query (prefix match
on the registry), using the engine session (same confs as bench.py).
The round dir defaults to the CURRENT round (latest BENCH_r*.json + 1);
override with $SPARK_GRAFT_PLANS_DIR.

The optimization-round judge cannot run Spark: these files are the
evidence for every plan claim in OPTIMIZATION_r14.md (Exchange counts,
join strategies, PushedFilters/ReadSchema, Python-eval nodes).

Note: building a query's DataFrame executes any eager stage
materialization on its path (materialize_stage / memo_stage), so heavy
pipelines run their staging jobs once during capture — the captured
plan is the plan of the RETURNED DataFrame, exactly what bench.py's
noop-sink write executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_trans_spark.plans.explain import explain_formatted  # noqa: E402
from hadoop_trans_spark.queries import QUERIES  # noqa: E402
from hadoop_trans_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    suffix = sys.argv[1]
    prefixes = tuple(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR")
    if not out_dir:
        from bench import _bench_rounds

        rounds = _bench_rounds(REPO)
        cur = (rounds[-1][0] + 1) if rounds else 1
        out_dir = os.path.join(REPO, "plans", f"r{cur}")
    os.makedirs(out_dir, exist_ok=True)
    names = [n for n in QUERIES if n.startswith(prefixes)]
    if not names:
        print(f"no queries match {prefixes}", file=sys.stderr)
        sys.exit(1)
    spark = get_spark(app_name="capture_plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_formatted(df))
        print(path)


if __name__ == "__main__":
    main()
