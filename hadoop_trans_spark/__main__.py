"""CLI entry points — reference parity with hadoop-trans's three tools.

    python -m hadoop_trans_spark migrate -srcDB /w1 -distDB /w2 \\
        -table lineitem -pn par_dt -pp yyyyMM -s 1996-01-01 -e 1996-12-31
    python -m hadoop_trans_spark migrate -srcDB /w1 -distDB /w2 -table t \\
        --whole-table                    # TransWholeTablePartition
    python -m hadoop_trans_spark compact -path /w1/events
    python -m hadoop_trans_spark verify -src /w1/lineitem -dist /w2/lineitem
    python -m hadoop_trans_spark sql -data /root/testdata/sf0.01 \\
        -q "SELECT count(*) FROM lineitem"

Flag names mirror the reference CLIs (`TransTablePartition.java:46-80`:
``-srcDB -distDB -table -pn -pp -s -e``; ``HDFSMerge.java:37-69``); the
``-email`` alert flag becomes ``--alerts-json`` (structured sink — we do
not reproduce the hard-coded-SMTP bug, `SendEmail.java:23-49`). Exit
codes: 0 on success, 1 when verification fails / any partition failed —
the shell-scriptable upgrade over the reference's log-and-continue.
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import asdict

from .pipelines import MigrateJob, compact_table, migrate, verify
from .pipelines.alerts import AlertSink


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m hadoop_trans_spark",
        description="PySpark-native partition migrate / compact / verify / sql",
    )
    p.add_argument("--master", default=None, help="Spark master (default: local[CPUs])")
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("migrate", help="copy date-range partitions between warehouse roots")
    m.add_argument("-srcDB", required=True, dest="src_root", help="source warehouse root")
    m.add_argument("-distDB", required=True, dest="dst_root", help="destination warehouse root")
    m.add_argument("-table", required=True)
    m.add_argument("-pn", default="par_dt", help="partition column name")
    m.add_argument("-pp", default="yyyyMM", help="partition date pattern")
    m.add_argument("-s", default=None, dest="start", help="range start (YYYY-MM-DD, inclusive)")
    m.add_argument("-e", default=None, dest="end", help="range end (YYYY-MM-DD, inclusive)")
    m.add_argument("--whole-table", action="store_true", help="migrate every partition (TransWholeTablePartition)")
    m.add_argument("--mode", choices=("skip", "overwrite", "fail"), default="skip", help="destination-conflict policy")
    m.add_argument("--no-verify", action="store_true", help="skip post-copy verification")
    m.add_argument("--alerts-json", default=None, help="append structured alerts to this JSONL file")

    c = sub.add_parser("compact", help="compact small files per partition (atomic swap)")
    c.add_argument("-path", required=True, help="table root path (Hive partition layout)")
    c.add_argument("--target-file-bytes", type=int, default=512 * 1024 * 1024)
    c.add_argument("--min-avg-file-bytes", type=int, default=None, help="compact partitions whose avg file size is below this (default: target/2)")
    c.add_argument("--alerts-json", default=None)

    v = sub.add_parser("verify", help="row-content equivalence of two tables")
    v.add_argument("-src", required=True, help="source table path")
    v.add_argument("-dist", required=True, dest="dst", help="destination table path")

    s = sub.add_parser("sql", help="run ANSI SQL over a warehouse directory")
    s.add_argument("-q", "--query", required=True)
    s.add_argument("-data", default=None, dest="data_dir", help="dir of <table>.parquet files to register as views")
    s.add_argument("-n", type=int, default=20, help="max rows to print")

    d = sub.add_parser("query", help="run a declared engine query by name (or list them)")
    d.add_argument("name", nargs="?", default=None, help="query name, e.g. q01_pricing_summary (omit to list)")
    d.add_argument("-data", required=False, default="/root/testdata/sf0.01", dest="data_dir")
    d.add_argument("-n", type=int, default=20, help="max rows to print")

    pl = sub.add_parser("pipeline", help="run a declarative JSON pipeline spec (stages of sql/query/read/write/count/verify)")
    pl.add_argument("-spec", required=True, help="path to the pipeline JSON file")
    pl.add_argument("-data", default=None, dest="data_dir", help="dir of <table>.parquet files to register as views")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from .session import get_spark

    spark = get_spark(app_name=f"hadoop_trans_spark_{args.cmd}", master=args.master)

    if args.cmd == "migrate":
        if not args.whole_table and not (args.start and args.end):
            print("migrate: pass -s and -e, or --whole-table", file=sys.stderr)
            return 2
        job = MigrateJob(
            src_root=args.src_root,
            dst_root=args.dst_root,
            table=args.table,
            partition_name=args.pn,
            pattern=args.pp,
            start=None if args.whole_table else args.start,
            end=None if args.whole_table else args.end,
            mode=args.mode,
            verify_after=not args.no_verify,
        )
        report = migrate(spark, job, sink=AlertSink(args.alerts_json))
        print(json.dumps({
            "copied": report.copied,
            "skipped_missing": report.skipped_missing,
            "conflicts": report.conflicts,
            "verified_ok": report.ok,
            "verify": {k: asdict(v) for k, v in report.verify.items()},
        }, indent=2, default=str))
        return 0 if report.ok else 1

    if args.cmd == "compact":
        report = compact_table(
            spark,
            args.path,
            target_file_bytes=args.target_file_bytes,
            min_avg_file_bytes=args.min_avg_file_bytes,
            sink=AlertSink(args.alerts_json),
        )
        print(json.dumps({
            "compacted": report.compacted,
            "skipped": report.skipped,
            "failed": report.failed,
            "files_before": report.files_before,
            "files_after": report.files_after,
        }, indent=2))
        return 0 if not report.failed else 1

    if args.cmd == "verify":
        rep = verify(spark.read.parquet(args.src), spark.read.parquet(args.dst))
        print(json.dumps(asdict(rep), indent=2, default=str))
        return 0 if rep.equal else 1

    if args.cmd == "sql":
        from .catalog import sql as engine_sql

        df = engine_sql(spark, args.query, sf_dir=args.data_dir)
        df.show(args.n, truncate=False)
        return 0

    if args.cmd == "query":
        from .queries import QUERIES

        if args.name is None:
            for name in QUERIES:
                print(name)
            return 0
        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; run with no name to list", file=sys.stderr)
            return 2
        QUERIES[args.name](spark, args.data_dir).show(args.n, truncate=False)
        return 0

    if args.cmd == "pipeline":
        from .pipelines import run_pipeline_file

        report = run_pipeline_file(spark, args.spec, sf_dir=args.data_dir)
        print(json.dumps({
            "counts": report.counts,
            "written": report.written,
            "verified": report.verified,
            "ok": report.ok,
        }, indent=2))
        return 0 if report.ok else 1

    return 2  # unreachable


if __name__ == "__main__":
    sys.exit(main())
