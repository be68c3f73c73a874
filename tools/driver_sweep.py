"""Driver-mimicking correctness sweep (dev tool).

Runs every declared query against its DuckDB oracle at sf0.01 the way the
round driver does, but with a STRICTER canonicalization than
``hadoop_trans_spark.testing.oracle``: floats are rendered verbatim
(``repr``), so a DuckDB ``124750.0`` vs Spark ``124750`` typing divergence
fails here even though values are equal.  Round 1's three driver hash-fails
were exactly this artifact; this tool exists so we see them before the
driver does.

Also reports per-query wall-clock (Spark side) so the slow tail that can
truncate a time-capped driver sweep is visible.

Usage: python tools/driver_sweep.py [sf_dir] [query_prefix ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from hadoop_trans_spark.queries import ORACLE, QUERIES  # noqa: E402
from hadoop_trans_spark.session import get_spark  # noqa: E402
from hadoop_trans_spark.testing.oracle import NULL, SEP, duckdb_connect  # noqa: E402


def strict_canon(v: object) -> str:
    if v is None:
        return NULL
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # no integral-float collapse: 124750.0 != 124750
    return str(v)


def strict_rows(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    rows = [
        SEP.join(strict_canon(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def to_pandas_obj(df) -> pd.DataFrame:
    pdf = df if isinstance(df, pd.DataFrame) else df.toPandas()
    return pdf.astype(object).where(pd.notna(pdf), None)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])
    spark = get_spark(app_name="driver_sweep")
    con = duckdb_connect(sf_dir)

    report: dict[str, dict] = {}
    t_all = time.perf_counter()
    for name, fn in QUERIES.items():
        if prefixes and not name.startswith(prefixes):
            continue
        row: dict = {}
        t0 = time.perf_counter()
        try:
            spk = to_pandas_obj(fn(spark, sf_dir))
            row["spark_sec"] = round(time.perf_counter() - t0, 2)
            row["spark_rows"] = len(spk)
        except Exception as e:  # noqa: BLE001
            row["err"] = f"spark: {type(e).__name__}: {e}"[:300]
            report[name] = row
            print(json.dumps({name: row}), flush=True)
            continue
        sql = ORACLE.get(name)
        if sql is None:
            row["oracle"] = "none (rows-only)"
            report[name] = row
            print(json.dumps({name: row}), flush=True)
            continue
        try:
            ora = to_pandas_obj(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            row["err"] = f"oracle: {type(e).__name__}: {e}"[:300]
            report[name] = row
            print(json.dumps({name: row}), flush=True)
            continue
        row["oracle_rows"] = len(ora)
        row["schema_match"] = sorted(spk.columns) == sorted(ora.columns)
        row["rows_match"] = len(spk) == len(ora)
        if row["schema_match"] and row["rows_match"]:
            s, o = strict_rows(spk), strict_rows(ora)
            diffs = [(a, b) for a, b in zip(s, o) if a != b]
            row["strict_hash_match"] = not diffs
            if diffs:
                row["first_diff"] = {"spark": diffs[0][0][:200], "oracle": diffs[0][1][:200]}
        print(json.dumps({name: row}), flush=True)
        report[name] = row

    bad = {
        n: r
        for n, r in report.items()
        if r.get("err")
        or r.get("strict_hash_match") is False
        or r.get("schema_match") is False
        or r.get("rows_match") is False
    }
    slow = sorted(report.items(), key=lambda kv: -kv[1].get("spark_sec", 0))[:10]
    print("\n=== SUMMARY ===")
    print(f"queries: {len(report)}  bad: {len(bad)}  total_sec: {round(time.perf_counter() - t_all, 1)}")
    for n, r in bad.items():
        print(f"BAD {n}: {json.dumps(r)[:400]}")
    print("slowest:", [(n, r.get("spark_sec")) for n, r in slow])


if __name__ == "__main__":
    main()
