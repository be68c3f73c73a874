"""Driver-contract sweep with a VANILLA SparkSession (verification tool).

The round driver owns the SparkSession: it builds a plain
``SparkSession.builder.master(...).getOrCreate()`` — none of the engine
factory's confs — imports ``__spark_entry__``, and runs ``queries()``
against ``oracle_sql()`` over DuckDB views. This tool emulates exactly
that surface (unlike ``driver_sweep.py``, which uses the engine session
and a stricter float canon): conf-sensitive queries must self-configure
through ``__spark_entry__``'s ``_configure`` or they fail HERE the same
way they would fail in the driver.

Usage: python tools/vanilla_sweep.py [sf_dir] [query_prefix ...]
Exit 1 if any query mismatches.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])

    # VANILLA_MASTER overrides the core count for partition-schedule
    # invariance runs (round-6 precedent: a local[5] pass catches
    # outputs that depend on task count / aggregation order).
    spark = (
        SparkSession.builder.master(os.environ.get("VANILLA_MASTER", "local[8]"))
        .appName("vanilla_sweep")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from hadoop_trans_spark.testing.oracle import (
        canon_rows,
        duckdb_connect,
    )

    n = e.entry(spark).count()
    print(json.dumps({"entry_rows": n}), flush=True)

    qs, oracles = e.queries(), e.oracle_sql()
    names = [
        q for q in qs if not prefixes or q.startswith(prefixes)
    ]
    con = duckdb_connect(sf_dir)
    bad, t_all = [], time.time()
    for name in names:
        t0 = time.time()
        row: dict[str, object] = {}
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            row["spark_rows"] = len(sdf)
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                row["oracle_rows"] = len(odf)
                row["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                row["hash_match"] = canon_rows(sdf) == canon_rows(odf)
                ok = bool(
                    row["schema_match"]
                    and row["hash_match"]
                    and len(sdf) == len(odf)
                )
            else:
                row["oracle_rows"] = None
                ok = True  # rows-only check, like the driver's weak path
        except Exception as ex:  # noqa: BLE001 — sweep must finish
            row["err"] = f"{type(ex).__name__}: {ex}"[:400]
            ok = False
        row["sec"] = round(time.time() - t0, 2)
        if not ok:
            bad.append(name)
        print(json.dumps({name: row}), flush=True)

    print(
        f"\n=== VANILLA SUMMARY === queries: {len(names)}  bad: {len(bad)}"
        f"  total_sec: {round(time.time() - t_all, 1)}"
    )
    if bad:
        print("BAD:", bad)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
