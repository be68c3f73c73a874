"""t2 differential tests: every declared query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate; queries without an oracle get
a rows-run smoke check only.
"""

from __future__ import annotations

import pytest

from hadoop_trans_spark.queries import ORACLE, QUERIES
from hadoop_trans_spark.testing.oracle import compare

ORACLE_NAMES = sorted(ORACLE)
NO_ORACLE_NAMES = sorted(set(QUERIES) - set(ORACLE))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, spark, t2_dir, oracle_t2):
    res = compare(name, QUERIES[name](spark, t2_dir), oracle_t2, ORACLE[name])
    assert res.match, (
        f"{name}: {res.detail} (spark={res.spark_rows} oracle={res.oracle_rows})\n"
        + "\n".join(f"  spark={a!r}\n  duck ={b!r}" for a, b in res.mismatches)
    )


@pytest.mark.parametrize("name", NO_ORACLE_NAMES)
def test_query_runs(name, spark, t2_dir):
    df = QUERIES[name](spark, t2_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
