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


def test_bm25_oracle_avgdl_rounds_at_scale_9():
    """q133's Spark side rounds avgdl at 1e-9 (llm_text.py); the oracle
    must use o_davg(scale=9) to match — the default scale=6 only agrees
    when the doc count's prime factors are 2/5 (r11 ADVICE find; a
    57-doc corpus diverges: 44.807018 vs 44.807017544)."""
    assert "/ 1000000000)" in ORACLE["q133_bm25_topk"]


@pytest.mark.parametrize("name", NO_ORACLE_NAMES)
def test_query_runs(name, spark, t2_dir):
    df = QUERIES[name](spark, t2_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
