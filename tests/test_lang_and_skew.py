"""Fixture-independent semantics checks flagged in round-1 review.

1. q37's oracle must reproduce lang_guess on NON-English text — the
   fixture corpus is English-like, so fixture greenness alone would not
   catch an oracle that only knows the zh/en/und branches.
2. salted_join is inner-only: small-side replication breaks outer-join
   semantics, so other modes must be rejected loudly.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hadoop_trans_spark.operators.skew import salted_join
from hadoop_trans_spark.operators.textstats import lang_guess
from hadoop_trans_spark.queries.base import ORACLE

MULTILINGUAL_DOCS = [
    (1, "en", "the cat sat on the mat and the dog slept"),
    (2, "es", "el perro y la casa de los vecinos"),
    (3, "de", "der hund und die katze das haus"),
    (4, "fr", "le chien et les chats et le chat"),
    (5, "zh", "你好世界 plain ascii too"),
    (6, "und", "xyzzy plugh qwerty asdf"),
    # es/en tie (de=1 vote each side? construct: 'the of' vs 'el la') —
    # en wins ties by branch order in both pipelines.
    (7, "mix", "the of el la"),
    # fr-vs-es overlap: 'la' votes for both; es branch checked first.
    (8, "mix", "la la le les et"),
]


def test_lang_guess_oracle_parity_off_fixture(spark):
    pdf = pd.DataFrame(MULTILINGUAL_DOCS, columns=["doc_id", "lang", "text"])
    sdf = spark.createDataFrame(pdf)
    got_spark = {
        r["doc_id"]: r["pred"]
        for r in sdf.select(
            "doc_id", lang_guess(F.col("text")).alias("pred")
        ).collect()
    }

    con = duckdb.connect()
    con.register("documents", pdf)
    got_oracle = {
        int(r[0]): r[2]
        for r in con.execute(ORACLE["q37_lang_id"]).fetchall()
    }
    assert got_spark == got_oracle
    # and the operator actually exercises every branch on this fixture
    assert set(got_spark.values()) == {"en", "es", "de", "fr", "zh", "und"}


def test_salted_join_rejects_non_inner(spark):
    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner"):
        salted_join(big, small, on="k", how="left")
    # inner still works and matches the plain join
    got = salted_join(big, small, on="k", how="inner").count()
    assert got == big.join(small, "k").count()
