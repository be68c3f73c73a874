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
from hypothesis import given, settings
from hypothesis import strategies as st
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


@given(data=st.data())
@settings(max_examples=8, deadline=None)
def test_salted_join_is_row_identical_to_plain_join(spark, data):
    """Salting must only refine the partitioning: on random inputs with
    duplicate keys AND fully duplicate rows on both sides, the salted
    join's row MULTISET must equal the plain inner join's exactly —
    replication or salt collisions must never add or drop matches."""
    from hadoop_trans_spark.operators.skew import salted_join

    keys = st.integers(min_value=0, max_value=4)
    big_rows = data.draw(
        st.lists(st.tuples(keys, st.integers(0, 3)), min_size=0, max_size=30)
    )
    small_rows = data.draw(
        st.lists(st.tuples(keys, st.integers(0, 3)), min_size=0, max_size=8)
    )
    n_salt = data.draw(st.sampled_from([1, 3, 16]))
    big = spark.createDataFrame(
        big_rows or [(None, None)], "k long, bval long"
    )
    small = spark.createDataFrame(
        small_rows or [(None, None)], "k long, sval long"
    )
    if not big_rows:
        big = big.where(F.lit(False))
    if not small_rows:
        small = small.where(F.lit(False))
    got = sorted(
        map(tuple, salted_join(big, small, "k", n_salt=n_salt).collect())
    )
    want = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == want


def test_copurchase_pairs_drops_mega_baskets(spark):
    """The C(k,2) in-array expansion materializes k(k-1)/2 structs per
    basket BEFORE exploding — one 16k-item basket built a 131M-struct
    array and OOM'd the whole JVM (r12 hot-key skew probe at sf0.1,
    q200; the crash also invalidated the 50 queries after it in the
    session). The documented-only cap is now ENFORCED: baskets beyond
    max_basket are excluded entirely (hub removal, the q204 judgment),
    small baskets are untouched, and consumers' oracles carry the same
    exclusion."""
    from hadoop_trans_spark.operators.cooccur import copurchase_pairs

    rows = [(1, i) for i in range(10)]      # mega-basket under a tiny cap
    rows += [(2, 100), (2, 101), (2, 102)]  # normal basket
    df = spark.createDataFrame(rows, "k long, item long")

    capped = copurchase_pairs(df, "k", "item", max_basket=5)
    got = sorted(map(tuple, capped.collect()))
    assert got == [(100, 101), (100, 102), (101, 102)]

    # cap off -> the quadratic expansion is the caller's choice
    full = copurchase_pairs(df, "k", "item", max_basket=None)
    assert full.count() == 45 + 3
