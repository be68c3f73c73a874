"""UDF surface (E29 pandas scalar UDF, E30 grouped-agg UDF, E31 grouped-map
applyInPandas). All Arrow-batched — never row-at-a-time Python — and each
chosen so results are exact (integer / median / rank) rather than
float-accumulation-order-dependent, keeping the DuckDB oracles bitwise.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..operators.textstats import TOKEN_PATTERN
from .base import query


@query(
    "q49_pandas_udf_tokens",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_udf
    FROM documents
    ORDER BY doc_id
    """,
)
def q49_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E29: vectorized (Arrow) pandas UDF — regex token count per row.
    ~10-100× the throughput of a row-at-a-time Python UDF; still the slow
    path vs the built-in regexp_extract_all used by q35."""

    @F.pandas_udf(T.LongType())
    def count_tokens(texts: pd.Series) -> pd.Series:
        # Nullable Int64: NULL text counts NULL (str.count gives NaN),
        # matching the oracle's len(regexp_extract_all(NULL)) = NULL —
        # plain int64 astype crashes the worker on the first NULL doc
        # (NULL-probe find, r10).
        return texts.str.count(TOKEN_PATTERN).astype("Int64")

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", count_tokens("text").alias("n_tokens_udf")
    ).orderBy("doc_id")


@query(
    "q50_grouped_agg_median",
    oracle="""
    SELECT o_orderpriority AS prio,
           CAST(ROUND(median(o_totalprice), 6) AS DOUBLE) AS median_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY prio
    """,
)
def q50_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E30: grouped-aggregate pandas UDF (median — exact, order-free, so
    the oracle matches bitwise; a float mean would depend on summation
    order). Spark has no exact-median aggregate without sort tricks."""

    @F.pandas_udf(T.DoubleType())
    def median_udf(v: pd.Series) -> float:
        return float(v.median())

    # Spark rejects mixing a grouped-agg pandas UDF with JVM aggregates in
    # one agg(), but two pandas UDAFs share one — a single shuffle + one
    # Arrow pass per group, no join.
    @F.pandas_udf(T.LongType())
    def count_udf(v: pd.Series) -> int:
        return len(v)

    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.round(median_udf("o_totalprice"), 6).alias("median_price"),
            count_udf("o_totalprice").alias("n"),
        )
        .orderBy("prio")
    )


@query(
    "q51_apply_in_pandas_rank",
    oracle="""
    SELECT c_custkey AS custkey,
           c_mktsegment AS segment,
           rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS bal_rank
    FROM customer
    ORDER BY custkey
    """,
)
def q51_apply_in_pandas_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E31: grouped-map applyInPandas (per-group pandas DataFrame in/out).
    In-group rank with method='min' ≡ SQL RANK() — ints, exact.
    One shuffle on the group key; each group must fit a worker's memory
    (the operator's documented contract)."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["bal_rank"] = pdf["c_acctbal"].rank(method="min").astype("int64")
        return pdf[["c_custkey", "c_mktsegment", "bal_rank"]]

    c = table(spark, sf_dir, "customer")
    out = c.groupBy("c_mktsegment").applyInPandas(
        rank_group, "c_custkey long, c_mktsegment string, bal_rank long"
    )
    return out.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        "bal_rank",
    ).orderBy("custkey")


@query(
    "q113_python_udtf",
    oracle=r"""
    SELECT doc_id, word, n FROM (
        SELECT doc_id, g AS word, COUNT(*) AS n,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY COUNT(*) DESC, g) AS rk
        FROM (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '[^a-z]+')) AS g
              FROM documents WHERE doc_id % 50 = 0)
        WHERE length(g) >= 3
        GROUP BY doc_id, g
    ) WHERE rk <= 3
    ORDER BY doc_id, n DESC, word
    """,
)
def q113_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF (table function): one input row → N output
    rows computed in Python, here the top-3 words per document with
    counts. The UDTF surface is the escape hatch for row-expanding logic
    no built-in expresses (custom parsers, tokenizers, format shredders);
    this one is deliberately reproducible in SQL so the contract —
    lateral-joined, arrow-batched, schema-declared — is oracle-checked.
    Hot paths should still prefer explode()+agg (q110 shows the same
    computation JVM-side); the UDTF is for logic that genuinely needs
    Python."""
    import re
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, n: bigint")
    class TopWords:
        def eval(self, text: str):  # noqa: ANN001
            words = [
                w
                for w in re.split(r"[^a-z]+", (text or "").lower())
                if len(w) >= 3
            ]
            top = sorted(
                Counter(words).items(), key=lambda kv: (-kv[1], kv[0])
            )[:3]
            for w, n in top:
                yield (w, n)

    spark.udtf.register("top_words", TopWords)
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 50 == 0)
    d.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT d.doc_id, t.word, t.n "
        "FROM udtf_docs d, LATERAL top_words(d.text) t"
    )
    return out.orderBy("doc_id", F.desc("n"), "word")


@query(
    "q139_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS charge
    FROM lineitem
    WHERE l_orderkey % 25 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q139_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch transform surface — Python
    receives raw pyarrow RecordBatches (no pandas materialization, no
    index/NaN conversions) and returns batches. The right tool when the
    Python side is itself Arrow-native (Arrow compute kernels, Polars,
    DuckDB, tensor libs with Arrow interop); pandas UDFs (q49) pay a
    pandas round-trip on top. The arithmetic here runs as vectorized
    Arrow kernels whose IEEE result is bit-identical to the JVM/DuckDB
    expression, keeping the oracle exact. Batch size rides
    spark.sql.execution.arrow.maxRecordsPerBatch; the operator is a pure
    map — no shuffle, scales linearly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def charge_batches(batches):
        for batch in batches:
            charge = pc.multiply(
                batch.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("l_orderkey"),
                    batch.column("l_linenumber"),
                    charge,
                ],
                names=["l_orderkey", "l_linenumber", "charge"],
            )

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 25 == 0)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )
    out = li.mapInArrow(
        charge_batches, "l_orderkey long, l_linenumber int, charge double"
    )
    return out.orderBy("l_orderkey", "l_linenumber")
