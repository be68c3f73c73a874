"""Scalar function surface (SURVEY §2B E22–E28).

These run inside whole-stage codegen (pure `pyspark.sql.functions`,
no Python in the row path) — the 100 TB rule is simply "stay JVM-side".
The DuckDB oracles pin cross-engine semantics (1-based substring, natural
log, truncating integer division, lowercase hex digests, UTC timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .base import dround, o_dround, query


# --- E22: strings ------------------------------------------------------------
@query(
    "q24_string_funcs",
    oracle="""
    SELECT c_custkey AS custkey,
           concat(c_mktsegment, '|', c_name) AS tagged,
           substring(c_name, 10, 9) AS id_digits,
           lower(c_mktsegment) AS seg_lo,
           upper(c_mktsegment) AS seg_hi,
           length(c_name) AS name_len,
           trim('  ' || c_mktsegment || ' ') AS trimmed,
           regexp_extract(c_name, '([0-9]+)', 1) AS extracted,
           regexp_replace(c_name, '0+', '-', 'g') AS squashed,
           contains(c_name, '#') AS has_hash,
           starts_with(c_name, 'Customer') AS is_cust,
           ends_with(c_name, '1') AS ends_one,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           -- split_part returns '' when the separator is absent; the
           -- Spark twin must NOT use plain element_at, which is an
           -- ANSI ArrayIndexOutOfBounds job-killer on a '#'-less name
           -- (hostile-string probe find, r12).
           split_part(c_name, '#', 2) AS after_hash
    FROM customer
    ORDER BY custkey
    """,
)
def q24_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.select(
            F.col("c_custkey").alias("custkey"),
            F.concat(F.col("c_mktsegment"), F.lit("|"), F.col("c_name")).alias("tagged"),
            F.substring("c_name", 10, 9).alias("id_digits"),
            F.lower("c_mktsegment").alias("seg_lo"),
            F.upper("c_mktsegment").alias("seg_hi"),
            F.length("c_name").alias("name_len"),
            F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
                "trimmed"
            ),
            F.regexp_extract("c_name", "([0-9]+)", 1).alias("extracted"),
            F.regexp_replace("c_name", "0+", "-").alias("squashed"),
            F.col("c_name").contains("#").alias("has_hash"),
            F.col("c_name").startswith("Customer").alias("is_cust"),
            F.col("c_name").endswith("1").alias("ends_one"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
            # DuckDB split_part semantics: '' (not an error, not NULL)
            # when part 2 doesn't exist; NULL input stays NULL. Plain
            # element_at is an ANSI crash on a '#'-less name.
            F.when(
                F.col("c_name").isNotNull(),
                F.coalesce(
                    F.try_element_at(F.split("c_name", "#"), F.lit(2)),
                    F.lit(""),
                ),
            ).alias("after_hash"),
        )
        .orderBy("custkey")
    )


# --- E23: dates — including the reference's partition-key enumeration ---------
@query(
    "q25_partition_enumeration",
    oracle="""
    SELECT DISTINCT strftime(d, '%Y%m') AS partition_key
    FROM generate_series(DATE '1996-11-15', DATE '1997-03-02', INTERVAL 1 DAY) t(d)
    ORDER BY partition_key
    """,
)
def q25_partition_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's R3 partition enumerator (`CommonUtils.java:151-163`):
    expand an inclusive [start, end] date range, format with the partition
    pattern, dedup + sort (its TreeSet). Here: sequence → explode →
    date_format → distinct → sort, all on the JVM."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1996-11-15").cast("date"),
                    F.lit("1997-03-02").cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias("d")
        )
        .select(F.date_format("d", "yyyyMM").alias("partition_key"))
        .distinct()
        .orderBy("partition_key")
    )


@query(
    "q26_date_funcs",
    oracle="""
    SELECT o_orderkey AS okey,
           strftime(o_orderdate, '%Y-%m-%d') AS d_str,
           strftime(o_orderdate, '%Y%m') AS part_key,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(dayofweek(o_orderdate) AS INT) % 7 + 1 AS dow,
           -- Text rendering past year 9999 is format-undefined (Spark
           -- emits ISO expanded '+10000-…', DuckDB plain '10000-…'):
           -- the battery declares the 4-digit-year domain, NULL beyond
           -- (boundary-date probe find, r12).
           CASE WHEN year(o_orderdate + INTERVAL 30 DAY) <= 9999
                THEN strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')
           END AS plus30,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           epoch(o_orderdate) AS unix_sec
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY okey
    """,
)
def q26_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_format / year-month-day / dayofweek / date_add / datediff /
    trunc / unix_timestamp. Note DuckDB dayofweek is 0=Sunday-based while
    Spark's is 1=Sunday-based; the oracle normalizes."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return (
        o.select(
            F.col("o_orderkey").alias("okey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("d_str"),
            F.date_format("o_orderdate", "yyyyMM").alias("part_key"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("dom"),
            F.dayofweek("o_orderdate").alias("dow"),
            F.when(
                F.year(F.date_add("o_orderdate", 30)) <= 9999,
                F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd"),
            ).alias("plus30"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("days_since"),
            F.date_format(F.trunc("o_orderdate", "month"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.unix_timestamp("o_orderdate").cast("double").alias("unix_sec"),
        )
        .orderBy("okey")
    )


# --- E24: math -----------------------------------------------------------------
@query(
    "q27_math_funcs",
    oracle="""
    SELECT l_orderkey * 8 + l_linenumber AS rid,
           CAST(l_extendedprice + l_quantity AS DOUBLE) AS add_,
           CAST(l_extendedprice * l_discount AS DOUBLE) AS mul_,
           -- Division is defined only for a nonzero divisor: NULL
           -- otherwise, on BOTH sides (plain / is an ANSI
           -- DIVIDE_BY_ZERO job-killer for l_quantity = -1; the
           -- hostile-value probe find, r12).
           CAST(ROUND(CASE WHEN l_quantity + 1 <> 0
                           THEN l_extendedprice / (l_quantity + 1) END, 6)
                AS DOUBLE) AS div_,
           CAST(ROUND(l_extendedprice, 1) AS DOUBLE) AS round1,
           CAST(FLOOR(CASE WHEN ISFINITE(l_extendedprice)
                           THEN l_extendedprice END) AS BIGINT) AS floor_,
           CAST(CEIL(CASE WHEN ISFINITE(l_extendedprice)
                          THEN l_extendedprice END) AS BIGINT) AS ceil_,
           CAST(ABS(l_discount - 0.05) AS DOUBLE) AS abs_,
           CAST(POW(l_quantity, 2) AS DOUBLE) AS pow2,
           CAST(ROUND(SQRT(l_extendedprice), 6) AS DOUBLE) AS sqrt_,
           CAST(ROUND(LN(l_extendedprice + 1), 6) AS DOUBLE) AS ln_,
           CAST(l_orderkey // 100 AS BIGINT) AS intdiv,
           CAST(l_orderkey % 97 AS BIGINT) AS mod_
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY rid
    """,
)
def q27_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 300)
    return (
        li.select(
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("rid"),
            (F.col("l_extendedprice") + F.col("l_quantity")).alias("add_"),
            (F.col("l_extendedprice") * F.col("l_discount")).alias("mul_"),
            F.round(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") + 1), 6
            ).alias("div_"),
            F.round("l_extendedprice", 1).alias("round1"),
            # Integer results are undefined for non-finite inputs: NULL
            # on both sides (the oracle's BIGINT cast of floor(inf) is a
            # hard error, r11 money probe).
            F.floor(
                F.when(
                    F.abs("l_extendedprice") < F.lit(float("inf")),
                    F.col("l_extendedprice"),
                )
            ).alias("floor_"),
            F.ceil(
                F.when(
                    F.abs("l_extendedprice") < F.lit(float("inf")),
                    F.col("l_extendedprice"),
                )
            ).alias("ceil_"),
            F.abs(F.col("l_discount") - 0.05).alias("abs_"),
            F.pow("l_quantity", F.lit(2)).alias("pow2"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_"),
            F.expr("l_orderkey div 100").alias("intdiv"),
            (F.col("l_orderkey") % 97).alias("mod_"),
        )
        .orderBy("rid")
    )


# --- E25: conditionals -----------------------------------------------------------
@query(
    "q28_conditional",
    oracle="""
    SELECT s_suppkey AS skey,
           CASE WHEN s_acctbal < 0 THEN 'debt'
                WHEN s_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_class,
           COALESCE(NULLIF(s_nationkey, 0), -1) AS nation_or_default,
           GREATEST(s_acctbal, 0.0) AS bal_floor0,
           LEAST(CAST(s_suppkey AS DOUBLE), s_acctbal) AS least_,
           CASE WHEN s_suppkey % 2 = 0 THEN NULL ELSE s_name END AS maybe_name
    FROM supplier
    ORDER BY skey
    """,
)
def q28_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    return (
        s.select(
            F.col("s_suppkey").alias("skey"),
            F.when(F.col("s_acctbal") < 0, "debt")
            .when(F.col("s_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("bal_class"),
            F.coalesce(F.nullif("s_nationkey", F.lit(0)), F.lit(-1)).alias(
                "nation_or_default"
            ),
            F.greatest("s_acctbal", F.lit(0.0)).alias("bal_floor0"),
            F.least(F.col("s_suppkey").cast("double"), F.col("s_acctbal")).alias(
                "least_"
            ),
            F.when(F.col("s_suppkey") % 2 == 0, F.lit(None).cast("string"))
            .otherwise(F.col("s_name"))
            .alias("maybe_name"),
        )
        .orderBy("skey")
    )


# --- E26: arrays (incl. higher-order functions over embeddings) -----------------
@query(
    "q29_array_funcs",
    # NULL elements are SKIPPED by the sums on both sides (DuckDB's
    # list_sum skips them natively; the Spark fold filters first — a
    # NULL element otherwise NULLs the whole fold, r11 vec probe), and
    # the rounds are magnitude-capped (o_dround: ±1e30 components leave
    # the 2^53 round envelope).
    oracle=f"""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST({o_dround('CAST(embedding[1] AS DOUBLE)', 6)} AS DOUBLE)
               AS first_val,
           CAST({o_dround(
               "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))",
               6)} AS DOUBLE) AS vec_sum,
           CAST({o_dround(
               "list_max(list_transform(embedding, x -> CAST(x AS DOUBLE)))",
               6)} AS DOUBLE) AS vec_max,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           CAST({o_dround(
               "list_sum(list_transform(list_slice(embedding, 1, 8), "
               "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))", 6)}
               AS DOUBLE) AS head_sq_sum
    FROM embeddings
    ORDER BY vec_id
    """,
)
def q29_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / slice / transform / filter / aggregate over
    array<float>. All higher-order functions run in the JVM (codegen'd
    lambdas) — this is the vector-math fast path used by E35 similarity."""
    e = table(spark, sf_dir, "embeddings")
    dbl = lambda c: c.cast("double")  # noqa: E731
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            dround(F.element_at("embedding", 1).cast("double"), 6).alias(
                "first_val"
            ),
            dround(
                F.aggregate(
                    F.filter("embedding", lambda x: x.isNotNull()),
                    F.lit(0.0),
                    lambda acc, x: acc + dbl(x),
                ),
                6,
            ).alias("vec_sum"),
            dround(F.array_max(F.transform("embedding", dbl)), 6).alias(
                "vec_max"
            ),
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
            dround(
                F.aggregate(
                    F.filter(
                        F.slice("embedding", 1, 8),
                        lambda x: x.isNotNull(),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + dbl(x) * dbl(x),
                ),
                6,
            ).alias("head_sq_sum"),
        )
        .orderBy("vec_id")
    )


@query(
    "q30_array_words",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
             AS vocab,
           len(list_distinct(string_split(text, ' '))) AS n_vocab,
           array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS head5,
           COALESCE(list_contains(string_split(text, ' '), 'spark'), FALSE)
             AS has_spark
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def q30_array_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split / array_distinct / sort_array / slice / array_contains on text."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    words = F.split("text", " ")
    return (
        d.select(
            "doc_id",
            F.array_join(F.sort_array(F.array_distinct(words)), ",").alias("vocab"),
            F.size(F.array_distinct(words)).alias("n_vocab"),
            F.array_join(F.slice(words, 1, 5), " ").alias("head5"),
            # Two-state like q31's is_json: NULL text "contains spark" is
            # FALSE in both engines — tri-state boolean does not
            # round-trip the two pandas bridges identically (NULL-probe
            # find, r10).
            F.coalesce(
                F.array_contains(words, "spark"), F.lit(False)
            ).alias("has_spark"),
        )
        .orderBy("doc_id")
    )


# --- E27: JSON / map -------------------------------------------------------------
@query(
    "q31_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_,
           COALESCE(json_valid(props), FALSE) AS is_json
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
)
def q31_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json over the events.props JSON column.

    is_json is two-state by design: a NULL props row reads FALSE ("no
    valid payload") in BOTH engines — the oracle COALESCEs DuckDB's
    json_valid(NULL)=NULL to match from_json(NULL).isNotNull()=False.
    Chosen over NULL-in/NULL-out tri-state because a nullable boolean
    crosses the two pandas bridges differently (object None vs float
    NaN), which the canonical compare rightly refuses to conflate
    (NULL-probe find, r10)."""
    ev = table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    parsed = F.from_json("props", "k BIGINT")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            parsed.getField("k").alias("k_num"),
            F.get_json_object("props", "$.missing").alias("missing_"),
            F.from_json("props", "k BIGINT").isNotNull().alias("is_json"),
        )
        .orderBy("event_id")
    )


# --- E28: hashing ------------------------------------------------------------------
@query(
    "q32_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(lang || '|' || source) AS meta_sha,
           md5(concat_ws('|', CAST(doc_id AS VARCHAR), lang, source)) AS row_md5
    FROM documents
    ORDER BY doc_id
    """,
)
def q32_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / sha2-256 row-content hashing — the primitive behind E32
    verification fingerprints and E34 minhash permutations. Hex output is
    lowercase in both engines."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.sha2(F.concat(F.col("lang"), F.lit("|"), F.col("source")), 256).alias(
                "meta_sha"
            ),
            F.md5(
                F.concat_ws("|", F.col("doc_id").cast("string"), "lang", "source")
            ).alias("row_md5"),
        )
        .orderBy("doc_id")
    )
