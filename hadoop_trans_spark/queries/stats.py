"""Statistical-audit queries: Benford first-digit audit, daily-revenue
autocorrelation, rank-sum AUC, and a two-proportion A/B z-test (SURVEY
§2C extensions; no counterpart in the reference, which only migrates
partition bytes — TransTablePartition.java:46-80).

Shared determinism rules (see ``base.py``): every floating aggregate is
summed in DECIMAL(38,6+) before division, every double expression is
written with IDENTICAL operand order in Spark and DuckDB, and every
emitted double is rounded at 1e-6. Scale rules: each query is one or
two keyed hash aggregations; the only windows run over metadata-sized
tables (9 digits, O(days) daily series, O(distinct scores) score
groups) — nothing here sorts or windows the raw fact table globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..operators.globalrank import banded_cumsum
from .base import DEC, _dec_out, dterm, query


@query(
    "q195_benford_digits",
    # First significant digit extracted from the DECIMAL(18,2) string
    # form (identical text in both engines; log10-based extraction is
    # rejected because log10(10^k) may land an ulp below k). Expected
    # Benford frequency ln(1+1/d)/ln(10) and the chi-square term are
    # written with identical operand order, then rounded at 1e-6.
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS
                                VARCHAR), 1, 1) AS INT) AS digit
        -- Benford's domain: positive totals that fit DECIMAL(18,2);
        -- the upper bound also excludes inf/NaN symmetrically (r11).
        FROM orders
        WHERE o_totalprice >= 1.0 AND o_totalprice < 1e16
    ),
    obs AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed
        FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(observed) AS DOUBLE) AS n FROM obs)
    SELECT d.digit,
           COALESCE(o.observed, 0) AS observed,
           CAST(ROUND(LN(1.0 + 1.0 / d.digit) / LN(10.0), 6) AS DOUBLE)
               AS expected_freq,
           CAST(ROUND(
               POW(COALESCE(o.observed, 0)
                     - n * (LN(1.0 + 1.0 / d.digit) / LN(10.0)), 2)
                 / (n * (LN(1.0 + 1.0 / d.digit) / LN(10.0))), 6) AS DOUBLE)
               AS chi2_term
    FROM (SELECT UNNEST(range(1, 10)) AS digit) d
    LEFT JOIN obs o ON o.digit = d.digit CROSS JOIN tot
    ORDER BY d.digit
    """,
)
def q195_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed digit
    counts vs the expected log distribution, with per-digit chi-square
    contributions (a standard fraud/data-quality screen). One hash agg
    over orders projected to a single digit column, then a 9-row join
    against the static digit frame — at 100 TB the scan is
    column-pruned to o_totalprice and the post-agg work is O(9)."""
    digits = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_totalprice") >= 1.0)
            & (F.col("o_totalprice") < 1e16)
        )
        .select(
            F.substring(
                F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
    )
    obs = digits.groupBy("digit").agg(F.count("*").alias("observed"))
    all_digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    n = obs.agg(F.sum("observed").cast("double").alias("n"))
    exp_freq = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    return (
        all_digits.join(obs, "digit", "left")
        .withColumn("observed", F.coalesce("observed", F.lit(0)))
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            "observed",
            F.round(exp_freq, 6).cast("double").alias("expected_freq"),
            F.round(
                F.pow(F.col("observed") - F.col("n") * exp_freq, 2)
                / (F.col("n") * exp_freq),
                6,
            )
            .cast("double")
            .alias("chi2_term"),
        )
        .orderBy("digit")
    )


@query(
    "q196_daily_acf",
    # Daily revenues are decimal-summed then rounded (exactly
    # representable doubles), so the per-lag moment sums are exact
    # decimals in both engines; the final Pearson expression is one
    # double formula with identical operand order, rounded at 1e-6.
    oracle="""
    WITH daily AS (
        SELECT l_shipdate AS day,
               (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS rev
        FROM lineitem GROUP BY l_shipdate
        -- l_shipdate is date-valued (midnight timestamps), so grouping
        -- by the raw column equals grouping by day; the +INTERVAL join
        -- above matches Spark's date_add on the DATE-cast day.
    ),
    dd AS (SELECT * FROM daily WHERE ABS(rev) < 1000000000.0),
    pairs AS (
        -- Exact-moment domain on the daily series (see q232).
        SELECT l.lag, a.rev AS x, b.rev AS y
        FROM dd a
        CROSS JOIN (SELECT UNNEST(range(1, 8)) AS lag) l
        JOIN dd b ON b.day = a.day + CAST(l.lag AS INT) * INTERVAL 1 DAY
    ),
    m AS (
        SELECT lag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(x) THEN (x) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(x) THEN (x) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(x) THEN (x) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(x) THEN (x) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) AS DOUBLE) AS sx,
               CAST(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(y) THEN (y) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(y) THEN (y) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(y) THEN (y) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(y) THEN (y) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
                    AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)))
                    AS DOUBLE) AS syy
        FROM pairs GROUP BY lag
    )
    SELECT lag, n_pairs,
           CAST(ROUND((n * sxy - sx * sy)
                / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                AS DOUBLE) AS acf
    FROM m ORDER BY lag
    """,
)
def q196_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily revenue at calendar lags 1..7 days
    (weekly-seasonality screen). The raw fact table collapses to an
    O(days) daily series in one hash agg; the lag pairing is a
    broadcast-sized self-join of that series (calendar join, not row
    shift, so date gaps pair correctly). At 100 TB the fact-table agg
    dominates and everything after is metadata-sized."""
    li = table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").alias("day")).agg(
        _dec_out(F.sum(dterm("l_extendedprice", 6)), 6)
        .alias("rev")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    dd = daily.where(F.abs("rev") < 1e9)  # exact-moment domain (r11)
    a, b = dd.alias("a"), dd.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("b.day") == F.expr("date_add(a.day, lag)"),
        )
        .select("lag", F.col("a.rev").alias("x"), F.col("b.rev").alias("y"))
    )
    # Products at scale 6×6 → exact scale-12 decimals small enough that
    # neither engine's 38-digit cap truncates or overflows (DuckDB's
    # scale-adding multiply overflows hugeint at 12×12).
    d6 = "decimal(19,6)"
    m = pairs.groupBy("lag").agg(
        F.count("*").cast("double").alias("n"),
        F.count("*").alias("n_pairs"),
        F.sum(dterm("x", 6)).cast("double").alias("sx"),
        F.sum(dterm("y", 6)).cast("double").alias("sy"),
        F.sum(F.col("x").cast(d6) * F.col("y").cast(d6))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x").cast(d6) * F.col("x").cast(d6))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("y").cast(d6) * F.col("y").cast(d6))
        .cast("double")
        .alias("syy"),
    )
    return m.select(
        "lag",
        "n_pairs",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        )
        .cast("double")
        .alias("acf"),
    ).orderBy("lag")


@query(
    "q198_auc_rank",
    # Average ranks and the rank-sum are exact rationals at scale .5;
    # both sides compute them in DECIMAL(38,6) and only the final AUC
    # division produces a double, rounded at 1e-6.
    oracle="""
    WITH lab AS (
        SELECT n_chars AS score, CAST(lang = 'en' AS INT) AS y
        FROM documents
    ),
    grp AS (
        SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM lab GROUP BY score
    ),
    ranked AS (
        SELECT score, cnt, pos,
               COALESCE(SUM(cnt) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS below
        FROM grp
    ),
    agg AS (
        SELECT SUM(pos) AS npos, SUM(cnt - pos) AS nneg,
               SUM((CASE WHEN ABS((CASE WHEN ISFINITE(pos) THEN (pos) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(pos) THEN (pos) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(pos) THEN (pos) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(pos) THEN (pos) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)
                   * (CAST(below AS DECIMAL(38,6))
                      + (CAST(cnt AS DECIMAL(38,6)) + 1) / 2)) AS possum
        FROM ranked
    )
    SELECT CAST(npos AS BIGINT) AS npos,
           CAST(nneg AS BIGINT) AS nneg,
           CAST(ROUND(CAST(
               (possum - CAST(npos AS DECIMAL(38,6))
                           * (CAST(npos AS DECIMAL(38,6)) + 1) / 2)
               AS DOUBLE)
               / (CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)), 6) AS DOUBLE)
               AS auc
    FROM agg
    """,
)
def q198_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC of document length as a predictor of lang='en', via the
    Mann-Whitney rank-sum identity with midrank tie handling. The fact
    table collapses to per-score (cnt, pos) in one hash agg; the
    cumulative count over DISTINCT scores is band-decomposed
    (banded_cumsum, floor(score/1000) bands — never a global per-row
    rank of the corpus, and no single task sees the whole score
    histogram either). Rank sums stay exact decimals."""
    lab = table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    grp = lab.groupBy("score").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    ranked = banded_cumsum(
        grp,
        "score",
        F.floor(F.col("score") / 1000),
        {"below": "cnt"},
        exclusive=True,
    )
    agg = ranked.agg(
        F.sum("pos").alias("npos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("nneg"),
        F.sum(
            F.col("pos").cast(DEC)
            * (F.col("below").cast(DEC) + (F.col("cnt").cast(DEC) + 1) / 2)
        ).alias("possum"),
    )
    return agg.select(
        F.col("npos").cast("long").alias("npos"),
        F.col("nneg").cast("long").alias("nneg"),
        F.round(
            (
                F.col("possum")
                - F.col("npos").cast(DEC) * (F.col("npos").cast(DEC) + 1) / 2
            ).cast("double")
            / (F.col("npos").cast("double") * F.col("nneg").cast("double")),
            6,
        )
        .cast("double")
        .alias("auc"),
    )


@query(
    "q199_ab_ztest",
    # Variant assignment is a deterministic md5-hex-parity split on the
    # user id string (same md5 text in both engines); counts are exact
    # and the pooled z-score is one double formula with identical
    # operand order, rounded at 1e-6.
    oracle="""
    WITH assign AS (
        SELECT user_id,
               CASE WHEN strpos('02468ace',
                         substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) > 0
                    THEN 'A' ELSE 'B' END AS variant,
               CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 180.0
                             THEN 1 ELSE 0 END)
                    AS INT) AS converted
        FROM events GROUP BY user_id,
             CASE WHEN strpos('02468ace',
                       substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) > 0
                  THEN 'A' ELSE 'B' END
    ),
    v AS (
        SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(converted) AS BIGINT) AS conv
        FROM assign GROUP BY variant
    ),
    wide AS (
        SELECT MAX(CASE WHEN variant = 'A' THEN n END) AS n_a,
               MAX(CASE WHEN variant = 'A' THEN conv END) AS conv_a,
               MAX(CASE WHEN variant = 'B' THEN n END) AS n_b,
               MAX(CASE WHEN variant = 'B' THEN conv END) AS conv_b
        FROM v
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(ROUND(CASE WHEN se > 0 THEN
             (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / se END, 6) AS DOUBLE) AS z,
           CAST(CASE WHEN se > 0 THEN ABS(
             (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / se) > 1.959964 END AS INT) AS significant
    FROM (
        SELECT *,
               SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)) AS se
        FROM wide)
    """,
)
def q199_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B z-test on a deterministic hash split of users
    (md5-hex parity → variant; conversion = a 'purchase' event above the
    180.0 value threshold, a genuinely sparse outcome — every user has
    SOME purchase, which would give zero pooled variance). One hash agg
    per-user, one 2-row agg per-variant, then a scalar pooled z-score —
    the standard experiment readout. At 100 TB the per-user agg is the
    only shuffle; everything downstream is 2 rows. A zero standard
    error (degenerate all/none outcome) yields NULL z, not an error."""
    ev = table(spark, sf_dir, "events")
    variant = F.when(
        F.instr(
            F.lit("02468ace"),
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
        )
        > 0,
        "A",
    ).otherwise("B")
    assign = (
        ev.select(
            "user_id",
            variant.alias("variant"),
            (
                (F.col("event_type") == "purchase") & (F.col("value") > 180.0)
            )
            .cast("int")
            .alias("p"),
        )
        .groupBy("user_id", "variant")
        .agg(F.max("p").alias("converted"))
    )
    v = assign.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "A", F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "B", F.col("conv"))).alias("conv_b"),
    )
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    diff = (
        F.col("conv_a").cast("double") / F.col("n_a")
        - F.col("conv_b").cast("double") / F.col("n_b")
    )
    z = F.when(F.col("se") > 0, diff / F.col("se"))
    return wide.withColumn("se", se).select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(z, 6).cast("double").alias("z"),
        F.when(F.col("se") > 0, F.abs(z) > 1.959964)
        .cast("int")
        .alias("significant"),
    )


@query(
    "q214_mutual_information",
    # Cell counts are exact; each cell's PMI term is one double formula
    # in identical operand order, rounded at 1e-9 before the decimal
    # total so the 25-term MI sum is order-independent in both engines.
    oracle="""
    WITH j AS (
        SELECT o.o_orderpriority AS x, c.c_mktsegment AS y,
               CAST(COUNT(*) AS BIGINT) AS nxy
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY o.o_orderpriority, c.c_mktsegment
    ),
    m AS (
        SELECT x, y, nxy,
               SUM(nxy) OVER (PARTITION BY x) AS nx,
               SUM(nxy) OVER (PARTITION BY y) AS ny,
               SUM(nxy) OVER () AS n
        FROM j
    ),
    t AS (
        SELECT x, y, nxy,
               CAST(ROUND(LN((CAST(nxy AS DOUBLE) / n)
                             / ((CAST(nx AS DOUBLE) / n)
                                * (CAST(ny AS DOUBLE) / n))), 6) AS DOUBLE)
                   AS pmi,
               CAST(ROUND((CAST(nxy AS DOUBLE) / n)
                          * LN((CAST(nxy AS DOUBLE) / n)
                               / ((CAST(nx AS DOUBLE) / n)
                                  * (CAST(ny AS DOUBLE) / n))), 9)
                    AS DECIMAL(38,9)) AS term
        FROM m
    )
    SELECT x, y, nxy, pmi,
           CAST(ROUND(CAST(SUM(term) OVER () AS DOUBLE), 6) AS DOUBLE)
               AS mi_nats
    FROM t ORDER BY x, y
    """,
)
def q214_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between order priority and customer segment:
    the joint cell table (|priorities| × |segments| rows) with per-cell
    PMI and the corpus MI total — the dependence screen run before
    treating two categoricals as independent features. One fact join +
    one hash agg; every window runs over the 25-cell table, never raw
    rows. MI terms round at 1e-9 then decimal-sum (order-independent
    cross-engine total)."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("o_orderpriority").alias("x"),
            F.col("c_mktsegment").alias("y"),
        )
        .agg(F.count("*").alias("nxy"))
    )
    m = j.select(
        "x",
        "y",
        "nxy",
        F.sum("nxy").over(Window.partitionBy("x")).alias("nx"),
        F.sum("nxy").over(Window.partitionBy("y")).alias("ny"),
        F.sum("nxy").over(Window.partitionBy()).alias("n"),
    )
    pxy = F.col("nxy").cast("double") / F.col("n")
    ratio = pxy / (
        (F.col("nx").cast("double") / F.col("n"))
        * (F.col("ny").cast("double") / F.col("n"))
    )
    t = m.select(
        "x",
        "y",
        "nxy",
        F.round(F.log(ratio), 6).cast("double").alias("pmi"),
        F.round(pxy * F.log(ratio), 9).cast("decimal(38,9)").alias("term"),
    )
    return t.select(
        "x",
        "y",
        "nxy",
        "pmi",
        F.round(
            F.sum("term").over(Window.partitionBy()).cast("double"), 6
        )
        .cast("double")
        .alias("mi_nats"),
    ).orderBy("x", "y")


@query(
    "q216_equidepth_histogram",
    # Boundaries are percentile_disc-style (smallest value whose
    # cumulative count reaches ceil(j*n/10)) from exact integer
    # cumulative counts — the q206 pattern applied to histogram
    # construction; bucket populations difference the same cum table.
    oracle="""
    WITH vals AS (
        SELECT o_totalprice AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_totalprice
    ),
    cum AS (
        SELECT v, cnt,
               SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               SUM(cnt) OVER () AS n
        FROM vals
    ),
    b AS (
        SELECT j.j,
               MIN(CASE WHEN c >= CEIL(j.j * n / 10.0) THEN v END) AS hi
        FROM cum CROSS JOIN (SELECT UNNEST(range(1, 11)) AS j) j
        GROUP BY j.j
    ),
    counts AS (
        SELECT b.j, b.hi,
               (SELECT MAX(c) FROM cum WHERE cum.v <= b.hi) AS cum_hi
        FROM b
    )
    SELECT j, hi,
           CAST(cum_hi - COALESCE(LAG(cum_hi) OVER (ORDER BY j), 0)
                AS BIGINT) AS n_rows
    FROM counts ORDER BY j
    """,
)
def q216_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram of order totals — the
    boundary structure a cost-based optimizer keeps per column (q104 is
    the equi-WIDTH twin). Ten boundaries are read off the cumulative
    distinct-value histogram at ceil(j·n/10) (exact integer logic, no
    interpolated quantiles), and bucket populations are differences of
    the same cumulative table — so actual depths are visibly near-equal
    but exact, including duplicate-value pileups. The cumulative count
    runs over DISTINCT values only AND band-decomposed (banded_cumsum,
    floor(v/10000) bands): distinct near-continuous prices scale with
    the data, so even the distinct-value window must never be a single
    task; the grand total is a plain aggregate joined back as one
    broadcast row."""
    vals = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_totalprice").alias("v"))
        .agg(F.count("*").alias("cnt"))
    )
    cum = banded_cumsum(
        vals,
        "v",
        F.floor(F.col("v") / 10000),
        {"c": "cnt"},
        totals={"n": "c"},
    ).select("v", "c", "n")
    # r15 (guide §2.4/§5): TWO branches consume the cumulative table —
    # the boundary pick `b` and the boundary-population re-join `cum_at`
    # — and the non-equi join between them cannot reuse exchanges, so
    # the whole scan→histogram→banded-window subtree executed twice
    # (r14 driver plan: 2 orders scans, 16 Exchanges). Materialize it
    # once; both branches read the checkpoint (the q133/q178/q220
    # multi-consumer stage rule).
    from ..operators.stage import materialize_stage

    cum = materialize_stage(cum)
    js = spark.range(1, 11).select(F.col("id").cast("long").alias("j"))
    b = (
        cum.crossJoin(F.broadcast(js))
        .groupBy("j")
        .agg(
            F.min(
                F.when(
                    F.col("c") >= F.ceil(F.col("j") * F.col("n") / 10.0),
                    F.col("v"),
                )
            ).alias("hi")
        )
    )
    cum_at = (
        b.join(cum, cum.v <= b.hi, "left")
        .groupBy("j", "hi")
        .agg(F.max("c").alias("cum_hi"))
    )
    return cum_at.select(
        "j",
        "hi",
        (
            F.col("cum_hi")
            - F.coalesce(
                F.lag("cum_hi").over(Window.orderBy("j")), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_rows"),
    ).orderBy("j")


@query(
    "q228_psi_drift",
    # Bin populations are exact integers per period; shares and each
    # (p-q)·ln(p/q) term are double formulas in identical operand
    # order, terms rounded at 1e-9 and decimal-summed for the total.
    # Bins empty on either side contribute NULL terms and are excluded
    # from the total on BOTH sides (flagged in the output).
    oracle="""
    WITH binned AS (
        SELECT CAST(LEAST(FLOOR(o_totalprice / 30000), 19) AS BIGINT) AS bin,
               CAST(o_orderdate < TIMESTAMP '1996-01-01' AS INT) AS ref
        FROM orders
    ),
    h AS (
        SELECT bin,
               CAST(SUM(ref) AS BIGINT) AS n_ref,
               CAST(SUM(1 - ref) AS BIGINT) AS n_cur
        FROM binned GROUP BY bin
    ),
    s AS (
        SELECT bin, n_ref, n_cur,
               CAST(n_ref AS DOUBLE) / SUM(n_ref) OVER () AS p,
               CAST(n_cur AS DOUBLE) / SUM(n_cur) OVER () AS q
        FROM h
    ),
    t AS (
        SELECT bin, n_ref, n_cur,
               CAST(n_ref = 0 OR n_cur = 0 AS INT) AS degenerate,
               CASE WHEN n_ref > 0 AND n_cur > 0
                    THEN CAST(ROUND((p - q) * LN(p / q), 9)
                              AS DECIMAL(38,9)) END AS term
        FROM s
    )
    SELECT bin, n_ref, n_cur, degenerate,
           CAST(ROUND(CAST(SUM(term) OVER () AS DOUBLE), 6) AS DOUBLE)
               AS psi_total
    FROM t ORDER BY bin
    """,
)
def q228_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between pre-1996 (reference) and
    1996+ (current) order-total distributions — the standard
    model-monitoring drift gate (PSI < 0.1 stable, > 0.25 action).
    Fixed-width bins (q104's scheme) make bin populations pure integer
    arithmetic; the Σ(p−q)·ln(p/q) total decimal-sums 1e-9-rounded
    terms over the 20-bin table. One fact agg; everything after is
    O(bins). Bins empty on either side are flagged degenerate and
    excluded, not epsilon-fudged."""
    o = table(spark, sf_dir, "orders")
    binned = o.select(
        F.least(
            # explicit FLOOR: DuckDB's double->BIGINT cast rounds to
            # nearest, Spark's truncates — floor on both sides agrees
            F.floor(F.col("o_totalprice") / 30000).cast("long"), F.lit(19)
        ).alias("bin"),
        (F.col("o_orderdate") < "1996-01-01").cast("int").alias("ref"),
    )
    h = binned.groupBy("bin").agg(
        F.sum("ref").alias("n_ref"),
        F.sum(1 - F.col("ref")).alias("n_cur"),
    )
    w = Window.partitionBy()
    s = h.select(
        "bin",
        "n_ref",
        "n_cur",
        (F.col("n_ref").cast("double") / F.sum("n_ref").over(w)).alias("p"),
        (F.col("n_cur").cast("double") / F.sum("n_cur").over(w)).alias("q"),
    )
    t = s.select(
        "bin",
        "n_ref",
        "n_cur",
        ((F.col("n_ref") == 0) | (F.col("n_cur") == 0))
        .cast("int")
        .alias("degenerate"),
        F.when(
            (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
            F.round(
                (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 9
            ).cast("decimal(38,9)"),
        ).alias("term"),
    )
    return t.select(
        "bin",
        "n_ref",
        "n_cur",
        "degenerate",
        F.round(F.sum("term").over(w).cast("double"), 6)
        .cast("double")
        .alias("psi_total"),
    ).orderBy("bin")


@query(
    "q230_wilson_intervals",
    # Conversion counts are exact; the Wilson 95% bounds are one double
    # formula with identical operand order (z is the same literal both
    # sides), rounded at 1e-6.
    oracle="""
    WITH conv AS (
        SELECT c.c_nationkey AS nation,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey
    )
    SELECT nation, n, k,
           CAST(ROUND(CAST(k AS DOUBLE) / n, 6) AS DOUBLE) AS p_hat,
           CAST(ROUND(
             ((CAST(k AS DOUBLE) / n) + 1.959964 * 1.959964 / (2.0 * n)
              - 1.959964 * SQRT((CAST(k AS DOUBLE) / n)
                    * (1.0 - CAST(k AS DOUBLE) / n) / n
                    + 1.959964 * 1.959964 / (4.0 * n * n)))
             / (1.0 + 1.959964 * 1.959964 / n), 6) AS DOUBLE) AS wilson_lo,
           CAST(ROUND(
             ((CAST(k AS DOUBLE) / n) + 1.959964 * 1.959964 / (2.0 * n)
              + 1.959964 * SQRT((CAST(k AS DOUBLE) / n)
                    * (1.0 - CAST(k AS DOUBLE) / n) / n
                    + 1.959964 * 1.959964 / (4.0 * n * n)))
             / (1.0 + 1.959964 * 1.959964 / n), 6) AS DOUBLE) AS wilson_hi
    FROM conv ORDER BY nation
    """,
)
def q230_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation rate estimation with Wilson 95% score intervals (the
    interval that stays sane at small n and extreme p, unlike the Wald
    ±z√(pq/n) taught first): share of fulfilled ('F') orders per
    customer nation with lower/upper bounds — the uncertainty-aware
    readout a dashboard should show instead of bare rates (q199's
    z-test is the two-sample twin). One fact join + one hash agg; the
    interval math is O(|nations|)."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    conv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("o_orderstatus") == "F").cast("int")).alias("k"),
        )
    )
    z = F.lit(1.959964)
    p = F.col("k").cast("double") / F.col("n")
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / F.col("n")
        + z * z / (F.lit(4.0) * F.col("n") * F.col("n"))
    )
    center = p + z * z / (F.lit(2.0) * F.col("n"))
    denom = F.lit(1.0) + z * z / F.col("n")
    return conv.select(
        "nation",
        "n",
        "k",
        F.round(p, 6).cast("double").alias("p_hat"),
        F.round((center - half) / denom, 6).cast("double").alias("wilson_lo"),
        F.round((center + half) / denom, 6).cast("double").alias("wilson_hi"),
    ).orderBy("nation")


@query(
    "q231_audience_jaccard",
    # Pure integer set algebra: per-user type flags, pairwise
    # intersection counts, |A∪B| = |A|+|B|−|A∩B|; one double division
    # rounded at 1e-6.
    oracle="""
    WITH flags AS (
        SELECT user_id, event_type
        FROM events GROUP BY user_id, event_type
    ),
    sizes AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM flags GROUP BY event_type
    ),
    inter AS (
        SELECT a.event_type AS ta, b.event_type AS tb,
               CAST(COUNT(*) AS BIGINT) AS nab
        FROM flags a JOIN flags b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT i.ta, i.tb, sa.n AS n_a, sb.n AS n_b, i.nab,
           CAST(ROUND(CAST(i.nab AS DOUBLE) / (sa.n + sb.n - i.nab), 6)
                AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.ta
    JOIN sizes sb ON sb.event_type = i.tb
    ORDER BY i.ta, i.tb
    """,
)
def q231_audience_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise Jaccard similarity of event-type audiences (which
    behaviors share users?) — the EXACT small-cardinality counterpart
    of the q192 HLL overlap and the q39/q40 document-level dedup
    Jaccards. Distinct (user, type) flags come from one hash agg; the
    pairwise intersection is a self-join keyed on user_id whose fan-out
    is bounded by types-per-user squared (≤ 25); unions come free from
    the inclusion-exclusion identity, no second pass."""
    e = table(spark, sf_dir, "events")
    flags = e.select("user_id", "event_type").distinct()
    sizes = flags.groupBy("event_type").agg(F.count("*").alias("n"))
    a, b = flags.alias("a"), flags.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
        .agg(F.count("*").alias("nab"))
    )
    sa = sizes.select(F.col("event_type").alias("ta"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("tb"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .select(
            "ta",
            "tb",
            "n_a",
            "n_b",
            "nab",
            F.round(
                F.col("nab").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("nab")),
                6,
            )
            .cast("double")
            .alias("jaccard"),
        )
        .orderBy("ta", "tb")
    )


@query(
    "q232_gini_spend",
    # Gini from the spend-value histogram: all cumulative quantities
    # are exact decimals/integers (spend is decimal-rounded), and only
    # the final ratio is a double, rounded at 1e-6. The trapezoid
    # identity G = 1 - Σ c_v·(S_prev + S_cur)/(N·S_total) needs no
    # per-row ranks.
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS v
        FROM orders GROUP BY o_custkey
    ),
    hist AS (
        -- Exact-moment domain: per-customer spend beyond |v| < 1e9
        -- leaves the DECIMAL(19,6) product envelope; excluded
        -- symmetrically, like non-finite (r11 money probe).
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c
        FROM spend WHERE ABS(v) < 1000000000.0 GROUP BY v
    ),
    cum AS (
        SELECT v, c,
               SUM(c) OVER w AS cn,
               SUM(CAST(v AS DECIMAL(19,6)) * c) OVER w AS cs,
               SUM(c) OVER () AS n,
               SUM(CAST(v AS DECIMAL(19,6)) * c) OVER () AS s
        FROM hist
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(ROUND(CAST(MAX(s) AS DOUBLE), 6) AS DOUBLE) AS total_spend,
           CAST(ROUND(1.0 - CAST(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(c) THEN (c) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(c) THEN (c) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(c) THEN (c) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(c) THEN (c) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)
                     * (CAST(cs AS DECIMAL(38,6)) * 2
                        - CAST(v AS DECIMAL(19,6)) * c)) AS DOUBLE)
                / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(s) AS DOUBLE)), 6)
                AS DOUBLE) AS gini
    FROM cum
    """,
)
def q232_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend (inequality of revenue
    concentration — the scalar twin of q165's share table and q182's
    lift curve). Computed from the DISTINCT-spend histogram with the
    trapezoid identity: cumulative counts and decimal spend sums give
    G without ranking individual customers; the distinct-spend
    cumulatives are band-decomposed (banded_cumsum, floor(v/10000)
    bands — distinct spends scale with the customer count, so no
    single task may see them all) and the totals are a plain aggregate
    broadcast back. Exact decimal staging end-to-end (banding
    re-associates only exact long/decimal sums); one double division
    at the finish."""
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        _dec_out(F.sum(dterm("o_totalprice", 6)), 6)
        .alias("v")
    )
    d6 = "decimal(19,6)"
    hist = (
        spend.where(F.abs("v") < 1e9)  # exact-moment domain (r11)
        .groupBy("v")
        .agg(F.count("*").alias("c"))
        .withColumn("vs", F.col("v").cast(d6) * F.col("c"))
    )
    cum = banded_cumsum(
        hist,
        "v",
        F.floor(F.col("v") / 10000),
        {"cn": "c", "cs": "vs"},
        totals={"n": "cn", "s": "cs"},
    )
    return cum.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.round(F.max("s").cast("double"), 6)
        .cast("double")
        .alias("total_spend"),
        F.round(
            F.lit(1.0)
            - F.sum(
                F.col("c").cast(DEC)
                * (
                    F.col("cs").cast(DEC) * 2
                    - F.col("v").cast(d6) * F.col("c")
                )
            ).cast("double")
            / (F.max("n").cast("double") * F.max("s").cast("double")),
            6,
        )
        .cast("double")
        .alias("gini"),
    )


@query(
    "q233_ks_test",
    # The KS statistic is a max over |cn_a/n_a − cn_b/n_b| at merged
    # distinct values — cumulative counts are exact integers and each
    # difference is one double formula in identical operand order; D
    # and the decision round/compare at 1e-6. The 1.358·√((n+m)/nm)
    # 95% threshold uses the same literals both sides.
    oracle="""
    WITH v AS (
        SELECT o_totalprice AS x,
               CAST(o_orderdate < TIMESTAMP '1996-01-01' AS INT) AS grp
        FROM orders
    ),
    h AS (
        SELECT x,
               CAST(SUM(grp) AS BIGINT) AS ca,
               CAST(SUM(1 - grp) AS BIGINT) AS cb
        FROM v GROUP BY x
    ),
    cum AS (
        SELECT SUM(ca) OVER w AS cna, SUM(cb) OVER w AS cnb,
               SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
        FROM h
        WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT CAST(MAX(na) AS BIGINT) AS n_ref,
           CAST(MAX(nb) AS BIGINT) AS n_cur,
           CAST(ROUND(MAX(ABS(CAST(cna AS DOUBLE) / na
                               - CAST(cnb AS DOUBLE) / nb)), 6) AS DOUBLE)
               AS ks_d,
           CAST(ROUND(1.358 * SQRT((CAST(MAX(na) AS DOUBLE) + MAX(nb))
                      / (CAST(MAX(na) AS DOUBLE) * MAX(nb))), 6) AS DOUBLE)
               AS d_crit_95,
           CAST(MAX(ABS(CAST(cna AS DOUBLE) / na
                        - CAST(cnb AS DOUBLE) / nb))
                > 1.358 * SQRT((CAST(MAX(na) AS DOUBLE) + MAX(nb))
                               / (CAST(MAX(na) AS DOUBLE) * MAX(nb)))
                AS INT) AS reject_same_dist
    FROM cum
    """,
)
def q233_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between pre-1996 and 1996+
    order totals — the nonparametric companion to q228's PSI (no
    binning choice to defend): D = max |ECDF_ref − ECDF_cur| evaluated
    at merged distinct values via cumulative integer counts, plus the
    large-sample 95% critical value. The cumulatives run over the
    DISTINCT-value histogram, band-decomposed (banded_cumsum,
    floor(x/10000) bands — distinct prices scale with the data); the
    ECDF never materializes per row. One fact agg → O(distinct
    prices, partitioned) → 1 row."""
    v = table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"),
        (F.col("o_orderdate") < "1996-01-01").cast("int").alias("grp"),
    )
    h = v.groupBy("x").agg(
        F.sum("grp").alias("ca"),
        F.sum(1 - F.col("grp")).alias("cb"),
    )
    cum = banded_cumsum(
        h,
        "x",
        F.floor(F.col("x") / 10000),
        {"cna": "ca", "cnb": "cb"},
        totals={"na": "cna", "nb": "cnb"},
    ).select("cna", "cnb", "na", "nb")
    diff = F.abs(
        F.col("cna").cast("double") / F.col("na")
        - F.col("cnb").cast("double") / F.col("nb")
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.max("na").cast("double") + F.max("nb"))
        / (F.max("na").cast("double") * F.max("nb"))
    )
    return cum.agg(
        F.max("na").cast("long").alias("n_ref"),
        F.max("nb").cast("long").alias("n_cur"),
        F.round(F.max(diff), 6).cast("double").alias("ks_d"),
        F.round(crit, 6).cast("double").alias("d_crit_95"),
        (F.max(diff) > crit).cast("int").alias("reject_same_dist"),
    )


@query(
    "q234_rank_movers",
    # Weekly revenues are decimal-rounded; ranks break ties on the
    # brand key, so both engines produce identical orderings; the top
    # movers cut sorts on (|Δrank| DESC, brand) — fully deterministic.
    oracle="""
    WITH rev AS (
        SELECT p.p_brand AS brand,
               CAST(l.l_shipdate >= TIMESTAMP '1996-01-01' AS INT) AS cur,
               (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l.l_extendedprice) THEN (l.l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS rev
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, CAST(l.l_shipdate >= TIMESTAMP '1996-01-01'
                                 AS INT)
    ),
    ranked AS (
        SELECT brand, cur, rev,
               ROW_NUMBER() OVER (PARTITION BY cur
                                  ORDER BY rev DESC, brand) AS rk
        FROM rev
    )
    SELECT a.brand,
           a.rk AS rank_before, b.rk AS rank_after,
           CAST(a.rk - b.rk AS BIGINT) AS delta
    FROM ranked a JOIN ranked b
      ON a.brand = b.brand AND a.cur = 0 AND b.cur = 1
    ORDER BY ABS(a.rk - b.rk) DESC, a.brand LIMIT 10
    """,
)
def q234_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Biggest rank movers: brand revenue ranks before vs after the
    1996 boundary, top-10 by absolute rank swing — the trend-detection
    report behind 'what's rising'. Ranks are windows PARTITIONED BY
    period over the O(|brands|) revenue aggregate (never raw lineitem),
    tie-broken on the brand key so the movers cut is deterministic;
    the before/after join is brand-keyed on a broadcast-sized table."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            (F.col("l_shipdate") >= "1996-01-01").cast("int").alias("cur"),
        )
        .agg(
            _dec_out(F.sum(dterm("l_extendedprice", 6)), 6)
            .alias("rev")
        )
    )
    ranked = rev.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("cur").orderBy(F.col("rev").desc(), "brand")
        ),
    )
    a = ranked.where(F.col("cur") == 0).select(
        "brand", F.col("rk").alias("rank_before")
    )
    b = ranked.where(F.col("cur") == 1).select(
        "brand", F.col("rk").alias("rank_after")
    )
    return (
        a.join(b, "brand")
        .select(
            "brand",
            "rank_before",
            "rank_after",
            (F.col("rank_before") - F.col("rank_after"))
            .cast("long")
            .alias("delta"),
        )
        .orderBy(F.abs(F.col("delta")).desc(), "brand")
        .limit(10)
    )


@query(
    "q236_runs_test",
    # Signs come from comparing each day's decimal-rounded revenue to
    # the discrete median (percentile_disc off the cum histogram —
    # exact); runs count via an ordered lag over O(days); the z-score
    # is one double formula in identical operand order, rounded 1e-6.
    oracle="""
    WITH daily AS (
        SELECT l_shipdate AS day,
               (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(l_extendedprice) THEN (l_extendedprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS rev
        FROM lineitem GROUP BY l_shipdate
    ),
    med AS (
        SELECT MIN(CASE WHEN c >= CEIL(0.5 * n) THEN rev END) AS m
        FROM (SELECT rev,
                     SUM(1) OVER (ORDER BY rev ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND CURRENT ROW) AS c,
                     COUNT(*) OVER () AS n
              FROM daily)
    ),
    signs AS (
        SELECT day, CAST(rev > med.m AS INT) AS s
        FROM daily CROSS JOIN med WHERE rev <> med.m
    ),
    runs AS (
        SELECT s,
               CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                         OR LAG(s) OVER (ORDER BY day) <> s
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    )
    SELECT CAST(SUM(new_run) AS BIGINT) AS n_runs,
           CAST(SUM(s) AS BIGINT) AS n_above,
           CAST(SUM(1 - s) AS BIGINT) AS n_below,
           CAST(ROUND(
             (SUM(new_run)
              - (2.0 * SUM(s) * SUM(1 - s) / (SUM(s) + SUM(1 - s)) + 1.0))
             / SQRT(2.0 * SUM(s) * SUM(1 - s)
                    * (2.0 * SUM(s) * SUM(1 - s) - SUM(s) - SUM(1 - s))
                    / ((SUM(s) + SUM(1 - s)) * (SUM(s) + SUM(1 - s))
                       * (SUM(s) + SUM(1 - s) - 1.0))), 6) AS DOUBLE) AS z
    FROM runs
    """,
)
def q236_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue: is the above/below-
    median sign sequence random, or does it trend/cluster? (The
    randomness screen behind q177's CUSUM — too few runs means regime
    persistence.) Median is discrete off the cumulative day histogram;
    the sign sequence and run boundaries live in one ordered window
    over O(days); the normal-approximation z uses exact run/sign
    counts. Fact table → daily agg → metadata-sized everything."""
    li = table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").alias("day")).agg(
        _dec_out(F.sum(dterm("l_extendedprice", 6)), 6)
        .alias("rev")
    )
    wc = Window.orderBy("rev").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wa = Window.partitionBy()
    med = (
        daily.select(
            "rev",
            F.sum(F.lit(1)).over(wc).alias("c"),
            F.count("*").over(wa).alias("n"),
        )
        .agg(
            F.min(
                F.when(
                    F.col("c") >= F.ceil(0.5 * F.col("n")), F.col("rev")
                )
            ).alias("m")
        )
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("rev") != F.col("m"))
        .select("day", (F.col("rev") > F.col("m")).cast("int").alias("s"))
    )
    lag_s = F.lag("s").over(Window.orderBy("day"))
    runs = signs.select(
        "s",
        F.when(lag_s.isNull() | (lag_s != F.col("s")), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    r = F.sum("new_run").cast("double")
    na = F.sum("s").cast("double")
    nb = F.sum(1 - F.col("s")).cast("double")
    expected = 2.0 * na * nb / (na + nb) + 1.0
    var = (
        2.0
        * na
        * nb
        * (2.0 * na * nb - na - nb)
        / ((na + nb) * (na + nb) * (na + nb - 1.0))
    )
    return runs.agg(
        F.sum("new_run").cast("long").alias("n_runs"),
        F.sum("s").cast("long").alias("n_above"),
        F.sum(1 - F.col("s")).cast("long").alias("n_below"),
        F.round((r - expected) / F.sqrt(var), 6)
        .cast("double")
        .alias("z"),
    )


@query(
    "q240_lorenz_curve",
    # Decile boundaries come from the cumulative spend histogram
    # (exact integers); cumulative spend by decile stages in DECIMAL
    # and only the share ratio is a double, rounded at 1e-6.
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END))) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(o_totalprice) THEN (o_totalprice) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)), 0) AS DECIMAL(38,0)) AS DOUBLE) END) AS v
        FROM orders GROUP BY o_custkey
    ),
    hist AS (
        -- Exact-moment domain (see q232): |v| < 1e9.
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
               SUM(CAST(v AS DECIMAL(19,6))) AS s
        FROM spend WHERE ABS(v) < 1000000000.0 GROUP BY v
    ),
    cum AS (
        SELECT v, c, s,
               SUM(c) OVER w AS cn,
               SUM(s) OVER w AS cs,
               SUM(c) OVER () AS n,
               SUM(s) OVER () AS st
        FROM hist
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT d.d AS decile,
           MIN(CASE WHEN cn >= CEIL(d.d * n / 10.0) THEN v END) AS cutoff,
           CAST(ROUND(CAST(MIN(CASE WHEN cn >= CEIL(d.d * n / 10.0)
                                    THEN cs END) AS DOUBLE)
                      / CAST(MAX(st) AS DOUBLE), 6) AS DOUBLE)
               AS cum_spend_share
    FROM cum CROSS JOIN (SELECT UNNEST(range(1, 11)) AS d) d
    GROUP BY d.d ORDER BY d.d
    """,
)
def q240_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve at customer-spend deciles: the cumulative share of
    revenue held by the bottom d/10 of customers — the curve whose gap
    from the diagonal q232's Gini summarizes (and the 'bottom 50% hold
    X%' numbers analysts actually quote). Boundaries and cumulative
    spend both read off the DISTINCT-spend histogram (the repo's
    percentile_disc pattern carrying a decimal spend accumulator),
    band-decomposed via banded_cumsum (floor(v/10000) bands) so no
    single task sees the full histogram; nothing ranks individual
    customers."""
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        _dec_out(F.sum(dterm("o_totalprice", 6)), 6)
        .alias("v")
    )
    d6 = "decimal(19,6)"
    hist = (
        spend.where(F.abs("v") < 1e9)  # exact-moment domain (r11)
        .groupBy("v")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("v").cast(d6)).alias("s"),
        )
    )
    cum = banded_cumsum(
        hist,
        "v",
        F.floor(F.col("v") / 10000),
        {"cn": "c", "cs": "s"},
        totals={"n": "cn", "st": "cs"},
    ).select("v", "cn", "cs", "n", "st")
    ds = spark.range(1, 11).select(F.col("id").cast("long").alias("decile"))
    at_cut = F.when(
        F.col("cn") >= F.ceil(F.col("decile") * F.col("n") / 10.0), F.col("v")
    )
    cs_cut = F.when(
        F.col("cn") >= F.ceil(F.col("decile") * F.col("n") / 10.0),
        F.col("cs"),
    )
    return (
        cum.crossJoin(F.broadcast(ds))
        .groupBy("decile")
        .agg(
            F.min(at_cut).alias("cutoff"),
            F.round(
                F.min(cs_cut).cast("double") / F.max("st").cast("double"), 6
            )
            .cast("double")
            .alias("cum_spend_share"),
        )
        .orderBy("decile")
    )


@query(
    "q241_odds_ratio",
    # The 2x2 cell counts are exact (exposure uses the discrete median
    # from the cum histogram); OR and its log-space Wald CI are one
    # double formula each in identical operand order, rounded at 1e-6.
    oracle="""
    WITH med AS (
        SELECT MIN(CASE WHEN c >= CEIL(0.5 * n) THEN v END) AS m
        FROM (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) AS c,
                     SUM(cnt) OVER () AS n
              FROM (SELECT c_acctbal AS v, COUNT(*) AS cnt
                    FROM customer GROUP BY c_acctbal))
    ),
    base AS (
        SELECT c.c_custkey,
               CAST(c.c_acctbal > med.m AS INT) AS exposed,
               CAST(MAX(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS INT) AS outcome
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        CROSS JOIN med
        GROUP BY c.c_custkey, CAST(c.c_acctbal > med.m AS INT)
    ),
    cells AS (
        SELECT CAST(SUM(exposed * outcome) AS BIGINT) AS a,
               CAST(SUM(exposed * (1 - outcome)) AS BIGINT) AS b,
               CAST(SUM((1 - exposed) * outcome) AS BIGINT) AS c,
               CAST(SUM((1 - exposed) * (1 - outcome)) AS BIGINT) AS d
        FROM base
    )
    SELECT a, b, c, d,
           CAST(ROUND((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c), 6)
                AS DOUBLE) AS odds_ratio,
           CAST(ROUND(EXP(LN((CAST(a AS DOUBLE) * d)
                             / (CAST(b AS DOUBLE) * c))
                          - 1.959964 * SQRT(1.0 / a + 1.0 / b
                                            + 1.0 / c + 1.0 / d)), 6)
                AS DOUBLE) AS or_lo,
           CAST(ROUND(EXP(LN((CAST(a AS DOUBLE) * d)
                             / (CAST(b AS DOUBLE) * c))
                          + 1.959964 * SQRT(1.0 / a + 1.0 / b
                                            + 1.0 / c + 1.0 / d)), 6)
                AS DOUBLE) AS or_hi
    FROM cells
    """,
)
def q241_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 odds ratio with a log-space Wald 95% CI: does an
    above-median account balance associate with having a fulfilled
    order? (Completes the inference toolkit next to q199's z-test,
    q230's Wilson bounds, and q233's KS.) The exposure cut is the
    discrete median off the cumulative balance histogram (banded_cumsum
    over floor(v/500) bands — the balance domain is fixed but the
    distinct-value pileup still never funnels one task); one customer-
    keyed outcome agg builds the 2×2 table; the OR math is O(1). The
    CI uses exp/ln only on scalar cell counts — a 1-row computation,
    not a data-path libm dependence."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("v")
    )
    bal = cust.groupBy("v").agg(F.count("*").alias("cnt"))
    med = banded_cumsum(
        bal,
        "v",
        F.floor(F.col("v") / 500),
        {"c": "cnt"},
        totals={"n": "c"},
    ).agg(
        F.min(
            F.when(F.col("c") >= F.ceil(0.5 * F.col("n")), F.col("v"))
        ).alias("m")
    )
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    base = (
        cust.crossJoin(F.broadcast(med))
        .join(o, cust.c_custkey == o.o_custkey)
        .groupBy(
            "c_custkey", (F.col("v") > F.col("m")).cast("int").alias("exposed")
        )
        .agg(
            F.max((F.col("o_orderstatus") == "F").cast("int")).alias(
                "outcome"
            )
        )
    )
    cells = base.agg(
        F.sum(F.col("exposed") * F.col("outcome")).cast("long").alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("outcome")))
        .cast("long")
        .alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("outcome"))
        .cast("long")
        .alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("outcome")))
        .cast("long")
        .alias("d"),
    )
    orr = (F.col("a").cast("double") * F.col("d")) / (
        F.col("b").cast("double") * F.col("c")
    )
    half = F.lit(1.959964) * F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orr, 6).cast("double").alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - half), 6).cast("double").alias("or_lo"),
        F.round(F.exp(F.log(orr) + half), 6).cast("double").alias("or_hi"),
    )
