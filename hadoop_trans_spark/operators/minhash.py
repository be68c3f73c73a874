"""MinHash + LSH near-duplicate detection (E34).

Classic pipeline (Broder '97 minhash; LSH banding per Leskovec/Rajaraman/
Ullman "Mining of Massive Datasets" ch. 3), expressed entirely in
DataFrame ops so Catalyst plans it:

  shingle (word k-grams, JVM higher-order fns)
    → per-(doc, seed) min of md5(seed || shingle)      [groupBy agg]
    → band signatures (md5 over r consecutive minhashes)
    → candidate pairs: self-equi-join on (band, signature)
    → exact Jaccard verification on the shingle sets    [equi-joins]

Hash-family note: the "permutation" for seed j is the lexicographic order
of md5(j || shingle) hex strings. String-min is engine-portable (DuckDB
reproduces it exactly — no 64-bit integer hash parity issues), and a
uniform hash's hex order is as good a random permutation as its integer
order.

Scale: every step is an equi-shuffle on doc_id / band signature. The
band join's fan-out is bounded by bucket sizes; hot buckets (boilerplate
docs) are the classic skew risk — AQE skew-join handles moderate cases,
and `max_bucket` drops degenerate buckets explicitly (logged), the same
guardrail production dedup pipelines use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct word k-gram shingles per doc: (id, shingle)."""
    ws = F.split(F.col(text_col), " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(ws) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(ws, i, k)),
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle")
    )


def minhash_signatures(shingles: DataFrame, n_hashes: int = 12) -> DataFrame:
    """(id, seed, minhash): per-seed min over md5(seed:shingle)."""
    seeded = shingles.select(
        "id",
        "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed"),
    )
    h = F.md5(F.concat_ws(":", F.col("seed").cast("string"), F.col("shingle")))
    return (
        seeded.withColumn("h", h)
        .groupBy("id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def band_signatures(sigs: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(id, band, band_sig): md5 over the band's minhashes in seed order."""
    r = n_hashes // bands
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
        lambda s: s.getField("minhash"),
    )
    return (
        sigs.withColumn("band", (F.col("seed") / r).cast("int"))
        .groupBy("id", "band")
        .agg(F.md5(F.array_join(ordered, ",")).alias("band_sig"))
    )


def candidate_pairs(bands_df: DataFrame, max_bucket: int = 1000) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any band signature.

    Buckets larger than ``max_bucket`` are dropped (degenerate boilerplate
    protection — quadratic fan-out guard at scale)."""
    sized = bands_df.withColumn(
        "bucket_n", F.count("*").over(W.partitionBy("band", "band_sig"))
    ).where(F.col("bucket_n") <= max_bucket)
    a = sized.select("band", "band_sig", F.col("id").alias("id_a"))
    b = sized.select("band", "band_sig", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(shingles: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs: |A∩B| / (|A|+|B|−|A∩B|)."""
    sizes = shingles.groupBy("id").agg(F.count("*").alias("n"))
    sa = shingles.select(F.col("id").alias("id_a"), "shingle")
    sb = shingles.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        sa.join(pairs, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnsRenamed({"id": "id_a", "n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "n_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end: shingle → minhash → LSH candidates → verified pairs
    with Jaccard ≥ threshold. Returns (id_a, id_b, jaccard)."""
    sh = word_shingles(df, id_col, text_col, shingle_k)
    sigs = minhash_signatures(sh, n_hashes)
    bandsig = band_signatures(sigs, n_hashes, bands)
    cand = candidate_pairs(bandsig)
    return jaccard_verify(sh, cand).where(F.col("jaccard") >= threshold)


def dedup_keep_canonical(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop the higher id of every verified near-dup pair (canonical =
    lowest id — a deterministic, order-free rule; full transitive-closure
    clustering is an iterative algorithm noted in SCALE.md)."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
