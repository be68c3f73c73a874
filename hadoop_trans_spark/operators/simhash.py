"""SimHash near-duplicate fingerprints (E34; Charikar '02).

Per document: each distinct feature votes ±1 on every bit of a b-bit
fingerprint (vote = parity of a hex digit of md5(feature)); bit = 1
where the vote sum is positive. Near-duplicates have small Hamming
distance.

Features are word 3-gram shingles, not unigram tokens: documents drawn
from a shared vocabulary have near-identical unigram SETS (SimHash sees
the set, not counts), which collapses fingerprints corpus-wide; shingle
sets differ wherever word order does, so random pairs sit near Hamming
b/2 while true near-dups stay ≤3. b=64 from TWO md5 parity masks
(digit b of md5(tok) votes bit b; digit b of md5('s2:'||tok) votes bit
32+b) — deliberately every step (md5, hex-digit parity, sum, bit
assembly) is reproducible in ANSI SQL, so the DuckDB oracle runs the
identical pipeline. b was 32 through r12; the r13 pair-growth audit
(tools/pair_growth.py) measured the pigeonhole blocks degenerating —
32/4 = 8-bit segments give only 256 buckets per segment, so candidate
pairs grew ~n²/256 (61× pairs at 8× docs). 16-bit segments put the
same corpus across 65 536 buckets per segment. At 100 TB the explode
factor is |shingles|×64, all map-side; the only shuffle is the final
groupBy(doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .minhash import shingle_array
from .stage import materialize_stage

HEX = "0123456789abcdef"
N_BITS = 64
# bit 63's addend: two's-complement sign bit of the bigint fingerprint
# (1 << 63 overflows LongType; both engines assemble it as this value)
SIGN_BIT = -(2**63)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) with a 64-bit fingerprint as bigint (bit 63 is the
    sign bit — xor/bit_count are bit-pattern ops, sign-agnostic).

    Physical shape: one row per (doc, shingle). Each md5 digest folds
    into TWO 32-bit PARITY MASKS in one projection (translate
    hex→parity chars, conv base-2; the second digest salts the token),
    then a single codegen'd hash aggregation sums the 64 bit positions; the fingerprint assembles from the counts
    (vote sum for bit b = 2·ones_b − n). Equivalent-but-slow shapes,
    measured at sf0.1: explode (shingle × bit) rows → 10s (32× the
    shuffle rows); nested higher-order lambdas → 100s (interpreted
    per-element eval). This one: ~1.5-4s depending on session pressure
    (bench times it inside a 132-query shared session; best-of-2 in a
    warm session ≈ 3s, dominated by md5 over shingles). At 100 TB the
    shuffle carries only the per-doc partial count vectors (map-side
    combine)."""
    parity = "".join("01"[int(c, 16) % 2] for c in HEX)  # digit → parity
    # NULL-text docs get no fingerprint (word_shingles rule: contentless
    # docs are excluded from content dedup — NULL-probe find, r10).
    df = df.where(F.col(text_col).isNotNull())
    masks = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_array(F.lower(F.col(text_col)), k=3)).alias("tok"),
    ).select(
        "id",
        F.conv(
            F.translate(F.md5("tok"), HEX, parity), 2, 10
        ).cast("bigint").alias("m0"),
        F.conv(
            F.translate(
                F.md5(F.concat(F.lit("s2:"), F.col("tok"))), HEX, parity
            ),
            2,
            10,
        ).cast("bigint").alias("m1"),
    )
    # Digest digit b (1-based char b+1) of mask k is bit (31-b) of m{k};
    # fingerprint bit b takes digit b of m0 (b < 32) / digit b-32 of m1.
    counts = masks.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.expr(f"(m{b // 32} >> {31 - (b % 32)}) & 1")
            ).alias(f"s{b}")
            for b in range(N_BITS)
        ],
    )
    fingerprint = sum(
        F.when(
            2 * F.col(f"s{b}") - F.col("n") > 0,
            F.lit(SIGN_BIT if b == 63 else 1 << b),
        ).otherwise(F.lit(0))
        for b in range(N_BITS)
    ).cast("bigint")
    return counts.select("id", fingerprint.alias("simhash"))


def hamming_pairs(
    sim: DataFrame, max_distance: int = 3, max_bucket: int = 1000
) -> DataFrame:
    """(id_a, id_b, hamming) for pairs within the distance budget.

    Local/small-N path is a self-join + bit_count(xor). At scale, block
    first: split the fingerprint into (max_distance+1) segments — by
    pigeonhole, any pair within the budget shares at least one exact
    segment — and equi-join on (segment_idx, segment_value) like LSH
    banding. Implemented with the segment blocking so the plan is the
    scale plan.

    ``max_bucket`` drops segment buckets past the cap before the
    quadratic self-join (the minhash candidate_pairs guard, r13): a
    fingerprint segment shared by a boilerplate-heavy cluster is the
    simhash twin of a hot LSH band, and one such bucket is a C(k,2)
    blow-up. Recall caveat applies only inside dropped buckets —
    everything there is mutually near-identical, exactly the mass a
    dedup job caps everywhere else too."""
    n_seg = max_distance + 1
    seg_bits = N_BITS // n_seg
    # Materialize the (id, simhash) table once: the self-join would
    # otherwise recompute the fingerprint expression — ~10⁴ hash-digit
    # ops per doc — per branch per segment (AQE defeats ReuseExchange
    # here). The checkpointed table is 16 bytes/doc on executor storage.
    sim = materialize_stage(sim)
    segs = sim.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_seg - 1))).alias("seg"),
    ).withColumn(
        "seg_val",
        F.expr(
            f"shiftrightunsigned(simhash, seg * {seg_bits}) & {(1 << seg_bits) - 1}"
        ),
    )
    segs = segs.withColumn(
        "bucket_n", F.count("*").over(W.partitionBy("seg", "seg_val"))
    ).where(F.col("bucket_n") <= max_bucket)
    a = segs.select("seg", "seg_val", F.col("id").alias("id_a"), F.col("simhash").alias("h_a"))
    b = segs.select("seg", "seg_val", F.col("id").alias("id_b"), F.col("simhash").alias("h_b"))
    return (
        a.join(b, ["seg", "seg_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_distance)
    )
