"""Sign-LSH near-dup recall on PLANTED duplicates.

The synthetic embeddings fixture has no high-cosine pairs, so q69's
fixture run exercises the pipeline but not the recall claim; this test
plants true near-duplicates (vector + small noise → cos > 0.99) and
checks the LSH candidate stage actually recovers them.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from hadoop_trans_spark.operators.similarity import signlsh_near_duplicates


def test_planted_near_dups_recovered(spark):
    rng = random.Random(7)
    dim = 64
    rows = []
    # 40 random base vectors; vectors 1000+i are near-copies of i<10.
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, v))
    for i in range(10):
        base = rows[i][1]
        noisy = [x + rng.gauss(0, 0.02) for x in base]
        rows.append((1000 + i, noisy))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in signlsh_near_duplicates(df, threshold=0.9).collect()
    }
    # At cos≈0.999 the per-bit agreement is ~0.99, so each planted pair is
    # a candidate with prob ~1-(1-0.99^8)^4 ≈ 1 - 8e-6; all 10 must appear.
    found = {p for p in pairs if p[0] < 10 and p[1] == 1000 + p[0]}
    assert len(found) == 10, f"missing planted pairs: {pairs.keys()}"
    assert all(c > 0.99 for c in pairs.values())


def test_no_false_positives_above_threshold(spark):
    rng = random.Random(11)
    dim = 64
    df = spark.createDataFrame(
        [
            (i, [float(rng.gauss(0, 1)) for _ in range(dim)])
            for i in range(60)
        ],
        "vec_id long, embedding array<float>",
    )
    # random 64-dim gaussians: cos concentrates near 0 (sd ≈ 1/8);
    # nothing should verify at 0.9 even if LSH buckets collide.
    assert signlsh_near_duplicates(df, threshold=0.9).count() == 0
