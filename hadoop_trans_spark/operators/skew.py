"""Skew mitigation: salted joins (SURVEY §4.2 / SCALE.md).

AQE's skew-join splitting is the NOMINAL first line, but the SCALE.md
round-9 probe measured it never firing in this build across the full
conf matrix (thresholds to 1 MB, factor 2, force on, coalescing on/off,
compressible and incompressible payloads) while an explicit salt cut the
same 90%-hot join 1.5× — treat salting as the dependable path and AQE
splitting as opportunistic, verified per environment. The big side gets
a deterministic per-row salt, the small side is replicated once per salt
value, and the join key becomes (key, salt) — one hot shuffle partition
becomes ``n_salt`` even ones.

Result identity: salting only refines the partitioning; the joined row
set is exactly the unsalted join's (declared query q61 hash-checks that
against the plain-join oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an ``n_salt``-way salted key.

    ``big``'s salt is a deterministic hash of its join key AND a row
    discriminator (xxhash64 over all columns) so re-runs and retries
    partition identically; ``small`` is replicated ``n_salt`` times
    (keep it broadcast-sized × n_salt).

    Inner joins only: replication changes outer-join semantics — an
    unmatched ``small`` row would surface once per salt replica, and an
    unmatched ``big`` row's null-extension depends on the salt key. For
    skewed outer joins AQE skew-join splitting is the only structural
    option (verify it fires in your environment — SCALE.md round-9) or
    pre-split the hot keys manually into a separate union leg.
    """
    if how != "inner":
        raise ValueError(
            f"salted_join supports how='inner' only (got {how!r}); "
            "small-side replication breaks outer-join semantics — use "
            "AQE skew-join for skewed outer joins"
        )
    if SALT in big.columns or SALT in small.columns:
        raise ValueError(f"reserved column {SALT} already present")
    big_s = big.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    )
    small_s = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return big_s.join(small_s, [on, SALT], how).drop(SALT)
