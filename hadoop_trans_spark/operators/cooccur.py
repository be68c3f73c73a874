"""Co-occurrence pair generation (market basket, co-purchase graphs).

The textbook formulation is a fact self-join on the grouping key
(`a JOIN b ON a.k = b.k AND a.item < b.item`): it shuffles the fact
table TWICE and sort-merges it before emitting the pair rows. The
operator here produces the identical pair table from ONE shuffle —
group to per-key item sets, then expand the C(k, 2) combinations
inside the array with JVM higher-order functions (no Python, no
explode-before-join). Fan-out is bounded by the basket size k, the
same bound the self-join has, but the heavy fact rows move once.

Used by the co-purchase graph family (q140/q147 backbone, q200 degree
distribution, q204 Adamic-Adar) and q178 market-basket mining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (x, i) enumerates the sorted item array; slice(ps, i+2, ...) is the
# strict upper triangle, so each unordered pair appears exactly once
# with u < v (array_sort order == SQL `<` for both ints and strings).
_COMBOS = (
    "flatten(transform(ps, (x, i) -> transform("
    "slice(ps, i + 2, size(ps) - i - 1), "
    "y -> struct(x AS u, y AS v))))"
)


# Baskets beyond this are excluded from pair mining entirely (hub
# removal). The C(k,2) expansion materializes one array of k(k-1)/2
# structs per basket BEFORE exploding: at the cap that's ~524k structs
# (tens of MB, safe); unguarded, ONE mega-basket of 16k items built a
# 131M-struct array and took down the whole JVM with it (r12 hot-key
# skew probe at sf0.1 — q200 OOM killed the session and the 50 queries
# after it). A basket that large is an ETL artifact or a bot, not
# co-purchase signal — the same judgment as q204's degree>64 hub prune.
# Consumers' oracles mirror the exclusion.
MAX_BASKET = 1024


def copurchase_pairs(
    df: DataFrame,
    key_col: str,
    item_col: str,
    weighted: bool = False,
    max_basket: int | None = MAX_BASKET,
) -> DataFrame:
    """Item pairs (u < v) co-occurring under one key of ``df``.

    ``collect_set`` dedups (key, item) for free, so each key
    contributes each pair exactly once: ``weighted=False`` returns the
    DISTINCT pair table (columns u, v), ``weighted=True`` the per-pair
    key-count (columns u, v, w). Measured 2.3 s vs 4.5 s against the
    equivalent lineitem self-join for the sf0.1 part-pair table.

    Skew guard (ENFORCED since r12 — the documented-only cap was a
    live JVM killer under one hot key): baskets with more than
    ``max_basket`` distinct items are dropped before the quadratic
    in-array expansion. Pass ``max_basket=None`` only when the item
    domain is inherently tiny (e.g. p_brand: 25 values).
    """
    sets = df.groupBy(key_col).agg(
        F.array_sort(F.collect_set(item_col)).alias("ps")
    )
    if max_basket is not None:
        sets = sets.where(F.size("ps") <= max_basket)
    pairs = sets.select(F.explode(F.expr(_COMBOS)).alias("p")).select(
        "p.u", "p.v"
    )
    if weighted:
        return pairs.groupBy("u", "v").agg(F.count("*").alias("w"))
    return pairs.distinct()
