"""Vector similarity search over embedding columns (E35).

Two paths:
  * brute-force cosine top-k — broadcast the (small) query set, compute
    dot products with JVM higher-order functions, window top-k. The
    correct baseline at any scale where |queries| is broadcastable.
  * IVF-style two-stage search — assign vectors to coarse cells
    (here: the existing `label` column or k-means-lite centroids computed
    as per-cell means), probe only the closest cells per query. This is
    the 100 TB path: the probe prunes the candidate set by the cell
    filter (partition pruning if the table is written partitioned by
    cell), trading recall for a bounded scan.

All vector math is double-precision, elementwise via zip_with/aggregate —
codegen'd, no Python, no UDF.

Physical rule: anything that depends on ONE vector (double-cast, norm)
is computed in a projection BEFORE the pair-producing join, so the
quadratic stage evaluates exactly one zip_with+aggregate per pair — at
1M+ pairs the per-pair array allocations of recomputing casts/norms
inside the join dominate everything else.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

def vec_valid(col="embedding"):
    from ..queries.base import vec_valid as _vv  # deferred: avoids the
    # queries/__init__ registration cycle (see streaming.jobs)

    return _vv(col)


def vec_usable(col="embedding"):
    # Norm-agnostic validity (no nonzero-norm term) for ops that never
    # divide by the norm — see queries/base.py vec_usable.
    from ..queries.base import vec_usable as _vu

    return _vu(col)


def _dbl(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def lit_doubles(values) -> Column:
    """One ``array<double>`` literal built with a single ``F.expr`` parse.

    Burning k·d doubles into a plan with per-element ``F.lit`` costs one
    py4j round trip per element — measured 2.0 s for the 2048 elements
    of sign-LSH's 32×64 hyperplanes, dominating the query end-to-end.
    Rendering ``repr(float)`` + a ``D`` suffix and parsing once is ~1 ms
    and bit-exact (shortest-repr strings round-trip through Spark's
    double-literal parser; verified for subnormal-free inputs incl.
    -0.0 and exponent forms). Inputs must be FINITE — ``repr(inf)``
    renders ``infD`` which Spark's parser rejects with an opaque
    AnalysisException, so non-finite values fail fast here instead."""
    body = ",".join(_finite_repr(x) for x in values)
    return F.expr(f"array({body})" if body else "cast(array() as array<double>)")


def _finite_repr(x) -> str:
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(
            f"lit_doubles/lit_double_matrix require finite values, got {v!r} "
            "(inf/nan have no Spark double-literal form)"
        )
    return f"{v!r}D"


def lit_double_matrix(rows) -> Column:
    """One ``array<array<double>>`` literal via a single ``F.expr`` —
    the 2-D companion of :func:`lit_doubles` for hyperplane/centroid
    matrices that would otherwise cost rows·dim py4j calls."""
    body = ",".join(
        "array(" + ",".join(_finite_repr(x) for x in row) + ")" for row in rows
    )
    return F.expr(f"array({body})" if body else "cast(array() as array<array<double>>)")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two DOUBLE arrays (pre-cast with ``_dbl``;
    casting inside the pair loop would reallocate both arrays per pair)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm of a raw (float or double) array column."""
    d = _dbl(a)
    return F.sqrt(dot(d, d))


def cosine(a: Column, b: Column) -> Column:
    """Cosine of two raw arrays — convenience form for one-off use; hot
    paths precompute ``_dbl`` arrays + norms before the join instead."""
    da, db = _dbl(a), _dbl(b)
    return dot(da, db) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec: str = "embedding",
) -> DataFrame:
    """Brute-force top-k: (q_id, c_id, cos, rank), rank 1..k per query.

    Ranking orders by ROUND(cos, 6) then id so results are reproducible
    across engines and partitionings (raw float ties are not).
    """
    # Degenerate vectors (NULL / non-finite / zero-norm / out-of-cap
    # magnitude) are excluded at entry on BOTH sides — a zero norm makes
    # the cosine a hard ANSI divide-by-zero (r11 vec probe).
    q = queries.where(vec_valid(vec)).select(
        F.col(query_id),
        _dbl(F.col(vec)).alias("q_vec"),
        norm(F.col(vec)).alias("q_n"),
    )
    c = corpus.where(vec_valid(vec)).select(
        F.col(corpus_id),
        _dbl(F.col(vec)).alias("c_vec"),
        norm(F.col(vec)).alias("c_n"),
    )
    # The query set is the small side by contract (|queries| ≪ corpus);
    # broadcast it explicitly so the all-pairs scan streams the corpus
    # against an in-memory query table instead of ever materializing a
    # shuffled CartesianProduct (stats on a filtered query subset can
    # misestimate at scale).
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col(query_id) != F.col(corpus_id))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_n") * F.col("c_n")),
                6,
            ),
        )
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos", "rank")
    )


def cell_centroids(corpus: DataFrame, cell: str = "label", vec: str = "embedding") -> DataFrame:
    """Per-cell mean vector: posexplode → avg per (cell, pos) → re-assemble
    ordered by position. One shuffle on (cell, pos), one on cell."""
    exploded = corpus.select(cell, F.posexplode(_dbl(F.col(vec))).alias("pos", "v"))
    return (
        exploded.groupBy(cell, "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy(cell)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.getField("m"),
            ).alias("centroid")
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    cell: str = "label",
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: rank cells by query↔centroid cosine, search only the
    top ``n_probe`` cells. Returns (q_id, c_id, cos, rank)."""
    corpus = corpus.where(vec_valid(vec))  # degenerate-vector rule
    queries = queries.where(vec_valid(vec))
    cents = cell_centroids(corpus, cell, vec)
    q = queries.select(
        F.col(query_id),
        _dbl(F.col(vec)).alias("q_vec"),
        norm(F.col(vec)).alias("q_n"),
    )

    cw = W.partitionBy(query_id).orderBy(
        F.round(F.col("cell_cos"), 6).desc(), F.col(cell)
    )
    cent_cos = dot(F.col("q_vec"), F.col("centroid")) / (
        F.col("q_n") * F.sqrt(dot(F.col("centroid"), F.col("centroid")))
    )
    # cents is O(number of cells) by construction — broadcast explicitly
    # rather than trusting post-aggregation size estimates, so the probe
    # never degrades to a CartesianProduct at scale.
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cell_cos", cent_cos)
        .withColumn("cell_rank", F.row_number().over(cw))
        .where(F.col("cell_rank") <= n_probe)
        .select(query_id, "q_vec", "q_n", cell)
    )

    c = corpus.select(
        F.col(corpus_id),
        F.col(cell),
        _dbl(F.col(vec)).alias("c_vec"),
        norm(F.col(vec)).alias("c_n"),
    )
    scored = (
        probed.join(c, cell)  # cell filter = the IVF prune
        .where(F.col(query_id) != F.col(corpus_id))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_n") * F.col("c_n")),
                6,
            ),
        )
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos", "rank")
    )


def random_hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: component (p, d) is the parity of the
    first hex digit of md5(f"{p}:{d}"). Reproducible in any engine — the
    planes are materialized as LITERALS into both the Spark plan and the
    DuckDB oracle SQL, so no cross-engine hash parity is needed."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def signlsh_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 32,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Sign-LSH (random-hyperplane, Charikar '02) cosine near-dup pairs —
    the wired ANN fallback for when blocking keys grow quadratically.

    Bit p of a vector's signature is sign(v · h_p); P(bit match) for a
    pair at angle θ is 1 − θ/π, so banding r = n_planes/bands bits gives
    candidate recall 1 − (1 − p^r)^bands: ~75% at cos 0.9, ~1.5% of
    RANDOM pairs (the selectivity that bounds the join) with the default
    32 planes × 4 bands. Candidates verify with the exact cosine; the
    rounded cosine is both filtered and returned, so engines agree at
    the threshold boundary.

    Scale shape: signatures are one narrow projection (32 literal-array
    dot products, codegen'd); the only pre-verification shuffle is the
    (band, band_sig) equi-join — identical topology to MinHash banding,
    so the same hot-bucket cap is the guard (see operators/minhash:
    AQE skew-split is opportunistic, not the defense)."""
    r = n_planes // bands
    planes = random_hyperplanes(n_planes, dim)
    # parallelize_stage: the 32 literal-hyperplane dot products are the
    # CPU stage, and the embeddings table is typically one small scan
    # split — without the repartition the signature projection runs on
    # one core. materialize_stage: three branches consume pre (the
    # signature projection and both verification fetches); without the
    # cut each re-derives the cast+norm from the scan (operators/stage.py).
    from .stage import materialize_stage, parallelize_stage

    pre = materialize_stage(
        # NULL vectors excluded (kmeans rule: a missing vector has no
        # signature; the oracle's list_dot_product raises on NULL —
        # NULL-probe find, r10).
        parallelize_stage(corpus.where(vec_valid(vec))).select(
            F.col(id_col).alias("id"),
            _dbl(F.col(vec)).alias("v"),
            norm(F.col(vec)).alias("n"),
        )
    )
    # One parsed 2-D literal + a transform lambda: the 32 per-plane
    # aggregate expressions collapse into a single HOF over the plane
    # array — same math, ~2 s less py4j/codegen overhead per call.
    sig_bits = F.transform(
        lit_double_matrix(planes),
        lambda h: F.when(dot(F.col("v"), h) > 0, F.lit("1")).otherwise(F.lit("0")),
    )
    sig = pre.withColumn("s", F.concat_ws("", sig_bits))
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.substring(F.col("s"), b * r + 1, r).alias("band_sig"),
        ),
    )
    banded = sig.select("id", F.explode(band_structs).alias("bs")).select(
        "id", "bs.band", "bs.band_sig"
    )
    a = banded.select("band", "band_sig", F.col("id").alias("id_a"))
    b = banded.select("band", "band_sig", F.col("id").alias("id_b"))
    cand = (
        a.join(b, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = pre.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("n").alias("n_a"))
    vb = pre.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("n").alias("n_b"))
    cos = F.round(dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6)
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def quantize_int8(
    corpus: DataFrame, id_col: str = "vec_id", vec: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = 127 / max|x|,
    q_i = floor(x_i · scale), plus the squared reconstruction error.

    `floor` (not `round`) keeps the operator engine-portable — rounding
    tie-break modes differ between engines, floor does not; IEEE double
    multiplication is bit-identical everywhere. Pure projection (codegen,
    no shuffle): the standard prep step before shipping embeddings to an
    ANN index — 4× smaller vectors, scan-bound at 100 TB.

    Returns (id, scale, q array<int>, sq_err)."""
    # Norm-agnostic op: per-component transform, no normalization — the
    # all-zero vector quantizes fine (scale floor 1e-12, q all zeros),
    # so only NULL / non-finite / over-cap components are excluded.
    corpus = corpus.where(vec_usable(vec))
    v = _dbl(F.col(vec))
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.lit(127.0) / F.greatest(max_abs, F.lit(1e-12))
    pre = corpus.select(
        F.col(id_col).alias("id"), v.alias("v"), scale.alias("scale")
    )
    q = F.transform(
        F.col("v"), lambda x: F.floor(x * F.col("scale")).cast("int")
    )
    dq_err = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("q"),
            lambda x, qi: (x - qi.cast("double") / F.col("scale"))
            * (x - qi.cast("double") / F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    return pre.withColumn("q", q).select(
        "id",
        F.round("scale", 6).alias("scale"),
        F.col("q"),
        F.round(dq_err, 6).alias("sq_err"),
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.4,
    block: str = "label",
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Near-dup pairs by cosine within a blocking key (E34 embedding
    variant): (id_a, id_b, cos). Blocking bounds the quadratic join the
    same way LSH banding does for text.

    parallelize_stage: the broadcast block-join preserves the probe
    side's scan partitioning, so the per-pair dot products (the CPU
    stage — |block|² pairs × dim multiplies) would run on a small
    fixture's single split (measured 1.35 -> 0.5 s at sf0.1); gated
    no-op on well-split inputs."""
    from .stage import parallelize_stage

    corpus = parallelize_stage(corpus.where(vec_valid(vec)))
    pre = corpus.select(
        F.col(block),
        F.col(id_col).alias("id"),
        _dbl(F.col(vec)).alias("v"),
        norm(F.col(vec)).alias("n"),
    )
    a = pre.select(
        block, F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("n").alias("n_a")
    )
    b = pre.select(
        block, F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("n").alias("n_b")
    )
    cos = F.round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6
    )
    return (
        a.join(b, block)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
