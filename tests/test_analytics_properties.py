"""Hypothesis/property tests for round-2 operators: chunk hashing against
an independent Python model, sampling edge cases, and k-means partition
invariance."""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadoop_trans_spark.catalog import table
from hadoop_trans_spark.operators.curation import chunk_documents, weighted_sample
from hadoop_trans_spark.operators.kmeans import kmeans_assignments

SIZE, STRIDE = 7, 5


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_chunk_hashes_match_python_model(spark, texts):
    """Every emitted chunk hash must equal md5 of the Python slice at the
    same offset — pinning Spark's substr semantics (1-based, clamped) to
    the independent model — and chunks must tile the text at STRIDE."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(
        df, size=SIZE, stride=STRIDE
    ).collect()
    got = {(r["doc_id"], r["off"]): (r["chunk_len"], r["chunk_hash"]) for r in rows}
    want = {}
    for i, t in enumerate(texts):
        for off in range(0, max(len(t), 0), STRIDE):
            chunk = t[off : off + SIZE]
            want[(i, off)] = (
                len(chunk),
                hashlib.md5(chunk.encode()).hexdigest(),
            )
    assert got == want


def test_weighted_sample_k_exceeding_rows_returns_all_positive(spark):
    df = spark.createDataFrame(
        [(i, float(i - 2)) for i in range(10)], "doc_id long, w double"
    )  # weights -2..7: three rows non-positive
    out = weighted_sample(df, k=100, weight_col="w", id_col="doc_id")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == list(range(3, 10))  # w>0 only, all of them


def test_kmeans_invariant_under_repartition(spark, smoke_dir):
    e = table(spark, smoke_dir, "embeddings")
    a1 = {
        (r["id"], r["cluster"])
        for r in kmeans_assignments(e, k=8, iters=2).collect()
    }
    a2 = {
        (r["id"], r["cluster"])
        for r in kmeans_assignments(
            e.repartition(17), k=8, iters=2
        ).collect()
    }
    assert a1 == a2

def test_incremental_dedup_empty_new_batch(spark, smoke_dir):
    """near_duplicates_between with an EMPTY new batch must return zero
    pairs without erroring — the q86 odd/even split happens to make both
    sides non-empty on the fixture, so fixture greenness alone never
    exercises the first batch of a fresh ingestion (or a quiet one)."""
    from hadoop_trans_spark.operators.minhash import near_duplicates_between

    d = table(spark, smoke_dir, "documents")
    empty = d.where(F.lit(False))
    got = near_duplicates_between(
        d, empty, shingle_k=3, n_hashes=8, bands=4, threshold=0.5
    )
    assert got.count() == 0
    assert {"id_a", "id_b", "jaccard"} <= set(got.columns)
    # and the mirror case: empty corpus, real batch
    got2 = near_duplicates_between(
        empty, d.limit(20), shingle_k=3, n_hashes=8, bands=4, threshold=0.5
    )
    assert got2.count() == 0

def test_session_concurrency_two_phase_equals_global(spark, smoke_dir):
    """q127's distributed two-phase prefix sum must equal the naive
    single-partition global running sum — per-day max concurrency is
    identical even with sessions spanning hour-bucket boundaries."""
    from pyspark.sql import Window
    from hadoop_trans_spark.queries import QUERIES

    got = {
        r["day"]: r["max_concurrent"]
        for r in QUERIES["q127_session_concurrency"](
            spark, smoke_dir
        ).collect()
    }

    # naive reference: same sessions, one global window
    from hadoop_trans_spark.catalog import table as _table
    from hadoop_trans_spark.queries.base import ts_micros

    e = _table(spark, smoke_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    news = F.when(
        F.lag("ts").over(w).isNull()
        | (ts_micros("ts") - F.lag(ts_micros("ts")).over(w) >= 30 * 60 * 1_000_000),
        1,
    ).otherwise(0)
    g = e.select("user_id", "ts", "event_id", news.alias("news")).withColumn(
        "sid", F.sum("news").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sess = g.groupBy("user_id", "sid").agg(
        F.min(ts_micros("ts")).alias("s"), (F.max(ts_micros("ts")) + 1).alias("e")
    )
    deltas = sess.select(F.col("s").alias("ts_us"), F.lit(1).alias("delta")).unionByName(
        sess.select(F.col("e").alias("ts_us"), F.lit(-1).alias("delta"))
    )
    wg = Window.orderBy("ts_us", "delta").rowsBetween(Window.unboundedPreceding, 0)
    naive = (
        deltas.select("ts_us", F.sum("delta").over(wg).alias("run"))
        .groupBy(
            F.date_format(F.timestamp_micros(F.col("ts_us")), "yyyy-MM-dd").alias("day")
        )
        .agg(F.max("run").cast("bigint").alias("m"))
    )
    ref = {r["day"]: r["m"] for r in naive.collect()}
    assert got == ref


def test_session_concurrency_invariant_under_shuffle_partitioning(
    spark, smoke_dir
):
    """Equal-key permutations inside the sweep (ends vs starts at one
    instant, rows landing in different partitions) must never move the
    per-day max — re-running under a different shuffle width is the
    cheapest way to force a different physical ordering."""
    from hadoop_trans_spark.queries import QUERIES

    q = QUERIES["q127_session_concurrency"]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = {r["day"]: r["max_concurrent"] for r in q(spark, smoke_dir).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = {r["day"]: r["max_concurrent"] for r in q(spark, smoke_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_tfidf_pairs_empty_mid_band_yields_empty_not_error(spark, tmp_path):
    """q131 with a corpus whose every term has df=1 (below the 2..cap
    band): zero candidates must produce an empty result, not a crash —
    the degenerate corpus a filtered shard can hand the operator."""
    from hadoop_trans_spark.queries import QUERIES

    b = "abcd"
    docs = spark.createDataFrame(
        [(i, f"{b[i]}xa {b[i]}xb {b[i]}xc") for i in range(4)],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["q131_tfidf_cosine_pairs"](spark, str(tmp_path))
    assert out.count() == 0
    assert out.columns == ["doc_id", "best_match", "cosine"]


def test_tfidf_pairs_all_stopword_corpus_yields_empty_not_crash(
    spark, tmp_path
):
    """Every term in every doc => idf 0 => zero-norm docs. Under ANSI
    mode the cosine would be a DIVIDE_BY_ZERO crash; the zero-norm
    exclusion must turn this into an empty result (found by this test:
    the crash was real before the norms filter)."""
    from hadoop_trans_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(4)],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["q131_tfidf_cosine_pairs"](spark, str(tmp_path))
    assert out.count() == 0


def test_containment_detects_planted_substring_doc(spark, tmp_path):
    """q142: a document that is a contiguous slice of a longer one has
    gram-set containment 1.0 and MUST surface as (short, long); an
    unrelated doc must pair with nothing. This pins the operator to its
    purpose (doc-in-doc capture) independent of fixture luck."""
    from hadoop_trans_spark.queries import QUERIES

    words = [f"w{i}" for i in range(60)]
    long_doc = " ".join(words)
    short_doc = " ".join(words[15:40])  # contiguous slice => containment 1.0
    other = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, long_doc, "en"), (2, short_doc, "en"), (3, other, "en")],
        "doc_id long, text string, lang string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = QUERIES["q142_shingle_containment"](spark, str(tmp_path)).collect()
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in rows}
    assert got == {(2, 1): 1.0}


def test_triangle_count_matches_handmade_graph(spark, tmp_path):
    """q140 on a graph built by hand: order 1 connects suppliers
    {1,2,3} (one triangle), order 2 adds edge (3,4) (no triangle).
    Every triangle vertex must count exactly once."""
    from hadoop_trans_spark.queries import QUERIES

    rows = [(1, 1), (1, 2), (1, 3), (2, 3), (2, 4)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["supplier"]: r["n_triangles"]
        for r in QUERIES["q140_triangle_count"](spark, str(tmp_path)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_stage_memo_selective_clear_keeps_other_family(spark):
    """clear_stage_memo({tags}) must drop exactly those stage entries
    and keep the rest (bench relies on this: re-timing SimHash must not
    force the MinHash family to rebuild)."""
    from hadoop_trans_spark.queries.dedup import (
        _STAGE_CACHE,
        clear_stage_memo,
        grams3_table,
        simhash_table,
    )

    sf = "/root/testdata/sf0.001"
    grams3_table(spark, sf)
    simhash_table(spark, sf)
    tags = {k[0] for k in _STAGE_CACHE}
    assert {"grams3", "simhash"} <= tags
    clear_stage_memo({"simhash"})
    tags = {k[0] for k in _STAGE_CACHE}
    assert "simhash" not in tags and "grams3" in tags
    clear_stage_memo()
    assert not _STAGE_CACHE


def test_stage_memo_evicts_dead_session_entries(spark):
    """memo_stage must drop entries keyed to a different applicationId:
    handles from a stopped session hold unreachable block references
    (localCheckpoint blocks die with their session), and across session
    restarts in one long process the cache would grow without bound."""
    from hadoop_trans_spark.operators.stage import _STAGE_CACHE, memo_stage

    clear = lambda: _STAGE_CACHE.clear()  # noqa: E731
    clear()
    try:
        _STAGE_CACHE[("old_tag", "app-dead-123", "sf")] = "stale-handle"
        got = memo_stage(spark, "sf", "fresh_tag", lambda: "built")
        assert got == "built"
        apps = {k[1] for k in _STAGE_CACHE}
        assert apps == {spark.sparkContext.applicationId}
        assert ("old_tag", "app-dead-123", "sf") not in _STAGE_CACHE
    finally:
        clear()


def test_stage_memo_valid_callback_rebuilds_vanished_value(spark):
    """memo_stage(valid=...) must re-run the build when a cached value no
    longer validates: the streaming late-batch stage memoizes a tempdir
    PATH, and a tmp reaper removing it mid-session would otherwise make
    q59/q183 stream from a missing directory as silently empty."""
    from hadoop_trans_spark.operators.stage import _STAGE_CACHE, memo_stage

    _STAGE_CACHE.clear()
    try:
        builds = []

        def build():
            builds.append(1)
            return f"path-{len(builds)}"

        alive = {"path-1": True, "path-2": True}
        got = memo_stage(spark, "sf", "vtag", build, valid=alive.get)
        assert got == "path-1" and len(builds) == 1
        # healthy hit: no rebuild
        got = memo_stage(spark, "sf", "vtag", build, valid=alive.get)
        assert got == "path-1" and len(builds) == 1
        # value vanishes (reaped tempdir) -> rebuild and re-memoize
        alive["path-1"] = False
        got = memo_stage(spark, "sf", "vtag", build, valid=alive.get)
        assert got == "path-2" and len(builds) == 2
        # and the NEW value is what later hits return
        got = memo_stage(spark, "sf", "vtag", build, valid=alive.get)
        assert got == "path-2" and len(builds) == 2
    finally:
        _STAGE_CACHE.clear()


def test_lit_doubles_rejects_non_finite_with_clear_error(spark):
    """lit_doubles/lit_double_matrix render repr(float)+'D' into one SQL
    parse; repr(inf) -> 'infD' which Spark rejects with an opaque
    AnalysisException, so the helpers must fail fast with a ValueError
    naming the offending value instead."""
    import math

    import pytest

    from hadoop_trans_spark.operators.similarity import (
        lit_double_matrix,
        lit_doubles,
    )

    for bad in (math.inf, -math.inf, math.nan):
        with pytest.raises(ValueError, match="finite"):
            lit_doubles([1.0, bad, 2.0])
        with pytest.raises(ValueError, match="finite"):
            lit_double_matrix([[1.0, 2.0], [bad]])
    # finite inputs still build a usable literal
    got = spark.range(1).select(lit_doubles([1.5, -0.0]).alias("a")).collect()
    assert got[0]["a"] == [1.5, -0.0]


def test_chained_rollup_multi_batch_equals_single_batch(spark, smoke_dir, tmp_path):
    """q141's two stateful operators across MULTIPLE micro-batches: the
    same events split into two files (processed oldest-first with
    maxFilesPerTrigger=1) must finalize exactly the hourly windows the
    single-batch run finalizes — watermark propagation between chained
    operators must survive batch boundaries."""
    import time as _t

    from hadoop_trans_spark.catalog import table as _table
    from hadoop_trans_spark.streaming import chained_windowed_rollup
    from hadoop_trans_spark.streaming.jobs import run_to_memory

    ev = _table(spark, smoke_dir, "events")
    mid = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).collect()[0][0]
    src = str(tmp_path / "ev_stream")
    early = ev.where(F.unix_micros(F.col("ts").cast("timestamp")) <= mid)
    late = ev.where(F.unix_micros(F.col("ts").cast("timestamp")) > mid)
    early.write.parquet(src)  # earlier mtime => processed first
    _t.sleep(1.1)
    late.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    multi = {
        r["window_start"]: (r["n_events"], r["n_user_slots"], r["max_burst"])
        for r in run_to_memory(
            chained_windowed_rollup(stream), "append"
        ).collect()
    }
    from hadoop_trans_spark.queries import QUERIES

    single = {
        r["window_start"]: (r["n_events"], r["n_user_slots"], r["max_burst"])
        for r in QUERIES["q141_stream_chained_rollup"](
            spark, smoke_dir
        ).collect()
    }
    assert multi == single


def test_agg_battery_tiebreak_picks_higher_key_on_price_tie(spark, tmp_path):
    """q136's max_by/min_by comparison value must order (price, key)
    lexicographically even when prices tie and keys are huge — the
    float-perturbation formulation this replaced crossed the $0.01
    quantum at production key ranges and mis-picked rows."""
    from hadoop_trans_spark.queries import QUERIES

    rows = [
        (1, "P", "F", 500000.00),
        (900_000_000, "P", "F", 500000.00),   # tie: must win max_by
        (2, "P", "F", 499999.99),             # one cent less, huge key
        (899_999_999, "P", "F", 100.00),      # min-side tie, huge key
        (3, "P", "F", 100.00),                # tie at min: smaller key wins
    ]
    import datetime
    df = spark.createDataFrame(
        [(k, s, st, p, datetime.datetime(2024, 1, 1), "1-URGENT")
         for k, s, st, p in [(r[0], r[1], r[2], r[3]) for r in rows]],
        "o_orderkey long, o_custkey string, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = QUERIES["q136_agg_battery_modern"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["top_order"] == 900_000_000      # tie at 500000.00 → higher key
    assert r["bottom_order"] == 3             # tie at 100.00 → lower key


def test_geo_radius_join_catches_antimeridian_pair(spark, tmp_path):
    """q153: two points 0.02° of longitude apart but on opposite sides
    of ±180° are ~2 km apart and MUST pair — the unwrapped cell ids
    (cx 89 vs -90) would never meet in the ±1 neighborhood (bug found
    by review; both engines shared it, so only a planted test can lock
    it)."""
    from hadoop_trans_spark.queries import QUERIES

    # Find customer keys whose md5-derived coordinates land just east
    # and just west of the antimeridian at similar latitude.
    import hashlib

    def coord(k):
        h = hashlib.md5(str(k).encode()).hexdigest()
        return (-60 + (int(h[:6], 16) % 12000) / 100.0,
                -180 + (int(h[6:12], 16) % 36000) / 100.0)

    wests, easts = [], []
    for k in range(1, 300_000):
        lat, lon = coord(k)
        if lon <= -179.9:
            wests.append((k, lat))
        elif lon >= 179.9:
            easts.append((k, lat))
    pair = next(
        ((w, e) for w in wests for e in easts if abs(w[1] - e[1]) <= 0.1),
        None,
    )
    assert pair is not None, (len(wests), len(easts))
    west, east = pair
    df = spark.createDataFrame(
        [(west[0], "w", 0, 0.0, "A"), (east[0], "e", 0, 0.0, "A")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    df.write.parquet(str(tmp_path / "customer.parquet"))
    out = QUERIES["q153_geo_radius_join"](spark, str(tmp_path)).collect()
    assert len(out) == 1, out
    assert out[0]["dist_km"] <= 25.0


def test_linear_interpolation_bounded_by_anchors(spark, smoke_dir):
    """q176: every interpolated (is_gap=1) value must lie within the
    [min, max] of its user's observed values, and every observed
    (is_gap=0) grid point must carry its own value unchanged — the
    between-anchors property that distinguishes linear fill from
    extrapolation."""
    from hadoop_trans_spark.queries import QUERIES

    out = QUERIES["q176_linear_interpolation"](spark, smoke_dir)
    rows = out.collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert rows, "fixture produced no grid rows"
    for user, urows in by_user.items():
        observed = [r.v_interp for r in urows if r.is_gap == 0]
        lo, hi = min(observed), max(observed)
        for r in urows:
            if r.is_gap == 1:
                assert lo - 1e-6 <= r.v_interp <= hi + 1e-6, (
                    user,
                    r.hour_us,
                    r.v_interp,
                    (lo, hi),
                )


def test_cusum_changepoint_invariant_to_input_partitioning(spark, smoke_dir):
    """q177: the changepoint day and CUSUM value must be identical under
    different input partitionings — the decimal-accumulation guarantee
    (a float running sum would drift with partial order)."""
    from hadoop_trans_spark.queries import QUERIES

    base = QUERIES["q177_cusum_changepoint"](spark, smoke_dir).collect()
    # Re-run with the events scan forced through a different layout.
    import tempfile

    from hadoop_trans_spark.catalog import table

    redist = tempfile.mkdtemp(prefix="cusum_redist_") + "/events.parquet"
    table(spark, smoke_dir, "events").repartition(13).write.mode(
        "overwrite"
    ).parquet(redist)
    import os

    alt_dir = os.path.dirname(redist)
    # The query reads {dir}/events.parquet; point it at the reshuffled copy.
    alt = QUERIES["q177_cusum_changepoint"](spark, alt_dir).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, alt))


def test_spearman_invariant_under_monotone_transform(spark, smoke_dir):
    """Spearman is rank-based: replacing the price column with any
    strictly increasing transform (here exp-free: price*3+7) must leave
    every per-brand rho unchanged. Computed through the same window+
    moment pipeline as q181, on a small synthetic frame."""
    import math

    from pyspark.sql import Window

    rows = [
        ("A", float(q), float(e))
        for q, e in [(1, 9.5), (2, 3.2), (2, 7.7), (5, 1.1), (9, 4.4), (9, 4.4)]
    ] + [
        ("B", float(q), float(e))
        for q, e in [(3, 2.0), (4, 8.0), (4, 8.0), (8, 0.5)]
    ]

    def rho(df):
        wq = Window.partitionBy("b").orderBy("q")
        we = Window.partitionBy("b").orderBy("e")
        cq = Window.partitionBy("b", "q")
        ce = Window.partitionBy("b", "e")
        r = df.select(
            "b",
            (F.rank().over(wq) + (F.count("*").over(cq) - 1) / 2.0).alias("rq"),
            (F.rank().over(we) + (F.count("*").over(ce) - 1) / 2.0).alias("re"),
        )
        m = r.groupBy("b").agg(
            F.count("*").alias("n"),
            F.sum("rq").alias("sx"),
            F.sum("re").alias("sy"),
            F.sum(F.col("rq") * F.col("rq")).alias("sxx"),
            F.sum(F.col("re") * F.col("re")).alias("syy"),
            F.sum(F.col("rq") * F.col("re")).alias("sxy"),
        )
        out = {}
        for row in m.collect():
            num = row.n * row.sxy - row.sx * row.sy
            den = math.sqrt(
                (row.n * row.sxx - row.sx**2) * (row.n * row.syy - row.sy**2)
            )
            out[row.b] = round(num / den, 9)
        return out

    df = spark.createDataFrame(rows, "b string, q double, e double")
    transformed = df.withColumn("e", F.col("e") * 3 + 7)
    assert rho(df) == rho(transformed)
    # sanity: |rho| <= 1
    assert all(abs(v) <= 1.0 for v in rho(df).values())


def test_auc_rank_matches_pandas_rederivation(spark, smoke_dir):
    from hadoop_trans_spark.queries import QUERIES

    """q198's grouped-cumulative AUC must equal the textbook per-row
    midrank formula computed independently in pandas — and flipping the
    label must give exactly 1 - AUC (rank-sum symmetry)."""
    import pandas as pd

    row = QUERIES["q198_auc_rank"](spark, smoke_dir).collect()[0]
    pdf = pd.read_parquet(f"{smoke_dir}/documents.parquet")[
        ["n_chars", "lang"]
    ]
    y = (pdf["lang"] == "en").astype(int)
    r = pdf["n_chars"].rank(method="average")
    npos, nneg = int(y.sum()), int((1 - y).sum())
    auc = (float(r[y == 1].sum()) - npos * (npos + 1) / 2) / (npos * nneg)
    assert row["npos"] == npos and row["nneg"] == nneg
    assert abs(row["auc"] - round(auc, 6)) < 2e-6
    flipped = (
        float(r[y == 0].sum()) - nneg * (nneg + 1) / 2
    ) / (nneg * npos)
    assert abs(auc + flipped - 1.0) < 1e-9


def test_twap_matches_pandas_rederivation(spark, smoke_dir):
    from hadoop_trans_spark.queries import QUERIES

    """q210's window+agg TWAP must equal a per-user pandas loop over
    (ts, event_id)-sorted events with interval weights."""
    import pandas as pd

    got = {
        r["user_id"]: (r["n_intervals"], r["span_us"], r["twap"])
        for r in QUERIES["q210_twap_per_user"](spark, smoke_dir).collect()
    }
    pdf = pd.read_parquet(f"{smoke_dir}/events.parquet")[
        ["user_id", "ts", "value", "event_id"]
    ].sort_values(["user_id", "ts", "event_id"])
    for uid, g in pdf.groupby("user_id"):
        # normalize to epoch-us whether parquet shipped ns or us units
        us = g["ts"].astype("datetime64[us]").astype("int64")
        dt = us.shift(-1) - us
        mask = dt.notna() & (dt > 0)
        if not mask.any():
            assert uid not in got
            continue
        w = dt[mask].astype("int64")
        v = g["value"][mask]
        twap = float((v * w).sum() / w.sum())
        n, span, got_twap = got[int(uid)]
        assert n == int(mask.sum()) and span == int(w.sum())
        assert abs(got_twap - twap) < 1e-5


def test_holt_forecast_matches_python_fold(spark, smoke_dir):
    from hadoop_trans_spark.queries import QUERIES

    """q203's array-fold recursion must equal a plain Python loop over
    the day-sorted revenue series (alpha=.5, beta=.3, l=y1, b=y2-y1)."""
    import pandas as pd

    got = {
        r["h"]: r["forecast"]
        for r in QUERIES["q203_holt_forecast"](spark, smoke_dir).collect()
    }
    li = pd.read_parquet(f"{smoke_dir}/lineitem.parquet")[
        ["l_shipdate", "l_extendedprice"]
    ]
    daily = (
        li.groupby("l_shipdate")["l_extendedprice"]
        .sum()
        .round(6)
        .sort_index()
        .tolist()
    )
    l, b = daily[0], daily[1] - daily[0]
    for y in daily[1:]:
        l_new = 0.5 * y + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        l = l_new
    for h in range(1, 8):
        assert abs(got[h] - round(l + h * b, 6)) < 1e-4, (h, got[h], l, b)


def test_winsorize_cutoffs_and_mean_match_pandas(spark, smoke_dir):
    from hadoop_trans_spark.queries import QUERIES

    """q206's histogram-derived p05/p95 must equal pandas' lowest-value-
    reaching-ceil(p*n) cutoffs, and the clipped mean must match."""
    import math

    import pandas as pd

    rows = {
        r["seg"]: r
        for r in QUERIES["q206_winsorize_acctbal"](spark, smoke_dir).collect()
    }
    pdf = pd.read_parquet(f"{smoke_dir}/customer.parquet")[
        ["c_mktsegment", "c_acctbal"]
    ]
    for seg, g in pdf.groupby("c_mktsegment"):
        v = g["c_acctbal"].sort_values().reset_index(drop=True)
        n = len(v)
        p05 = v[math.ceil(0.05 * n) - 1]
        p95 = v[math.ceil(0.95 * n) - 1]
        r = rows[seg]
        assert r["n"] == n
        assert r["p05"] == p05 and r["p95"] == p95, (seg, r, p05, p95)
        clipped = v.clip(lower=p05, upper=p95)
        assert abs(r["winsorized_mean"] - round(float(clipped.mean()), 6)) < 1e-5


def test_key_gap_audit_finds_planted_gaps_exactly(spark, tmp_path):
    """q222 against a doctored orders table: keys 1..5000 with three
    known holes — the audit must report exactly those buckets with
    exactly the planted deficit, and a contiguous table must report
    nothing."""
    from hadoop_trans_spark.queries import QUERIES

    holes = {137, 138, 139, 2500, 4999}
    rows = [(k,) for k in range(1, 5001) if k not in holes]
    df = spark.createDataFrame(rows, "o_orderkey long")
    gapped = str(tmp_path / "gapped")
    df.write.parquet(f"{gapped}/orders.parquet")
    got = {
        r["bucket"]: r["missing_in_span"]
        for r in QUERIES["q222_key_sequence_gaps"](spark, gapped).collect()
    }
    # bucket 0 is the global-min edge bucket (expected 1..999, holes
    # 137-139); buckets 2 and 4 are interior so they audit against
    # their FIXED spans 2000..2999 and 4000..4999 — hole 4999 sits at
    # bucket 4's own max and is caught exactly because the expected
    # span is fixed, not observed (the round-4 blind spot, closed).
    assert got == {0: 3, 2: 1, 4: 1}, got

    full = spark.createDataFrame(
        [(k,) for k in range(1, 2001)], "o_orderkey long"
    )
    clean = str(tmp_path / "clean")
    full.write.parquet(f"{clean}/orders.parquet")
    assert QUERIES["q222_key_sequence_gaps"](spark, clean).count() == 0


def test_kaplan_meier_matches_python_and_is_monotone(spark, smoke_dir):
    """q225's windowed KM curve must equal the textbook sequential
    product computed in plain Python from the same per-user durations,
    and survival must be non-increasing in [0, 1]."""
    import pandas as pd

    from hadoop_trans_spark.queries import QUERIES

    rows = QUERIES["q225_kaplan_meier"](spark, smoke_dir).collect()
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))

    ev = pd.read_parquet(f"{smoke_dir}/events.parquet")[
        ["user_id", "ts", "event_type"]
    ]
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    mx = int(ev["us"].max())
    durations = []
    for uid, g in ev.groupby("user_id"):
        s = g[g["event_type"] == "signup"]["us"]
        if s.empty:
            continue
        s0 = int(s.min())
        p = g[(g["event_type"] == "purchase") & (g["us"] > s0)]["us"]
        if p.empty:
            durations.append(((mx - s0) // 86400000000, 0))
        else:
            durations.append(((int(p.min()) - s0) // 86400000000, 1))
    from collections import Counter

    d_cnt = Counter(d for d, c in durations if c == 1)
    c_cnt = Counter(d for d, c in durations if c == 0)
    days = sorted(set(d_cnt) | set(c_cnt))
    at_risk = len(durations)
    s_model, got_i = 1.0, 0
    import math

    for day in days:
        d, c = d_cnt.get(day, 0), c_cnt.get(day, 0)
        if d >= at_risk:
            s_model = 0.0
        elif d > 0:
            s_model *= math.exp(math.log(1.0 - d / at_risk))
        r = rows[got_i]
        assert (r["day"], r["n_risk"], r["d"], r["c"]) == (
            day,
            at_risk,
            d,
            c,
        ), (r, day, at_risk, d, c)
        assert abs(r["survival"] - s_model) < 1e-5, (r, s_model)
        at_risk -= d + c
        got_i += 1
    assert got_i == len(rows)


def test_cross_correlation_lag0_equals_direct_pearson(spark, smoke_dir):
    """q224 at lag 0 must equal the plain Pearson correlation of the
    two daily series computed independently in pandas."""
    import pandas as pd

    from hadoop_trans_spark.queries import QUERIES

    rows = {
        r["lag"]: r["xcorr"]
        for r in QUERIES["q224_cross_correlation"](spark, smoke_dir).collect()
    }
    ev = pd.read_parquet(f"{smoke_dir}/events.parquet")[["ts", "event_type"]]
    ev["day"] = ev["ts"].astype("datetime64[us]").dt.floor("D")
    daily = (
        ev.pivot_table(
            index="day", columns="event_type", aggfunc="size", fill_value=0
        )
        .reindex(columns=["click", "purchase"], fill_value=0)
    )
    want = daily["click"].corr(daily["purchase"])
    assert abs(rows[0] - want) < 1e-5, (rows[0], want)


def test_equidepth_depths_sum_to_total_and_are_balanced(spark, smoke_dir):
    """q216: bucket populations must sum exactly to the table row count
    and no bucket may exceed 2x the ideal depth on the fixture (ties
    can imbalance, but not pathologically here)."""
    import pandas as pd

    from hadoop_trans_spark.queries import QUERIES

    rows = QUERIES["q216_equidepth_histogram"](spark, smoke_dir).collect()
    n = len(pd.read_parquet(f"{smoke_dir}/orders.parquet"))
    depths = [r["n_rows"] for r in rows]
    assert sum(depths) == n
    assert len(depths) == 10
    assert max(depths) <= 2 * (n / 10)
    # boundaries strictly increase
    his = [r["hi"] for r in rows]
    assert his == sorted(his) and len(set(his)) == 10


def test_rfm_bins_in_range_and_cover_all_customers(spark, smoke_dir):
    """q220: every bin index must lie in 1..5 and segment sizes must
    sum to the customer count."""
    import pandas as pd

    from hadoop_trans_spark.queries import QUERIES

    rows = QUERIES["q220_rfm_segments"](spark, smoke_dir).collect()
    n_cust = (
        pd.read_parquet(f"{smoke_dir}/orders.parquet")["o_custkey"]
        .nunique()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        for k in ("r_bin", "f_bin", "m_bin"):
            assert 1 <= r[k] <= 5, r


def test_markov_stationary_invariant_to_input_partitioning(spark, smoke_dir, tmp_path):
    """q239 under a shuffled, repartitioned copy of events must emit the
    BIT-IDENTICAL stationary vector: every per-step product is rounded
    at 1e-12 and decimal-summed, so no task-schedule or partition-order
    effect may survive. Any drift means a float sum escaped staging."""
    from hadoop_trans_spark.queries import QUERIES

    base = sorted(
        (r["state"], r["stationary_p"])
        for r in QUERIES["q239_markov_stationary"](spark, smoke_dir).collect()
    )
    perm = str(tmp_path / "perm")
    (
        table(spark, smoke_dir, "events")
        .orderBy(F.rand(7))
        .repartition(7)
        .write.parquet(f"{perm}/events.parquet")
    )
    got = sorted(
        (r["state"], r["stationary_p"])
        for r in QUERIES["q239_markov_stationary"](spark, perm).collect()
    )
    assert got == base


def test_markov_stationary_null_event_type_agrees_with_oracle(
    spark, smoke_dir, tmp_path
):
    """ADVICE r9: a NULL event_type with a non-null successor must leave
    both engines' uniform-seed denominators equal. Pre-fix, the oracle's
    states CTE counted the NULL source (seed 1/(k+1)) while
    _power_iterate dropped it (seed 1/k), diverging every stationary_p.
    The shipped fixtures have zero NULL event_type, so this injects one
    and runs the full Spark-vs-DuckDB differential on the copy."""
    from datetime import datetime

    import duckdb

    from hadoop_trans_spark.queries import ORACLE, QUERIES
    from hadoop_trans_spark.testing.oracle import compare

    nulled = str(tmp_path / "nulled")
    base = table(spark, smoke_dir, "events")
    injected = spark.createDataFrame(
        [
            (990001, datetime(2024, 6, 1, 0, 0, 0), 999999, None, 1.0, "{}"),
            (990002, datetime(2024, 6, 1, 0, 1, 0), 999999, "click", 1.0, "{}"),
        ],
        base.schema,
    )
    base.unionByName(injected).write.parquet(f"{nulled}/events.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{nulled}/events.parquet/*.parquet')"
    )
    name = "q239_markov_stationary"
    res = compare(name, QUERIES[name](spark, nulled), con, ORACLE[name])
    con.close()
    assert res.match, res.detail


@given(seed=st.integers(0, 10_000))
@settings(max_examples=40, deadline=None)
def test_markov_fold_tracks_exact_matrix_power(seed):
    """q239's driver fold (`_power_iterate`) vs the exact Fraction
    matrix power on random row-stochastic chains: the only divergence
    allowed is the documented 1e-12 HALF_UP quantize per term, which
    accumulates to at most steps x |cells| x 1e-12. Random chains reach
    shapes the events fixture never produces (near-degenerate rows,
    unreachable states)."""
    import random
    from fractions import Fraction

    from hadoop_trans_spark.queries.timeseries import _power_iterate

    rng = random.Random(seed)
    k = rng.randint(1, 6)
    states = [f"s{i}" for i in range(k)]
    tp: dict[tuple[str, str], float] = {}
    exact: dict[tuple[str, str], Fraction] = {}
    for a in states:
        targets = rng.sample(states, rng.randint(1, k))
        weights = [rng.randint(1, 9) for _ in targets]
        tot = sum(weights)
        for b, wgt in zip(targets, weights):
            # float division then Fraction(float) keeps both models on
            # the IDENTICAL double transition probabilities.
            p = wgt / tot
            tp[(a, b)] = p
            exact[(a, b)] = Fraction(p)
    steps = 16
    got = _power_iterate(tp, steps=steps)
    v = {s: Fraction(1, k) for s in states}
    for _ in range(steps):
        nxt: dict[str, Fraction] = {}
        # Key-presence rule mirrors the join semantics: an edge fires
        # only while its SOURCE is still in the vector — a target fed
        # solely by departed sources drops out entirely (it does not
        # linger at mass 0, which is what the original form of this
        # reference got wrong and hypothesis seed=3074 caught).
        for (a, b), p_ab in exact.items():
            if a in v:
                nxt[b] = nxt.get(b, Fraction(0)) + v[a] * p_ab
        v = nxt
    assert set(got) == set(v)
    tol = steps * len(tp) * 1e-12 + 1e-12
    for s in got:
        assert abs(got[s] - float(v[s])) <= tol, (s, got[s], float(v[s]))


def test_markov_fold_edge_chains():
    """Closed-form edge cases: a self-loop keeps all mass; a pure cycle
    preserves the uniform vector exactly; a chain draining into a state
    with no outgoing transitions empties (row-substochastic absorption —
    the query then returns an empty frame, same as the join-based form
    this replaced); no transitions at all -> empty."""
    from hadoop_trans_spark.queries.timeseries import _power_iterate

    assert _power_iterate({}, steps=16) == {}
    assert _power_iterate({("a", "a"): 1.0}, steps=16) == {"a": 1.0}
    cycle = {("a", "b"): 1.0, ("b", "c"): 1.0, ("c", "a"): 1.0}
    got = _power_iterate(cycle, steps=16)
    assert got == {s: float(Decimal(repr(1.0 / 3.0)).quantize(
        Decimal("1e-12"), ROUND_HALF_UP)) for s in "abc"}
    assert _power_iterate({("a", "b"): 1.0}, steps=16) == {}
    # NULL-keyed cells are dropped, not crashed on (a NULL event_type
    # could never fire under the join form's null-never-equals rule):
    # the mixed chain must fold exactly like its null-free projection.
    assert _power_iterate(
        {(None, "a"): 1.0, ("a", None): 0.5, ("a", "a"): 0.5}, steps=16
    ) == _power_iterate({("a", "a"): 0.5}, steps=16)


def test_spectral_tiebreak_and_two_tone_dominance(spark):
    """decode_spectral edge rules: (a) an impulse clip has an EXACTLY
    flat magnitude spectrum — every bin ties, and the dominant bin must
    be the LOWEST non-DC bin (np.argmax first-match, the documented tie
    rule; a "two equal tones" tie is NOT exact after int16 quantization,
    which is why the tie case must be the impulse); (b) on genuine
    two-tone clips the stronger tone must win regardless of bin order."""
    import hashlib
    import io
    import math
    import struct
    import wave

    from hadoop_trans_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        WAV_MIME,
        decode_spectral,
    )

    def wav_of(samples, sr=8000) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return buf.getvalue()

    def two_tone(k1, a1, k2, a2, n=512) -> bytes:
        return wav_of(
            [
                int(
                    round(
                        a1 * math.cos(2 * math.pi * k1 * i / n)
                        + a2 * math.cos(2 * math.pi * k2 * i / n)
                    )
                )
                for i in range(n)
            ]
        )

    cases = [
        # impulse: |rFFT| == 9000 at EVERY bin -> all-bin tie -> bin 1
        (1, wav_of([9000] + [0] * 511)),
        # stronger high tone must win even though the low bin comes first
        (2, two_tone(5, 3000, 9, 9000)),
        # stronger low tone wins
        (3, two_tone(4, 9000, 11, 3000)),
    ]
    rows = [
        (
            doc_id,
            payload,
            {
                "mime": WAV_MIME,
                "n_bytes": len(payload),
                "checksum": hashlib.sha256(payload).hexdigest(),
            },
        )
        for doc_id, payload in cases
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["doc_id"]: r["dominant_bin"]
        for r in decode_spectral(media).collect()
    }
    assert got == {1: 1, 2: 9, 3: 4}, got


@given(data=st.data())
@settings(max_examples=8, deadline=None)
def test_asof_join_matches_pandas_merge_asof(spark, data):
    """asof_join (the union + per-key window formulation, E12) must agree
    row-for-row with pandas.merge_asof on randomized keyed series —
    backward semantics, per-key isolation, left rows before any right row
    getting NULL, and exact-timestamp matches included (non-strict) or
    excluded (strict). Right (key, ts) pairs are generated unique so the
    comparison is tie-free (the operator's same-ts tie-break is its own
    documented rule; pandas uses input order)."""
    import pandas as pd

    from hadoop_trans_spark.operators.asof import asof_join

    keys = st.integers(min_value=0, max_value=3)
    ts = st.integers(min_value=0, max_value=50)
    left_rows = data.draw(
        st.lists(st.tuples(keys, ts), min_size=1, max_size=25)
    )
    right_pairs = data.draw(
        st.lists(st.tuples(keys, ts), min_size=1, max_size=25, unique=True)
    )
    strict = data.draw(st.booleans())

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        "k long, lts long, lid long",
    )
    right = spark.createDataFrame(
        [(k, t, k * 1000 + t) for (k, t) in right_pairs],
        "k long, rts long, rval long",
    )
    got = {
        r["lid"]: r["rval"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            value_cols=["rval"], strict=strict,
        ).collect()
    }

    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "lts", "lid"],
    ).sort_values("lts", kind="stable")
    rpd = pd.DataFrame(
        [(k, t, k * 1000 + t) for (k, t) in right_pairs],
        columns=["k", "rts", "rval"],
    ).sort_values("rts", kind="stable")
    want_df = pd.merge_asof(
        lpd, rpd, left_on="lts", right_on="rts", by="k",
        direction="backward", allow_exact_matches=not strict,
    )
    want = {
        int(r.lid): (None if pd.isna(r.rval) else int(r.rval))
        for r in want_df.itertuples()
    }
    assert got == want, (strict, got, want)


@given(data=st.data())
@settings(max_examples=8, deadline=None)
def test_minhash_near_duplicates_sound_and_finds_exact_dups(spark, data):
    """near_duplicates soundness on random corpora: every reported pair's
    jaccard must equal the exact shingle-set Jaccard of the Python model
    (split-on-space word k-grams, short docs collapsing to one shingle)
    and clear the threshold; and the one pair LSH can never miss — two
    IDENTICAL docs (equal signatures ⇒ equal band keys ⇒ guaranteed
    candidate) — must always be reported with jaccard 1."""
    from hadoop_trans_spark.operators.minhash import near_duplicates

    K, THRESH = 3, 0.3
    word = st.sampled_from(["a", "b", "c", "d"])
    texts = data.draw(
        st.lists(
            st.lists(word, min_size=1, max_size=12).map(" ".join),
            min_size=2,
            max_size=7,
        )
    )
    texts = [texts[0]] + texts  # doc 0 and doc 1 identical by construction

    def shingles(t: str) -> frozenset:
        ws = t.split(" ")
        return frozenset(
            " ".join(ws[i : i + K]) for i in range(max(len(ws) - K + 1, 1))
        )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = near_duplicates(
        df, shingle_k=K, n_hashes=8, bands=4, threshold=THRESH
    ).collect()

    reported = {}
    for r in got:
        a, b = r["id_a"], r["id_b"]
        assert a != b
        sa, sb = shingles(texts[a]), shingles(texts[b])
        exact = len(sa & sb) / len(sa | sb)
        assert exact >= THRESH, (a, b, exact)
        assert abs(r["jaccard"] - exact) < 1e-6, (a, b, r["jaccard"], exact)
        reported[frozenset((a, b))] = r["jaccard"]

    assert reported.get(frozenset((0, 1))) == 1.0, reported


@given(data=st.data())
@settings(max_examples=6, deadline=None)
def test_sessionize_matches_python_fold_with_duplicate_timestamps(
    spark, data, tmp_path_factory
):
    """q81 batch sessionization vs an independent Python fold on random
    event streams that the fixture can't guarantee to contain: duplicate
    (user, ts) pairs (tie-broken by event_id), gaps exactly AT the
    30-minute boundary (>= semantics), and sub-second straddles. Session
    numbering, per-session counts and sums must all agree."""
    import datetime as dt

    from hadoop_trans_spark.queries import QUERIES

    users = st.integers(min_value=1, max_value=3)
    # seconds offsets up to 2h, drawn coarse so boundary gaps (exactly
    # 1800 s) and duplicates are common
    secs = st.integers(min_value=0, max_value=7200).map(lambda s: s - s % 300)
    rows = data.draw(
        st.lists(st.tuples(users, secs), min_size=1, max_size=30)
    )
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    events = [
        (
            i,  # event_id: unique, the tie-break
            base + dt.timedelta(seconds=s),
            u,
            "click",
            float(i % 7) + 0.25,
            "{}",
        )
        for i, (u, s) in enumerate(rows)
    ]
    d = tmp_path_factory.mktemp("sess")
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))

    got = [
        (r["user_id"], r["session_no"], r["session_start"], r["n_events"],
         round(r["value_sum"], 6))
        for r in QUERIES["q81_sessionize_batch"](spark, str(d)).collect()
    ]

    # independent model: sort by (ts, event_id) per user, gap >= 1800 s
    # opens a session
    want = []
    byu: dict[int, list] = {}
    for eid, ts, u, _t, v, _p in events:
        byu.setdefault(u, []).append((ts, eid, v))
    for u in sorted(byu):
        sid = 0
        prev = None
        sess: dict[int, list] = {}
        for ts, eid, v in sorted(byu[u]):
            if prev is None or (ts - prev).total_seconds() >= 1800:
                sid += 1
            sess.setdefault(sid, []).append((ts, v))
            prev = ts
        for s in sorted(sess):
            pts = sess[s]
            us = int(min(t for t, _ in pts).timestamp() * 1_000_000)
            want.append(
                (u, s, us, len(pts), round(sum(v for _, v in pts), 6))
            )
    assert got == want, (got, want)


@given(data=st.data())
@settings(max_examples=6, deadline=None)
def test_simhash_matches_python_model_and_blocking_is_exact(spark, data):
    """simhash fingerprints must equal the independent Python model
    (md5 hex-digit parity votes per lowercased word-3-gram shingle), and
    hamming_pairs' segment blocking must be EXACT — by pigeonhole any
    pair within the distance budget shares a segment, so the result must
    equal brute-force all-pairs hamming: every close pair reported once
    with the right distance, no far pair reported."""
    import hashlib as hl

    from hadoop_trans_spark.operators.simhash import hamming_pairs, simhash

    word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
    texts = data.draw(
        st.lists(
            st.lists(word, min_size=1, max_size=10).map(" ".join),
            min_size=2,
            max_size=8,
        )
    )
    # plant one exact duplicate so at least one 0-distance pair exists
    texts = texts + [texts[0]]

    def model_fp(t: str) -> int:
        ws = t.lower().split(" ")
        sh = {
            " ".join(ws[i : i + 3]) for i in range(max(len(ws) - 2, 1))
        }
        votes = [0] * 64
        for tok in sh:
            dig = hl.md5(tok.encode()).hexdigest()
            for b in range(64):
                votes[b] += (int(dig[b // 4], 16) >> (b % 4)) & 1
        n = len(sh)
        fp = sum(1 << b for b in range(63) if 2 * votes[b] - n > 0)
        if 2 * votes[63] - n > 0:
            fp -= 1 << 63  # bigint sign bit (64-bit widening, r13)
        return fp

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sim = simhash(df)
    got_fp = {r["id"]: r["simhash"] for r in sim.collect()}
    want_fp = {i: model_fp(t) for i, t in enumerate(texts)}
    assert got_fp == want_fp

    got_pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(sim, max_distance=3).collect()
    }
    want_pairs = {}
    ids = sorted(want_fp)
    for i in ids:
        for j in ids:
            if i < j:
                d = bin((want_fp[i] ^ want_fp[j]) & ((1 << 64) - 1)).count("1")
                if d <= 3:
                    want_pairs[(i, j)] = d
    assert got_pairs == want_pairs, (got_pairs, want_pairs)


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=10, deadline=None)
def test_zvalue_spark_sql_and_python_models_agree(spark, pts):
    """The Morton code is emitted twice (Spark Column ops, DuckDB SQL
    string) from the same bit loop; both must equal an independent
    Python interleave for all 8-bit inputs, or z-order layouts and
    their oracles silently diverge."""
    import duckdb

    from hadoop_trans_spark.operators.zorder import zvalue, zvalue_sql

    def morton(x: int, y: int) -> int:
        return sum(
            (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))
            for i in range(8)
        )

    df = spark.createDataFrame(pts, "x int, y int")
    got_spark = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    }
    con = duckdb.connect()
    got_sql = {
        (x, y): con.execute(
            f"SELECT {zvalue_sql(str(x), str(y))}"
        ).fetchone()[0]
        for (x, y) in set(pts)
    }
    for x, y in set(pts):
        want = morton(x, y)
        assert got_spark[(x, y)] == want, (x, y, got_spark[(x, y)], want)
        assert got_sql[(x, y)] == want, (x, y, got_sql[(x, y)], want)


def test_o_davg_half_up_tie_matches_spark_decimal_division(spark):
    """r10 edge-probe find (q159): DuckDB's `/` on a DECIMAL goes through
    DOUBLE, so a mean landing exactly on a .5 tie at 1e-6 rounds DOWN
    (4797.0070425 evaluates as ...2499999) while Spark's decimal division
    is exact with HALF_UP (-> 4797.007043; away from zero on negatives).
    o_davg now computes the mean integer-side in DuckDB — this pins the
    exact tie on both engines, both signs. The two inputs are exact
    6-decimal values (double<->decimal round-trips losslessly), so the
    .5 tie at the output scale is constructed, not drawn."""
    import duckdb

    from hadoop_trans_spark.queries.base import DEC, o_davg

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS "
        "SELECT CAST(4797.007042 AS DOUBLE) AS v, 1 AS g UNION ALL "
        "SELECT CAST(4797.007043 AS DOUBLE), 1 UNION ALL "
        "SELECT CAST(-4797.007042 AS DOUBLE), 2 UNION ALL "
        "SELECT CAST(-4797.007043 AS DOUBLE), 2"
    )
    got = dict(
        con.execute(
            f"SELECT g, {o_davg('v', count='COUNT(*)')} FROM t GROUP BY g"
        ).fetchall()
    )
    con.close()
    sdf = spark.createDataFrame(
        [(4797.007042, 1), (4797.007043, 1), (-4797.007042, 2), (-4797.007043, 2)],
        "v double, g int",
    )
    srows = {
        r["g"]: r["m"]
        for r in sdf.groupBy("g")
        .agg(
            F.round(F.sum(F.col("v").cast(DEC)) / F.count("*"), 6)
            .cast("double")
            .alias("m")
        )
        .collect()
    }
    assert got == srows == {1: 4797.007043, 2: -4797.007043}
