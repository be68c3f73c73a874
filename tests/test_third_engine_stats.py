"""Third-engine rederivations for the statistical queries.

The driver's DuckDB oracles are an independent ENGINE but share the
repo-authored SQL, so a misconception encoded in both the Spark code and
its oracle string would pass every sweep. These tests break that
correlation: each statistic is re-derived from the raw parquet with
numpy/pandas from the TEXTBOOK definition (no repo SQL, no repo
operators) and compared to the query's full output.

Definitions pinned here: Gini via the sorted-rank identity
2Σi·x_i/(nΣx) − (n+1)/n; two-sample KS as sup|ECDF_a − ECDF_b| with the
1.358√((n+m)/nm) 95% critical value; Wilson score interval; the
Wald-Wolfowitz runs z with ties-at-median dropped; the 2×2 odds ratio
with a log-space Wald CI; mutual information Σ p(x,y)·ln(p(x,y)/p(x)p(y));
Lorenz shares at ceil(d·n/10) rank cuts; PSI Σ(p−q)·ln(p/q) over
fixed-width bins with one-sided-empty bins excluded.

Scale parameterization: the module reads the fixture via the smoke_dir
fixture (env SF_SMOKE_DIR, default sf0.001); run it at sf0.01 too when
touched —

    SF_SMOKE_DIR=/root/testdata/sf0.01 python -m pytest \
        tests/test_third_engine_stats.py -q

the sf0.01 pass caught a real model-side HALF_EVEN-at-boundary bug the
sf0.001 data never hit. A few tests pin sf0.01 internally because the
sf0.001 fixture makes them vacuous (geo pairs, Q7 bilateral rows, Q17
qualifying lines). Rounding rule for new models: quantize EXACT decimal
sums with ROUND_HALF_UP at every grain Spark rounds at — never convert
to float before the final round (float round() is HALF_EVEN).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from hadoop_trans_spark.queries import QUERIES

Z95 = 1.959964


def _df(sql: str) -> pd.DataFrame:
    return duckdb.sql(sql).df()


def _rows(spark, smoke_dir, name):
    return [r.asDict() for r in QUERIES[name](spark, smoke_dir).collect()]


def test_gini_matches_sorted_rank_identity(spark, smoke_dir):
    got = _rows(spark, smoke_dir, "q232_gini_spend")[0]
    sp = _df(
        f"select o_custkey, cast(round(sum(cast(o_totalprice as "
        f"decimal(38,6))),6) as double) as v from "
        f"read_parquet('{smoke_dir}/orders.parquet') group by 1"
    )
    x = np.sort(sp["v"].to_numpy())
    n = len(x)
    i = np.arange(1, n + 1)
    gini = 2 * np.sum(i * x) / (n * np.sum(x)) - (n + 1) / n
    assert got["n_customers"] == n
    assert got["total_spend"] == round(float(np.sum(x)), 6)
    assert got["gini"] == round(float(gini), 6)


def test_ks_matches_ecdf_sup(spark, smoke_dir):
    got = _rows(spark, smoke_dir, "q233_ks_test")[0]
    o = _df(
        f"select o_totalprice as x, o_orderdate as d from "
        f"read_parquet('{smoke_dir}/orders.parquet')"
    )
    pre = o[o["d"] < pd.Timestamp("1996-01-01")]["x"].to_numpy()
    cur = o[o["d"] >= pd.Timestamp("1996-01-01")]["x"].to_numpy()
    allv = np.unique(np.concatenate([pre, cur]))
    fa = np.searchsorted(np.sort(pre), allv, side="right") / len(pre)
    fb = np.searchsorted(np.sort(cur), allv, side="right") / len(cur)
    d = float(np.max(np.abs(fa - fb)))
    crit = 1.358 * math.sqrt((len(pre) + len(cur)) / (len(pre) * len(cur)))
    assert got["n_ref"] == len(pre) and got["n_cur"] == len(cur)
    assert got["ks_d"] == round(d, 6)
    assert got["d_crit_95"] == round(crit, 6)
    assert got["reject_same_dist"] == int(d > crit)


def test_wilson_matches_score_interval(spark, smoke_dir):
    got = {r["nation"]: r for r in _rows(spark, smoke_dir, "q230_wilson_intervals")}
    t = _df(
        f"select c.c_nationkey as nation, count(*) as n, "
        f"sum(cast(o.o_orderstatus='F' as int)) as k "
        f"from read_parquet('{smoke_dir}/orders.parquet') o "
        f"join read_parquet('{smoke_dir}/customer.parquet') c "
        f"on o.o_custkey=c.c_custkey group by 1"
    )
    assert set(got) == set(t["nation"].astype(int))
    for _, r in t.iterrows():
        n, k = float(r["n"]), float(r["k"])
        p = k / n
        center = p + Z95 * Z95 / (2 * n)
        half = Z95 * math.sqrt(p * (1 - p) / n + Z95 * Z95 / (4 * n * n))
        den = 1 + Z95 * Z95 / n
        g = got[int(r["nation"])]
        assert (g["n"], g["k"]) == (int(n), int(k))
        assert g["p_hat"] == round(p, 6)
        assert g["wilson_lo"] == round((center - half) / den, 6)
        assert g["wilson_hi"] == round((center + half) / den, 6)


def test_runs_test_matches_wald_wolfowitz(spark, smoke_dir):
    got = _rows(spark, smoke_dir, "q236_runs_test")[0]
    daily = _df(
        f"select l_shipdate as d, cast(round(sum(cast(l_extendedprice as "
        f"decimal(38,6))),6) as double) as rev from "
        f"read_parquet('{smoke_dir}/lineitem.parquet') group by 1 order by 1"
    )
    rev = daily["rev"].to_numpy()
    srt = np.sort(rev)
    m = srt[int(np.ceil(0.5 * len(srt))) - 1]  # discrete median
    s = (rev[rev != m] > m).astype(int)  # in day order, ties dropped
    runs = 1 + int(np.sum(s[1:] != s[:-1]))
    na, nb = float(s.sum()), float(len(s) - s.sum())
    exp = 2 * na * nb / (na + nb) + 1
    var = 2 * na * nb * (2 * na * nb - na - nb) / ((na + nb) ** 2 * (na + nb - 1))
    assert got["n_runs"] == runs
    assert (got["n_above"], got["n_below"]) == (int(na), int(nb))
    assert got["z"] == round((runs - exp) / math.sqrt(var), 6)


def test_odds_ratio_matches_2x2_wald(spark, smoke_dir):
    got = _rows(spark, smoke_dir, "q241_odds_ratio")[0]
    cust = _df(
        f"select c_custkey, c_acctbal from "
        f"read_parquet('{smoke_dir}/customer.parquet')"
    )
    v = np.sort(cust["c_acctbal"].to_numpy())
    m = v[int(np.ceil(0.5 * len(v))) - 1]
    outc = _df(
        f"select o_custkey, max(cast(o_orderstatus='F' as int)) as y from "
        f"read_parquet('{smoke_dir}/orders.parquet') group by 1"
    )
    mg = cust.merge(outc, left_on="c_custkey", right_on="o_custkey")
    e = (mg["c_acctbal"] > m).astype(int)
    y = mg["y"].astype(int)
    a = int(((e == 1) & (y == 1)).sum())
    b = int(((e == 1) & (y == 0)).sum())
    c = int(((e == 0) & (y == 1)).sum())
    d = int(((e == 0) & (y == 0)).sum())
    orr = a * d / (b * c)
    half = Z95 * math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert (got["a"], got["b"], got["c"], got["d"]) == (a, b, c, d)
    assert got["odds_ratio"] == round(orr, 6)
    assert got["or_lo"] == round(math.exp(math.log(orr) - half), 6)
    assert got["or_hi"] == round(math.exp(math.log(orr) + half), 6)


def test_mutual_information_matches_definition(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q214_mutual_information")
    j = _df(
        f"select o_orderpriority as x, c_mktsegment as y, count(*) as nxy "
        f"from read_parquet('{smoke_dir}/orders.parquet') o "
        f"join read_parquet('{smoke_dir}/customer.parquet') c "
        f"on o.o_custkey=c.c_custkey group by 1,2"
    )
    n = j["nxy"].sum()
    nx = j.groupby("x")["nxy"].sum()
    ny = j.groupby("y")["nxy"].sum()
    mi = 0.0
    pmi = {}
    for _, r in j.iterrows():
        pxy = r["nxy"] / n
        ratio = pxy / ((nx[r["x"]] / n) * (ny[r["y"]] / n))
        pmi[(r["x"], r["y"])] = round(math.log(ratio), 6)
        mi += round(pxy * math.log(ratio), 9)
    assert len(rows) == len(j)
    for g in rows:
        assert g["pmi"] == pmi[(g["x"], g["y"])], (g, pmi[(g["x"], g["y"])])
        assert g["mi_nats"] == round(mi, 6)


def test_lorenz_matches_rank_cut_shares(spark, smoke_dir):
    got = {r["decile"]: r for r in _rows(spark, smoke_dir, "q240_lorenz_curve")}
    sp = _df(
        f"select o_custkey, cast(round(sum(cast(o_totalprice as "
        f"decimal(38,6))),6) as double) as v from "
        f"read_parquet('{smoke_dir}/orders.parquet') group by 1"
    )
    v = np.sort(sp["v"].to_numpy())
    n = len(v)
    cum = np.cumsum(v)
    for d in range(1, 11):
        k = int(np.ceil(d * n / 10.0))
        assert got[d]["cutoff"] == round(float(v[k - 1]), 6)
        assert got[d]["cum_spend_share"] == round(float(cum[k - 1] / cum[-1]), 6)


def test_psi_matches_definition(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q228_psi_drift")
    o = _df(
        f"select o_totalprice as x, "
        f"(o_orderdate < timestamp '1996-01-01') as is_ref from "
        f"read_parquet('{smoke_dir}/orders.parquet')"
    )
    b = np.minimum(np.floor(o["x"].to_numpy() / 30000).astype(int), 19)
    ref = o["is_ref"].to_numpy()
    n_r, n_c = int(ref.sum()), int(len(ref) - ref.sum())
    psi = 0.0
    per_bin = {}
    for bin_ in np.unique(b):
        nr = int(((b == bin_) & ref).sum())
        nc = int(((b == bin_) & ~ref).sum())
        per_bin[int(bin_)] = (nr, nc)
        if nr > 0 and nc > 0:
            p, q = nr / n_r, nc / n_c
            psi += round((p - q) * math.log(p / q), 9)
    for g in rows:
        nr, nc = per_bin[g["bin"]]
        assert (g["n_ref"], g["n_cur"]) == (nr, nc)
        assert g["degenerate"] == int(nr == 0 or nc == 0)
        assert g["psi_total"] == round(psi, 6)


def test_benford_matches_decimal_first_digit_model(spark, smoke_dir):
    from decimal import ROUND_HALF_UP, Decimal

    got = {r["digit"]: r for r in _rows(spark, smoke_dir, "q195_benford_digits")}
    o = _df(
        f"select o_totalprice as x from "
        f"read_parquet('{smoke_dir}/orders.parquet') where o_totalprice >= 1.0"
    )
    counts = {d: 0 for d in range(1, 10)}
    for x in o["x"]:
        # decimal(18,2) cast = HALF_UP quantize of the decimal the float
        # prints as (totals originate from 2-dp decimal data)
        s = str(Decimal(repr(float(x))).quantize(Decimal("0.01"), ROUND_HALF_UP))
        counts[int(s[0])] += 1
    n = sum(counts.values())
    for d in range(1, 10):
        exp = math.log10(1 + 1 / d)
        g = got[d]
        assert g["observed"] == counts[d]
        assert g["expected_freq"] == round(exp, 6)
        assert g["chi2_term"] == round((counts[d] - n * exp) ** 2 / (n * exp), 6)


def test_daily_acf_matches_numpy_pearson_at_calendar_lags(spark, smoke_dir):
    got = {r["lag"]: r for r in _rows(spark, smoke_dir, "q196_daily_acf")}
    daily = _df(
        f"select l_shipdate as d, cast(round(sum(cast(l_extendedprice as "
        f"decimal(38,6))),6) as double) as rev from "
        f"read_parquet('{smoke_dir}/lineitem.parquet') group by 1"
    )
    rev = dict(zip(pd.to_datetime(daily["d"]), daily["rev"]))
    for lag in range(1, 8):
        xs, ys = [], []
        for day, x in rev.items():
            other = day + pd.Timedelta(days=lag)
            if other in rev:
                xs.append(x)
                ys.append(rev[other])
        r = float(np.corrcoef(np.array(xs), np.array(ys))[0, 1])
        assert got[lag]["n_pairs"] == len(xs)
        # numpy's centered two-pass Pearson vs the query's decimal-exact
        # moment formula: equal to well under the 1e-6 output rounding
        assert abs(got[lag]["acf"] - r) <= 2e-6, (lag, got[lag]["acf"], r)


def test_key_skew_profile_matches_numpy_histogram_stats(spark, smoke_dir):
    got = {r["key_col"]: r for r in _rows(spark, smoke_dir, "q137_key_skew_profile")}
    for key_col, tbl, col in (
        ("l_suppkey", "lineitem", "l_suppkey"),
        ("o_custkey", "orders", "o_custkey"),
    ):
        counts = _df(
            f"select {col} as k, count(*) as c from "
            f"read_parquet('{smoke_dir}/{tbl}.parquet') group by 1"
        )["c"].to_numpy()
        g = got[key_col]
        n_keys, n_rows = len(counts), int(counts.sum())
        assert (g["n_keys"], g["n_rows"], g["max_c"]) == (
            n_keys,
            n_rows,
            int(counts.max()),
        )
        assert g["max_share"] == round(float(counts.max()) / n_rows, 6)
        # Spark percentile(col, p, freq) == numpy linear interpolation
        # over the expanded per-key count array
        p50, p99 = np.percentile(counts, [50, 99], method="linear")
        assert g["p50_c"] == round(round(float(p50), 9), 6)
        assert g["p99_c"] == round(round(float(p99), 9), 6)
        c = np.sort(counts)
        i = np.arange(1, n_keys + 1)
        gini = 2 * np.sum(i * c) / (n_keys * np.sum(c)) - (n_keys + 1) / n_keys
        assert g["gini"] == round(float(gini), 6)


def test_decile_lift_matches_pandas_rank_cut(spark, smoke_dir):
    got = {r["decile"]: r for r in _rows(spark, smoke_dir, "q182_decile_lift")}
    c = _df(
        f"select c_custkey, c_acctbal from "
        f"read_parquet('{smoke_dir}/customer.parquet')"
    )
    buyers = set(
        _df(
            f"select distinct o_custkey as k from "
            f"read_parquet('{smoke_dir}/orders.parquet')"
        )["k"]
    )
    c = c.sort_values(
        ["c_acctbal", "c_custkey"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)
    y = c["c_custkey"].isin(buyers).astype(int).to_numpy()
    n = len(c)
    base = y.sum() / n
    # NTILE: first n%10 tiles get n//10+1 rows, the rest n//10
    sizes = [(n // 10 + 1) if t < n % 10 else n // 10 for t in range(10)]
    start = 0
    for t, sz in enumerate(sizes, start=1):
        seg = y[start : start + sz]
        start += sz
        g = got[t]
        assert (g["n_cust"], g["n_conv"]) == (sz, int(seg.sum()))
        rate = seg.sum() / sz
        assert g["conv_rate"] == round(rate, 6)
        assert g["lift"] == round(rate / base, 6)
    assert start == n


def test_inverted_index_matches_python_model(spark, smoke_dir):
    import re

    got = {r["term"]: r for r in _rows(spark, smoke_dir, "q110_inverted_index")}
    docs = _df(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    postings: dict[str, set] = {}
    for _, r in docs.iterrows():
        for t in set(re.split(r"[^a-z]+", str(r["text"]).lower())):
            if len(t) >= 4:
                postings.setdefault(t, set()).add(int(r["doc_id"]))
    want = {
        t: (len(ids), ",".join(str(i) for i in sorted(ids)[:10]))
        for t, ids in postings.items()
        if len(ids) >= 25
    }
    assert len(got) == len(want) > 0
    for t, (df_, p10) in want.items():
        assert (got[t]["df"], got[t]["postings10"]) == (df_, p10), t


def test_token_ids_match_python_frequency_ranked_vocab(spark, smoke_dir):
    import re
    from collections import Counter

    got = {r["doc_id"]: r for r in _rows(spark, smoke_dir, "q130_token_ids")}
    docs = _df(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    streams = {}
    counts: Counter = Counter()
    for _, r in docs.iterrows():
        toks = [
            t
            for t in re.split(r"[^a-z]+", str(r["text"]).lower())
            if len(t) >= 1
        ]
        streams[int(r["doc_id"])] = toks
        counts.update(toks)
    vocab = {
        w: i + 1
        for i, (w, _) in enumerate(
            sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    assert len(got) == len(streams)
    for doc_id, toks in streams.items():
        g = got[doc_id]
        assert g["n_tokens"] == len(toks)
        assert g["ids12"] == ",".join(str(vocab[t]) for t in toks[:12])


def test_group_trend_ols_matches_numpy_lstsq(spark, smoke_dir):
    got = {r["prio"]: r for r in _rows(spark, smoke_dir, "q117_group_trend_ols")}
    daily = _df(
        f"select o_orderpriority as prio, "
        f"datediff('day', date '1970-01-01', cast(o_orderdate as date)) as x, "
        f"count(*) as y from read_parquet('{smoke_dir}/orders.parquet') "
        f"group by 1,2"
    )
    for prio, grp in daily.groupby("prio"):
        x = grp["x"].to_numpy(dtype=float)
        y = grp["y"].to_numpy(dtype=float)
        # textbook least squares via the normal-equation solve
        A = np.vstack([x, np.ones_like(x)]).T
        slope, intercept = np.linalg.lstsq(A, y, rcond=None)[0]
        g = got[prio]
        assert g["n"] == len(grp)
        # the query computes exact-decimal moments then rounds the slope
        # at 1e-8 and re-uses the ROUNDED slope in the intercept; allow
        # lstsq float error under both output grains
        assert abs(g["slope"] - slope) <= 1e-7, (prio, g["slope"], slope)
        assert abs(g["intercept"] - intercept) <= 1e-3, (
            prio,
            g["intercept"],
            intercept,
        )


def test_equidepth_boundaries_match_numpy_rank_cuts(spark, smoke_dir):
    got = {r["j"]: r for r in _rows(spark, smoke_dir, "q216_equidepth_histogram")}
    x = np.sort(
        _df(
            f"select o_totalprice as x from "
            f"read_parquet('{smoke_dir}/orders.parquet')"
        )["x"].to_numpy()
    )
    n = len(x)
    prev_cum = 0
    for j in range(1, 11):
        hi = x[int(np.ceil(j * n / 10.0)) - 1]  # value at the rank cut
        cum = int(np.searchsorted(x, hi, side="right"))
        g = got[j]
        assert g["hi"] == round(float(hi), 6), (j, g["hi"], hi)
        assert g["n_rows"] == cum - prev_cum, (j, g["n_rows"], cum - prev_cum)
        prev_cum = cum


def test_rfm_segments_match_pandas_quintile_cuts(spark, smoke_dir):
    got = {
        (r["r_bin"], r["f_bin"], r["m_bin"]): r
        for r in _rows(spark, smoke_dir, "q220_rfm_segments")
    }
    o = _df(
        f"select o_custkey, cast(o_orderdate as date) as d, o_totalprice "
        f"as p from read_parquet('{smoke_dir}/orders.parquet')"
    )
    anchor = o["d"].max()
    per = o.groupby("o_custkey").agg(
        last=("d", "max"), freq=("p", "size"), mon=("p", "sum")
    )
    per["rec"] = (anchor - per["last"]).apply(lambda td: td.days)
    per["mon"] = per["mon"].round(6)

    def cut4(vals):
        v = np.sort(vals.to_numpy())
        n = len(v)
        return [v[int(np.ceil(j * n / 5.0)) - 1] for j in range(1, 5)]

    rc, fc, mc = cut4(per["rec"]), cut4(per["freq"]), cut4(per["mon"])
    want: dict = {}
    for _, r in per.iterrows():
        key = (
            1 + sum(r["rec"] > c for c in rc),
            1 + sum(r["freq"] > c for c in fc),
            1 + sum(r["mon"] > c for c in mc),
        )
        cnt, tot = want.get(key, (0, 0.0))
        want[key] = (cnt + 1, tot + r["mon"])
    assert set(got) == set(want)
    for key, (cnt, tot) in want.items():
        assert got[key]["n_customers"] == cnt, key
        assert abs(got[key]["avg_monetary"] - tot / cnt) <= 1e-6, key


def test_bm25_topk_matches_python_model(spark, smoke_dir):
    import re
    from collections import Counter

    rows = _rows(spark, smoke_dir, "q133_bm25_topk")
    docs = _df(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    tf: dict[int, Counter] = {}
    for _, r in docs.iterrows():
        toks = [
            t
            for t in re.split(r"[^a-z]+", str(r["text"]).lower())
            if len(t) >= 4
        ]
        tf[int(r["doc_id"])] = Counter(toks)
    n_docs = len(docs)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    dfreq: Counter = Counter()
    for c in tf.values():
        dfreq.update(c.keys())
    avgdl = round(sum(dl.values()) / len(dl), 9)
    qterms = [
        w for w, _ in sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    ]
    scores = {}
    for d, c in tf.items():
        s, hit = 0.0, 0
        for w in qterms:
            if c[w] > 0:
                idf = math.log(
                    (n_docs - dfreq[w] + 0.5) / (dfreq[w] + 0.5) + 1.0
                )
                tfc = (c[w] * 2.2) / (
                    c[w] + 1.2 * (0.25 + 0.75 * (dl[d] / avgdl))
                )
                s += round(idf * tfc, 9)
                hit += 1
        if hit:
            scores[d] = (hit, round(s, 6))
    top = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    want = {d: v for d, v in top}
    assert len(rows) == len(want)
    for g in rows:
        hit, s = want[g["doc_id"]]
        assert (g["n_terms"], g["bm25"]) == (hit, s), g


def test_vocab_coverage_matches_python_zipf_curve(spark, smoke_dir):
    import re
    from collections import Counter

    got = {r["k"]: r for r in _rows(spark, smoke_dir, "q226_vocab_coverage")}
    docs = _df(
        f"select text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    counts: Counter = Counter()
    for t in docs["text"]:
        counts.update(
            w for w in re.split(r"[^a-z]+", str(t).lower()) if w
        )
    total = sum(counts.values())
    ordered = [
        c for _, c in sorted(
            ((w, c) for w, c in counts.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )
    ]
    for k in (10, 50, 100, 500, 1000):
        covered = sum(ordered[:k])
        g = got[k]
        assert (g["covered_tokens"], g["total_tokens"]) == (covered, total)
        assert g["coverage"] == round(covered / total, 6)


def test_adamic_adar_matches_python_graph_model(spark, smoke_dir):
    from collections import defaultdict
    from itertools import combinations

    rows = _rows(spark, smoke_dir, "q204_adamic_adar")
    li = _df(
        f"select distinct l_orderkey as o, l_partkey as p from "
        f"read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    # co-purchase edges: parts sharing an order (u < v, distinct)
    by_order = defaultdict(set)
    for _, r in li.iterrows():
        by_order[int(r["o"])].add(int(r["p"]))
    edges = set()
    for parts in by_order.values():
        for u, v in combinations(sorted(parts), 2):
            edges.add((u, v))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    # hub prune (degree > 64) and deg-1 exclusion on the INTERMEDIATE
    scores: dict = {}
    common: dict = {}
    for node, nbrs in adj.items():
        d = len(nbrs)
        if d > 64 or d <= 1:
            continue
        w = round(1.0 / math.log(d), 9)
        for a, b in combinations(sorted(nbrs), 2):
            scores[(a, b)] = scores.get((a, b), 0.0) + w
            common[(a, b)] = common.get((a, b), 0) + 1
    cand = [
        (round(s, 6), u, v, common[(u, v)])
        for (u, v), s in scores.items()
        if (u, v) not in edges
    ]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = cand[:20]
    assert len(rows) == len(want)
    for g, (s, u, v, c) in zip(rows, want):
        assert (g["u"], g["v"], g["common"], g["aa_score"]) == (u, v, c, s)


def test_tfidf_cosine_pairs_match_python_sparse_model(spark, smoke_dir):
    import re
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal
    from itertools import combinations

    def rnd(x: float, places: int) -> Decimal:
        return Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-places), ROUND_HALF_UP
        )

    rows = _rows(spark, smoke_dir, "q131_tfidf_cosine_pairs")
    docs = _df(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    tf: dict[int, Counter] = {
        int(r["doc_id"]): Counter(
            w for w in re.split(r"[^a-z]+", str(r["text"]).lower()) if w
        )
        for _, r in docs.iterrows()
    }
    n = len(tf)
    dfreq: Counter = Counter()
    for c in tf.values():
        dfreq.update(c.keys())
    idf = {w: float(rnd(math.log(n / d), 6)) for w, d in dfreq.items()}
    wt = {
        d: {w: c * idf[w] for w, c in cnt.items()} for d, cnt in tf.items()
    }
    nrm = {
        d: math.sqrt(float(sum(rnd(x * x, 9) for x in ws.values())))
        for d, ws in wt.items()
    }
    cap = max(50, n // 10)
    postings = defaultdict(set)
    for d, cnt in tf.items():
        for w in cnt:
            if 2 <= dfreq[w] <= cap:
                postings[w].add(d)
    cand = set()
    for ds in postings.values():
        cand.update(combinations(sorted(ds), 2))
    best: dict[int, tuple] = {}
    for a, b in cand:
        if nrm[a] == 0 or nrm[b] == 0:
            continue
        shared = set(wt[a]) & set(wt[b])
        dot = float(sum(rnd(wt[a][w] * wt[b][w], 9) for w in shared))
        cos = dot / (nrm[a] * nrm[b])
        if cos < 0.3:
            continue
        c4 = float(rnd(cos, 4))
        for x, y in ((a, b), (b, a)):
            cur = best.get(x)
            if cur is None or (-c4, y) < cur:
                best[x] = (-c4, y)
    want = {d: (y, -negc) for d, (negc, y) in best.items()}
    assert len(rows) == len(want)
    for g in rows:
        assert (g["best_match"], g["cosine"]) == want[g["doc_id"]], g


def test_countmin_matches_python_sketch_model(spark, smoke_dir):
    import hashlib as hl
    from collections import Counter

    rows = _rows(spark, smoke_dir, "q164_countmin_freq")
    keys = _df(
        f"select l_partkey as k from read_parquet('{smoke_dir}/lineitem.parquet')"
    )["k"].astype(int).tolist()

    def cells4(k: int) -> list[int]:
        hh = hl.md5(str(k).encode()).hexdigest()
        return [int(hh[8 * j : 8 * j + 8], 16) % 1024 for j in range(4)]

    table_ = [Counter() for _ in range(4)]
    exact: Counter = Counter()
    for k in keys:
        exact[k] += 1
        for j, c in enumerate(cells4(k)):
            table_[j][c] += 1
    want = {}
    for k in exact:
        if k % 97 == 0:
            est = min(table_[j][c] for j, c in enumerate(cells4(k)))
            want[k] = (exact[k], est)
    assert len(rows) == len(want)
    for g in rows:
        ex, est = want[g["l_partkey"]]
        assert (g["exact_n"], g["cm_est"]) == (ex, est), g
        assert g["never_underestimates"] == 1


def test_ab_ztest_matches_python_pooled_formula(spark, smoke_dir):
    import hashlib as hl

    got = _rows(spark, smoke_dir, "q199_ab_ztest")[0]
    ev = _df(
        f"select user_id, event_type, value from "
        f"read_parquet('{smoke_dir}/events.parquet')"
    )
    conv: dict = {}
    for _, r in ev.iterrows():
        u = int(r["user_id"])
        variant = (
            "A"
            if hl.md5(str(u).encode()).hexdigest()[0] in "02468ace"
            else "B"
        )
        hit = int(r["event_type"] == "purchase" and r["value"] > 180.0)
        k = (u, variant)
        conv[k] = max(conv.get(k, 0), hit)
    na = sum(1 for (_, v) in conv if v == "A")
    nb = sum(1 for (_, v) in conv if v == "B")
    ca = sum(c for (_, v), c in conv.items() if v == "A")
    cb = sum(c for (_, v), c in conv.items() if v == "B")
    pooled = (ca + cb) / (na + nb)
    se = math.sqrt(pooled * (1 - pooled) * (1 / na + 1 / nb))
    z = (ca / na - cb / nb) / se
    assert (got["n_a"], got["conv_a"], got["n_b"], got["conv_b"]) == (
        na,
        ca,
        nb,
        cb,
    )
    assert got["z"] == round(z, 6)
    assert got["significant"] == int(abs(z) > 1.959964)


def test_embedding_covariance_matches_numpy_gram(spark, smoke_dir):
    got = {(r["i"], r["j"]): r["cov"] for r in _rows(spark, smoke_dir, "q211_embedding_covariance")}
    emb = _df(
        f"select embedding from read_parquet('{smoke_dir}/embeddings.parquet')"
    )
    x = np.array(
        [np.asarray(e[:8], dtype=np.float64) for e in emb["embedding"]]
    )
    n = len(x)
    for i in range(8):
        for j in range(i, 8):
            cov = float(np.mean(x[:, i] * x[:, j]) - x[:, i].mean() * x[:, j].mean())
            # the query rounds per-row products at 1e-9 and means exactly;
            # numpy means in float64 — equal far inside the 1e-6 grain
            assert abs(got[(i, j)] - cov) <= 2e-6, (i, j, got[(i, j)], cov)
    assert len(got) == 36


def test_cusum_changepoint_matches_python_fold(spark, smoke_dir):
    from decimal import ROUND_HALF_UP, Decimal

    def rnd6(x: float) -> Decimal:
        return Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )

    got = {
        r["event_type"]: r
        for r in _rows(spark, smoke_dir, "q177_cusum_changepoint")
    }
    daily = _df(
        f"select event_type as t, strftime(date_trunc('day', ts), '%Y-%m-%d')"
        f" as day, cast(round(sum(cast(value as decimal(38,6))),6) as double)"
        f" as x from read_parquet('{smoke_dir}/events.parquet') group by 1,2"
    )
    for t, grp in daily.groupby("t"):
        grp = grp.sort_values("day")
        mu = float(sum(Decimal(repr(float(v))) for v in grp["x"])) / len(grp)
        c = Decimal(0)
        best = None  # (-|c|, day) minimal = peak magnitude, earliest day
        for _, r in grp.iterrows():
            c += rnd6(float(r["x"]) - mu)
            key = (-abs(c), r["day"])
            if best is None or key < best:
                best = key
                best_c = c
        g = got[t]
        assert g["n_days"] == len(grp)
        assert g["changepoint_day"] == best[1], (t, g, best)
        assert g["cusum"] == float(best_c), (t, g, best_c)


def test_ohlc_bars_match_pandas_first_last(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q160_ohlc_bars")
    e = _df(
        f"select event_type as t, strftime(ts, '%Y-%m-%d') as day, value,"
        f" epoch_us(ts) as us, event_id from "
        f"read_parquet('{smoke_dir}/events.parquet')"
    )
    e = e.sort_values(["us", "event_id"], kind="stable")
    want = {}
    for (t, day), grp in e.groupby(["t", "day"], sort=False):
        v = grp["value"]
        want[(t, day)] = (
            float(v.iloc[0]),          # open: first by (ts, event_id)
            float(v.max()),
            float(v.min()),
            float(v.iloc[-1]),         # close: last by (ts, event_id)
            round(float(v.sum()), 6),
            len(grp),
        )
    assert len(rows) == len(want)
    for g in rows:
        o_, h, l, c, vol, n = want[(g["event_type"], g["day"])]
        assert (
            g["open"], g["high"], g["low"], g["close"], g["n"]
        ) == (o_, h, l, c, n), g
        assert abs(g["volume"] - vol) <= 1e-6, g


def test_transition_entropy_matches_python_shannon(spark, smoke_dir):
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    got = {
        r["user_id"]: r
        for r in _rows(spark, smoke_dir, "q217_transition_entropy")
    }
    e = _df(
        f"select user_id as u, event_type as t, epoch_us(ts) as us, event_id"
        f" as i from read_parquet('{smoke_dir}/events.parquet')"
    ).sort_values(["us", "i"], kind="stable")
    trans: dict = defaultdict(Counter)
    for u, grp in e.groupby("u", sort=False):
        ts_ = list(grp["t"])
        for a, b in zip(ts_, ts_[1:]):
            trans[int(u)][(a, b)] += 1
    assert set(got) == set(trans)
    for u, cnt in trans.items():
        n = sum(cnt.values())
        ent = float(
            sum(
                Decimal(repr(-(c / n) * math.log(c / n))).quantize(
                    Decimal(1).scaleb(-9), ROUND_HALF_UP
                )
                for c in cnt.values()
            ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        g = got[u]
        assert g["n_transitions"] == n, u
        assert g["entropy_nats"] == ent, (u, g, ent)


def test_decay_attribution_matches_python_model(spark, smoke_dir):
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    def rnd9(x: float) -> Decimal:
        return Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-9), ROUND_HALF_UP
        )

    got = {r["day"]: r for r in _rows(spark, smoke_dir, "q215_decay_attribution")}
    e = _df(
        f"select event_id, user_id, event_type, epoch_us(ts) as us,"
        f" strftime(ts, '%Y-%m-%d') as day, value from "
        f"read_parquet('{smoke_dir}/events.parquet')"
    )
    purchases = e[e["event_type"] == "purchase"]
    clicks = e[e["event_type"] == "click"]
    by_user = defaultdict(list)
    for _, r in clicks.iterrows():
        by_user[int(r["user_id"])].append((int(r["us"]), r["day"]))
    day_n: dict = defaultdict(int)
    day_credit: dict = defaultdict(Decimal)
    H24 = 24 * 3600 * 1_000_000
    for _, p in purchases.iterrows():
        touches = [
            (cus, cday, rnd9(1.0 / (1.0 + (int(p["us"]) - cus) // 3600000000)))
            for cus, cday in by_user.get(int(p["user_id"]), [])
            if cus < int(p["us"]) and cus >= int(p["us"]) - H24
        ]
        if not touches:
            continue
        sw = sum(w for _, _, w in touches)
        for _, cday, w in touches:
            day_n[cday] += 1
            day_credit[cday] += rnd9(
                float(p["value"]) * float(w) / float(sw)
            )
    assert set(got) == set(day_n)
    for day in day_n:
        g = got[day]
        assert g["n_touches"] == day_n[day], day
        assert g["credit"] == float(
            day_credit[day].quantize(Decimal("0.000001"), ROUND_HALF_UP)
        ), (day, g, day_credit[day])


def test_cohort_ltv_matches_pandas_cumulative_curve(spark, smoke_dir):
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    rows = _rows(spark, smoke_dir, "q235_cohort_ltv")
    e = _df(
        f"select user_id as u, event_type as t, value,"
        f" date_trunc('week', ts) as wk from "
        f"read_parquet('{smoke_dir}/events.parquet')"
    )
    first = e.groupby("u")["wk"].min()
    sizes = first.value_counts()
    rev: dict = defaultdict(Decimal)
    for _, r in e[e["t"] == "purchase"].iterrows():
        cohort = first[r["u"]]
        off = int((r["wk"] - cohort).days // 7)
        rev[(cohort, off)] += Decimal(repr(float(r["value"]))).quantize(
            Decimal("0.000001")
        )
    want = []
    for cohort in sorted({c for c, _ in rev}):
        cum = Decimal(0)
        for off in sorted(o for c, o in rev if c == cohort):
            cum += rev[(cohort, off)]
            want.append(
                (
                    cohort.strftime("%Y-%m-%d"),
                    off,
                    int(sizes[cohort]),
                    float(
                        (cum / int(sizes[cohort])).quantize(
                            Decimal("0.000001"), ROUND_HALF_UP
                        )
                    ),
                )
            )
    got = [
        (r["cohort"], r["offset_w"], r["cohort_users"], r["cum_ltv_per_user"])
        for r in rows
    ]
    assert got == want


def test_seasonality_strength_matches_anova_eta_squared(spark, smoke_dir):
    got = _rows(spark, smoke_dir, "q237_seasonality_strength")[0]
    daily = _df(
        f"select l_shipdate as d, cast(round(sum(cast(l_extendedprice as "
        f"decimal(38,6))),6) as double) as rev from "
        f"read_parquet('{smoke_dir}/lineitem.parquet') group by 1"
    )
    daily["dow"] = pd.to_datetime(daily["d"]).dt.dayofweek  # Mon=0
    rev = daily["rev"].to_numpy()
    n = len(rev)
    grand = rev.mean()
    ss_total = float(((rev - grand) ** 2).sum())
    ss_between = float(
        sum(
            len(g) * (g["rev"].mean() - grand) ** 2
            for _, g in daily.groupby("dow")
        )
    )
    eta = ss_between / ss_total
    assert got["n_days"] == n
    # textbook ANOVA decomposition vs the decimal moment identity:
    # equal far inside the 1e-6 output grain
    assert abs(got["eta_sq_dow"] - eta) <= 2e-6, (got["eta_sq_dow"], eta)


def test_spearman_matches_pandas_rank_correlation(spark, smoke_dir):
    got = {
        r["p_brand"]: r
        for r in _rows(spark, smoke_dir, "q181_spearman_by_brand")
    }
    j = _df(
        f"select p.p_brand as b, l.l_quantity as q, l.l_extendedprice as e "
        f"from read_parquet('{smoke_dir}/lineitem.parquet') l join "
        f"read_parquet('{smoke_dir}/part.parquet') p "
        f"on l.l_partkey = p.p_partkey"
    )
    for b, grp in j.groupby("b"):
        rq = grp["q"].rank(method="average").to_numpy()
        re_ = grp["e"].rank(method="average").to_numpy()
        # textbook Pearson of the average ranks
        rho = float(np.corrcoef(rq, re_)[0, 1])
        g = got[b]
        assert g["n"] == len(grp)
        assert abs(g["spearman_rho"] - rho) <= 2e-6, (b, g, rho)


def test_weighted_median_matches_numpy_cumweight_scan(spark, smoke_dir):
    got = {
        r["l_returnflag"]: r["weighted_median"]
        for r in _rows(spark, smoke_dir, "q156_weighted_median")
    }
    li = _df(
        f"select l_returnflag as f, l_extendedprice as p, l_quantity as w "
        f"from read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    for f, grp in li.groupby("f"):
        agg = grp.groupby("p")["w"].sum().sort_index()
        cw = agg.cumsum()
        t = agg.sum()
        med = float(cw.index[(2 * cw >= t).argmax()])
        assert got[f] == med, (f, got[f], med)


def test_zipf_slope_matches_numpy_loglog_fit(spark, smoke_dir):
    import re
    from collections import Counter

    got = _rows(spark, smoke_dir, "q188_zipf_slope")[0]
    docs = _df(
        f"select text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    counts: Counter = Counter()
    for t in docs["text"]:
        counts.update(w for w in re.split(r"[^a-z]+", str(t).lower()) if w)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    x = np.log(np.arange(1, len(top) + 1))
    y = np.log(np.array([c for _, c in top], dtype=float))
    A = np.vstack([x, np.ones_like(x)]).T
    slope, intercept = np.linalg.lstsq(A, y, rcond=None)[0]
    assert got["n_points"] == len(top)
    assert abs(got["zipf_slope"] - slope) <= 1e-6
    assert abs(got["intercept"] - intercept) <= 1e-5


def test_token_entropy_matches_python_unigram_model(spark, smoke_dir):
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    rows = _rows(spark, smoke_dir, "q134_token_entropy")
    docs = _df(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    want = {}
    for _, r in docs.iterrows():
        toks = [
            w for w in re.split(r"[^a-z]+", str(r["text"]).lower()) if w
        ]
        if not toks:
            continue
        cnt = Counter(toks)
        n = len(toks)
        ent = float(
            sum(
                Decimal(
                    repr(-(c / n) * math.log(c / n))
                ).quantize(Decimal(1).scaleb(-9), ROUND_HALF_UP)
                for c in cnt.values()
            ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        want[int(r["doc_id"])] = (
            n,
            len(cnt),
            ent,
            round(len(cnt) / n, 6),
        )
    assert len(rows) == len(want)
    for g in rows:
        n, ty, ent, ttr = want[g["doc_id"]]
        assert (
            g["n_tokens"], g["n_types"], g["entropy"], g["type_token_ratio"]
        ) == (n, ty, ent, ttr), g


def test_pmi_bigrams_match_python_collocation_model(spark, smoke_dir):
    import re
    from collections import Counter

    rows = _rows(spark, smoke_dir, "q126_pmi_bigrams")
    docs = _df(
        f"select text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in docs["text"]:
        toks = [w for w in re.split(r"[^a-z]+", str(t).lower()) if w]
        uni.update(toks)
        bi.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    tu, tb = sum(uni.values()), sum(bi.values())
    want = {}
    for bg, c in bi.items():
        if c >= 5:
            a, b = bg.split(" ")
            pmi = math.log((c / tb) / (uni[a] / tu) / (uni[b] / tu))
            want[(a, b)] = (c, round(pmi, 6))
    assert len(rows) == len(want) > 0
    for g in rows:
        c, pmi = want[(g["w1"], g["w2"])]
        assert g["n_pair"] == c
        assert abs(g["pmi"] - pmi) <= 1e-6, (g, pmi)


def test_unigram_logprob_matches_python_lm(spark, smoke_dir):
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    rows = _rows(spark, smoke_dir, "q118_unigram_logprob")
    docs = _df(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    streams = {
        int(r["doc_id"]): [
            w for w in re.split(r"[^a-z]+", str(r["text"]).lower()) if w
        ]
        for _, r in docs.iterrows()
    }
    vocab: Counter = Counter()
    for s in streams.values():
        vocab.update(s)
    total = float(sum(vocab.values()))
    logterm = {
        w: Decimal(repr(math.log(c / total))).quantize(
            Decimal(1).scaleb(-9), ROUND_HALF_UP
        )
        for w, c in vocab.items()
    }
    want = {}
    for d_, s in streams.items():
        if not s:
            continue
        mean = float(
            (sum(logterm[w] for w in s) / len(s)).quantize(
                Decimal("0.0001"), ROUND_HALF_UP
            )
        )
        want[d_] = (len(s), mean)
    assert len(rows) == len(want)
    for g in rows:
        n, mean = want[g["doc_id"]]
        assert (g["n_tokens"], g["mean_logprob"]) == (n, mean), g


def test_seasonal_anomaly_matches_numpy_hourly_baseline(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q159_seasonal_anomaly")
    e = _df(
        f"select event_type as t, cast(extract(hour from ts) as int) as hr,"
        f" value from read_parquet('{smoke_dir}/events.parquet')"
    )
    got = {(r["event_type"], r["hr"]): r for r in rows}
    for (t, hr), grp in e.groupby(["t", "hr"]):
        v = grp["value"].to_numpy()
        mean = round(float(v.sum()) / len(v), 6)
        m2 = round(float((v * v).sum()) / len(v), 6)
        var = round(m2 - mean * mean, 6)
        anoms = int(
            (np.round((v - mean) ** 2 - 9 * var, 6) > 0).sum()
        )
        g = got[(t, hr)]
        assert g["n"] == len(v)
        assert abs(g["mean_v"] - mean) <= 1e-6
        assert abs(g["variance"] - var) <= 2e-6
        assert g["n_anomalies"] == anoms, (t, hr, g, anoms)


def test_cohort_retention_matches_pandas_week_index_model(spark, smoke_dir):
    got = {
        (r["cohort_week"], r["week_offset"]): r
        for r in _rows(spark, smoke_dir, "q100_cohort_retention")
    }
    e = _df(
        f"select distinct user_id as u, "
        f"datediff('day', date '1970-01-01', cast(ts as date)) // 7 as wk "
        f"from read_parquet('{smoke_dir}/events.parquet')"
    )
    first = e.groupby("u")["wk"].min()
    sizes = first.value_counts()
    e["cohort"] = e["u"].map(first)
    e["off"] = e["wk"] - e["cohort"]
    want = e.groupby(["cohort", "off"]).size()
    assert len(got) == len(want)
    for (c, o), n in want.items():
        g = got[(c, o)]
        assert g["n_active"] == n
        assert g["retention"] == round(n / int(sizes[c]), 6)


def test_event_transitions_match_python_markov_counts(spark, smoke_dir):
    from collections import Counter

    rows = _rows(spark, smoke_dir, "q106_event_transitions")
    e = _df(
        f"select user_id as u, event_type as t, epoch_us(ts) as us,"
        f" event_id as i from read_parquet('{smoke_dir}/events.parquet')"
    ).sort_values(["us", "i"], kind="stable")
    cnt: Counter = Counter()
    for _, grp in e.groupby("u", sort=False):
        ts_ = list(grp["t"])
        cnt.update(zip(ts_, ts_[1:]))
    row_tot: Counter = Counter()
    for (a, _), n in cnt.items():
        row_tot[a] += n
    assert len(rows) == len(cnt)
    for g in rows:
        n = cnt[(g["event_type"], g["next_type"])]
        assert g["n"] == n, g
        assert g["p"] == round(n / row_tot[g["event_type"]], 6), g


def test_zscore_outliers_match_numpy_per_user_stats(spark, smoke_dir):
    got = {
        r["user_id"]: r
        for r in _rows(spark, smoke_dir, "q107_zscore_outliers")
    }
    daily = _df(
        f"select user_id as u, cast(date_trunc('day', ts) as date) as day,"
        f" cast(round(sum(cast(value as decimal(38,6))),6) as double) as v"
        f" from read_parquet('{smoke_dir}/events.parquet') group by 1,2"
    )
    want = {}
    for u, grp in daily.groupby("u"):
        v = grp["v"].to_numpy()
        if len(v) < 3:
            continue
        var = v.var(ddof=1)
        if var <= 0:
            continue
        z = np.round((v - v.mean()) / math.sqrt(var), 4)
        want[int(u)] = (int((np.abs(z) > 2).sum()), float(np.abs(z).max()))
    assert set(got) == set(want)
    for u, (n_out, mz) in want.items():
        g = got[u]
        assert g["n_outlier_days"] == n_out, u
        assert abs(g["max_abs_z"] - mz) <= 2e-4, (u, g, mz)


def test_fulfillment_latency_matches_numpy_percentiles(spark, smoke_dir):
    got = _rows(spark, smoke_dir, "q219_fulfillment_latency")[0]
    lat = _df(
        f"select datediff('day', cast(o.o_orderdate as date),"
        f" cast(min(l.l_shipdate) as date)) as days "
        f"from read_parquet('{smoke_dir}/orders.parquet') o join "
        f"read_parquet('{smoke_dir}/lineitem.parquet') l "
        f"on o.o_orderkey = l.l_orderkey group by o.o_orderkey, o.o_orderdate"
    )["days"].to_numpy()
    x = np.sort(lat)
    n = len(x)

    def disc(p: float) -> int:
        return int(x[int(np.ceil(p * n)) - 1])

    assert got["n_orders"] == n
    assert (got["p50_days"], got["p90_days"], got["p99_days"]) == (
        disc(0.50),
        disc(0.90),
        disc(0.99),
    )
    assert got["max_days"] == int(x[-1])


def test_mad_outliers_match_numpy_robust_model(spark, smoke_dir):
    from decimal import ROUND_HALF_UP, Decimal

    def rnd9(x: float) -> float:
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal(1).scaleb(-9), ROUND_HALF_UP
            )
        )

    got = {
        r["event_type"]: r for r in _rows(spark, smoke_dir, "q124_mad_outliers")
    }
    daily = _df(
        f"select event_type as t, cast(date_trunc('day', ts) as date) as day,"
        f" cast(round(sum(cast(value as decimal(38,6))),6) as double) as v"
        f" from read_parquet('{smoke_dir}/events.parquet') group by 1,2"
    )
    for t, grp in daily.groupby("t"):
        v = grp["v"].to_numpy()
        med = rnd9(float(np.percentile(v, 50, method="linear")))
        adev = np.array([rnd9(abs(x - med)) for x in v])
        mad = rnd9(float(np.percentile(adev, 50, method="linear")))
        n_out = int((adev > 4.4478 * mad).sum())
        g = got[t]
        assert g["n_days"] == len(v)
        assert g["med"] == round(med, 6) and g["mad"] == round(mad, 6), t
        assert g["n_outliers"] == n_out, (t, g, n_out)


def test_ewma_matches_python_truncated_weights(spark, smoke_dir):
    import datetime as dt
    from decimal import ROUND_HALF_UP, Decimal

    def rnd9(x: float) -> Decimal:
        return Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-9), ROUND_HALF_UP
        )

    rows = _rows(spark, smoke_dir, "q125_ewma")
    daily = _df(
        f"select event_type as t, cast(date_trunc('day', ts) as date) as day,"
        f" cast(round(sum(cast(value as decimal(38,6))),6) as double) as v"
        f" from read_parquet('{smoke_dir}/events.parquet') group by 1,2"
    )
    series = {
        t: {pd.Timestamp(d).date(): v for d, v in zip(grp["day"], grp["v"])}
        for t, grp in daily.groupby("t")
    }
    assert len(rows) == sum(len(s) for s in series.values())
    for g in rows:
        s = series[g["event_type"]]
        day = dt.date.fromisoformat(g["day"])
        num = Decimal(0)
        den = Decimal(0)
        for k in range(14):
            other = day - dt.timedelta(days=k)
            if other in s:
                w = 0.7 ** k
                num += rnd9(w * s[other])
                den += rnd9(w)
        want = float(
            (num / den).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        assert g["v"] == s[day]
        assert g["ewma"] == want, (g, want)


def test_gap_fill_locf_matches_pandas_grid(spark, smoke_dir):
    got = {
        (r["user_id"], r["hour_us"]): r
        for r in _rows(spark, smoke_dir, "q95_gap_fill_locf")
    }
    hourly = _df(
        f"select user_id as u, epoch_us(date_trunc('hour', ts)) as hus,"
        f" cast(round(sum(cast(value as decimal(38,6))),6) as double) as v"
        f" from read_parquet('{smoke_dir}/events.parquet')"
        f" where user_id % 97 = 0 group by 1,2"
    )
    HOUR = 3_600_000_000
    want = {}
    for u, grp in hourly.groupby("u"):
        obs = dict(zip(grp["hus"].astype(int), grp["v"]))
        last = None
        for hus in range(min(obs), max(obs) + HOUR, HOUR):
            if hus in obs:
                last = obs[hus]
                want[(u, hus)] = (last, 0)
            else:
                want[(u, hus)] = (last, 1)
    assert len(got) == len(want)
    for k, (v, gap) in want.items():
        g = got[k]
        assert (g["v_fill"], g["is_gap"]) == (v, gap), (k, g, v, gap)


def test_chisq_terms_match_python_contingency(spark, smoke_dir):
    import re
    from collections import Counter

    rows = _rows(spark, smoke_dir, "q155_chisq_terms")
    docs = _df(
        f"select doc_id, text, lang from "
        f"read_parquet('{smoke_dir}/documents.parquet')"
    )
    n = len(docs)
    n_pos = int((docs["lang"] == "en").sum())
    df_: Counter = Counter()
    df_pos: Counter = Counter()
    for _, r in docs.iterrows():
        terms = {
            w
            for w in re.split(r"[^a-z]+", str(r["text"]).lower())
            if len(w) >= 3
        }
        df_.update(terms)
        if r["lang"] == "en":
            df_pos.update(terms)
    scored = []
    for w, d in df_.items():
        if d < 10:
            continue
        a = df_pos[w]
        diff = a * (n - n_pos - d + a) - (d - a) * (n_pos - a)
        chi2 = round(
            (n * float(diff) * diff) / (float(d) * (n - d) * n_pos * (n - n_pos)),
            6,
        )
        scored.append((-chi2, w, d, a))
    scored.sort()
    want = scored[:20]
    assert len(rows) == len(want)
    for g, (negchi, w, d, a) in zip(rows, want):
        assert (g["term"], g["df"], g["df_pos"], g["chi2"]) == (
            w,
            d,
            a,
            -negchi,
        ), g


def test_k_anonymity_matches_pandas_class_sizes(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q197_k_anonymity")
    c = _df(
        f"select c_nationkey as nk, c_mktsegment as seg from "
        f"read_parquet('{smoke_dir}/customer.parquet')"
    )
    sizes = c.groupby(["nk", "seg"]).size()
    total = int(sizes.sum())
    supp = int(sizes[sizes < 5].sum())
    rate = round(supp / total, 6)
    assert len(rows) == len(sizes)
    for g in rows:
        sz = int(sizes[(g["c_nationkey"], g["c_mktsegment"])])
        assert g["group_size"] == sz
        assert g["suppressed"] == int(sz < 5)
        assert g["corpus_suppression_rate"] == rate


def test_bigram_lm_interp_matches_python_jm_model(spark, smoke_dir):
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    rows = _rows(spark, smoke_dir, "q175_bigram_lm_interp")
    docs = _df(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    streams = {
        int(r["doc_id"]): [
            w for w in re.split(r"[^a-z]+", str(r["text"]).lower()) if w
        ]
        for _, r in docs.iterrows()
    }
    uni: Counter = Counter()
    bi: Counter = Counter()
    for s in streams.values():
        uni.update(s)
        bi.update(zip(s, s[1:]))
    t = float(sum(uni.values()))
    want = {}
    for d_, s in streams.items():
        grams = list(zip(s, s[1:]))
        if not grams:
            continue
        total = sum(
            Decimal(
                repr(
                    math.log(
                        0.7 * (bi[(a, b)] / uni[a]) + 0.3 * (uni[b] / t)
                    )
                )
            ).quantize(Decimal(1).scaleb(-9), ROUND_HALF_UP)
            for a, b in grams
        )
        want[d_] = (
            len(grams),
            float(
                (total / len(grams)).quantize(
                    Decimal("0.0001"), ROUND_HALF_UP
                )
            ),
        )
    assert len(rows) == len(want)
    for g in rows:
        n, mean = want[g["doc_id"]]
        assert (g["n_bigrams"], g["mean_logprob"]) == (n, mean), g


def test_forecast_revenue_matches_pandas_filter_agg(spark, smoke_dir):
    got = _rows(spark, smoke_dir, "q194_forecast_revenue")[0]
    li = _df(
        f"select l_shipdate as d, l_discount as disc, l_quantity as q,"
        f" l_extendedprice as p from "
        f"read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    sel = li[
        (li["d"] >= pd.Timestamp("1997-01-01"))
        & (li["d"] < pd.Timestamp("1998-01-01"))
        & (li["disc"] >= 0.05)
        & (li["disc"] <= 0.07)
        & (li["q"] < 24)
    ]
    want = round(float((sel["p"] * sel["disc"]).sum()), 6)
    assert got["n_lines"] == len(sel)
    assert abs(got["revenue_delta"] - want) <= 1e-6


def test_boilerplate_coverage_matches_python_span_df(spark, smoke_dir):
    import re
    from collections import Counter

    rows = _rows(spark, smoke_dir, "q174_boilerplate_coverage")
    docs = _df(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    grams = {}
    span_docs: Counter = Counter()
    for _, r in docs.iterrows():
        toks = [
            w for w in re.split(r"[^a-z]+", str(r["text"]).lower()) if w
        ]
        g = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        grams[int(r["doc_id"])] = g
        span_docs.update(set(g))
    boiler = {g for g, d in span_docs.items() if d >= 25}
    want = {
        d_: (
            len(g),
            sum(1 for s in g if s in boiler),
        )
        for d_, g in grams.items()
        if g
    }
    assert len(rows) == len(want)
    for r in rows:
        n, nt = want[r["doc_id"]]
        assert (r["n_grams"], r["n_templated"]) == (n, nt), r
        assert r["boiler_ratio"] == round(nt / n, 6)


def test_geo_radius_join_matches_brute_force_haversine(spark, smoke_dir):
    import hashlib as hl
    import os
    from itertools import combinations

    import pytest

    # sf0.001's 150 hash-placed customers contain no sub-25 km pair, so
    # the non-trivial check needs the sf0.01 fixture (1500 points, ~1.1M
    # brute-force pairs — still fast in pure Python).
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.01 fixture not present")
    rows = _rows(spark, sf_dir, "q153_geo_radius_join")
    ids = _df(
        f"select c_custkey as k from read_parquet('{sf_dir}/customer.parquet')"
    )["k"].astype(int).tolist()
    pts = {}
    for k in ids:
        h = hl.md5(str(k).encode()).hexdigest()
        h1, h2 = int(h[0:6], 16), int(h[6:12], 16)
        pts[k] = (-60 + (h1 % 12000) / 100.0, -180 + (h2 % 36000) / 100.0)

    def hav_km(a, b):
        la1, lo1 = pts[a]
        la2, lo2 = pts[b]
        dlat = math.radians(la2 - la1) / 2
        dlon = math.radians(lo2 - lo1) / 2
        h = (
            math.sin(dlat) ** 2
            + math.cos(math.radians(la1))
            * math.cos(math.radians(la2))
            * math.sin(dlon) ** 2
        )
        return round(2 * 6371.0 * math.asin(math.sqrt(h)), 9)

    # brute force over ALL pairs — the blocking must lose nothing
    want = {
        (a, b): round(hav_km(a, b), 6)
        for a, b in combinations(sorted(pts), 2)
        if hav_km(a, b) <= 25.0
    }
    got = {(r["id_a"], r["id_b"]): r["dist_km"] for r in rows}
    assert got == want
    assert len(want) > 0  # fixture must actually contain close pairs


def test_event_paths_match_python_trigram_counts(spark, smoke_dir):
    from collections import Counter

    rows = _rows(spark, smoke_dir, "q143_event_paths")
    e = _df(
        f"select user_id as u, event_type as t, epoch_us(ts) as us,"
        f" event_id as i from read_parquet('{smoke_dir}/events.parquet')"
    ).sort_values(["us", "i"], kind="stable")
    cnt: Counter = Counter()
    for _, grp in e.groupby("u", sort=False):
        ts_ = list(grp["t"])
        cnt.update(
            f"{a}>{b}>{c}" for a, b, c in zip(ts_, ts_[1:], ts_[2:])
        )
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = sorted(top)  # final orderBy(path)
    got = [(r["path"], r["n"]) for r in rows]
    assert got == want


def test_share_of_total_matches_pandas_two_level_ratios(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q185_share_of_total")
    nat = _df(
        f"select r.r_name as region, n.n_name as nation,"
        f" sum(cast(l.l_extendedprice * (1 - l.l_discount) as"
        f" decimal(38,6))) as rev"
        f" from read_parquet('{smoke_dir}/lineitem.parquet') l"
        f" join read_parquet('{smoke_dir}/supplier.parquet') s"
        f"   on l.l_suppkey = s.s_suppkey"
        f" join read_parquet('{smoke_dir}/nation.parquet') n"
        f"   on s.s_nationkey = n.n_nationkey"
        f" join read_parquet('{smoke_dir}/region.parquet') r"
        f"   on n.n_regionkey = r.r_regionkey"
        f" group by 1,2"
    )
    region_tot = nat.groupby("region")["rev"].transform("sum")
    grand = nat["rev"].sum()
    want = {
        (r["region"], r["nation"]): (
            round(float(r["rev"]), 6),
            round(float(r["rev"] / rt), 6),
            round(float(r["rev"] / grand), 6),
        )
        for (_, r), rt in zip(nat.iterrows(), region_tot)
    }
    assert len(rows) == len(want)
    for g in rows:
        rev, sr, st = want[(g["region"], g["nation"])]
        assert g["revenue"] == rev
        assert abs(g["share_of_region"] - sr) <= 1e-6
        assert abs(g["share_of_total"] - st) <= 1e-6


def test_revenue_concentration_matches_pandas_pareto(spark, smoke_dir):
    from decimal import Decimal

    rows = _rows(spark, smoke_dir, "q165_revenue_concentration")
    rev = _df(
        f"select p.p_brand as b,"
        f" sum(cast(l.l_extendedprice * (1 - l.l_discount) as"
        f" decimal(38,6))) as r"
        f" from read_parquet('{smoke_dir}/lineitem.parquet') l"
        f" join read_parquet('{smoke_dir}/part.parquet') p"
        f"   on l.l_partkey = p.p_partkey group by 1"
    )
    items = sorted(
        ((Decimal(str(r["r"])), r["b"]) for _, r in rev.iterrows()),
        key=lambda t: (-t[0], t[1]),
    )
    t = sum(v for v, _ in items)
    cum = Decimal(0)
    want = []
    for v, b in items:
        before = cum
        cum += v
        want.append(
            (
                b,
                float(round(v, 2)),
                round(float(cum / t), 6),
                int(cum / t <= Decimal("0.8") or before / t < Decimal("0.8")),
            )
        )
    got = [
        (r["p_brand"], r["revenue"], r["cum_share"], r["in_top80"])
        for r in rows
    ]
    assert got == want


def test_revenue_peaks_match_python_neighbor_scan(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q238_revenue_peaks")
    daily = _df(
        f"select l_shipdate as d, cast(round(sum(cast(l_extendedprice as "
        f"decimal(38,6))),6) as double) as rev from "
        f"read_parquet('{smoke_dir}/lineitem.parquet') group by 1 order by 1"
    )
    rev = daily["rev"].to_numpy()
    days = [pd.Timestamp(d).strftime("%Y-%m-%d") for d in daily["d"]]
    mean = round(float(rev.sum()) / len(rev), 6)
    peaks = [
        (-rev[i], days[i], round(rev[i] / mean, 6))
        for i in range(1, len(rev) - 1)
        if rev[i] > rev[i - 1] and rev[i] > rev[i + 1] and rev[i] > 1.5 * mean
    ]
    peaks.sort()
    want = [(d, -negr, rh) for negr, d, rh in peaks[:10]]
    got = [(r["day"], r["rev"], r["rel_height"]) for r in rows]
    assert got == want


def test_funnel_stages_match_python_sequential_anchors(spark, smoke_dir):
    got = _rows(spark, smoke_dir, "q101_funnel_stages")[0]
    e = _df(
        f"select user_id as u, event_type as t, epoch_us(ts) as us from "
        f"read_parquet('{smoke_dir}/events.parquet')"
    )
    t1, t2, t3 = {}, {}, {}
    for u, grp in e.groupby("u"):
        views = grp[grp["t"] == "view"]["us"]
        if views.empty:
            continue
        t1[u] = views.min()
        clicks = grp[(grp["t"] == "click") & (grp["us"] > t1[u])]["us"]
        if clicks.empty:
            continue
        t2[u] = clicks.min()
        buys = grp[(grp["t"] == "purchase") & (grp["us"] > t2[u])]["us"]
        if buys.empty:
            continue
        t3[u] = buys.min()
    assert (
        got["n_view"], got["n_view_click"], got["n_view_click_purchase"]
    ) == (len(t1), len(t2), len(t3))


def test_sequence_packing_matches_python_greedy_fold(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q97_sequence_packing")
    d = _df(
        f"select source, doc_id, n_chars from "
        f"read_parquet('{smoke_dir}/documents.parquet')"
    )
    want = {}
    for src, grp in d.groupby("source"):
        grp = grp.sort_values("doc_id")
        # greedy fold: a doc STARTS in the current bin if the running
        # total before it is < budget; bin = floor(prefix_before/2048)
        # per the boundary-spill rule
        prefix = 0
        for _, r in grp.iterrows():
            tok = int(r["n_chars"]) // 4
            b = prefix // 2048
            n, t = want.get((src, b), (0, 0))
            want[(src, b)] = (n + 1, t + tok)
            prefix += tok
    got = {
        (r["source"], r["bin"]): (r["n_docs"], r["tokens_total"])
        for r in rows
    }
    assert got == want
    for r in rows:
        assert r["overflow"] == int(r["tokens_total"] > 2048)


def test_exact_correlation_matches_numpy_corrcoef(spark, smoke_dir):
    got = {
        r["l_returnflag"]: r
        for r in _rows(spark, smoke_dir, "q116_exact_correlation")
    }
    li = _df(
        f"select l_returnflag as f, l_quantity as x, l_extendedprice as y"
        f" from read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    for f, grp in li.groupby("f"):
        r = float(
            np.corrcoef(grp["x"].to_numpy(), grp["y"].to_numpy())[0, 1]
        )
        g = got[f]
        assert g["n"] == len(grp)
        assert abs(g["corr_qty_price"] - r) <= 2e-6, (f, g, r)


def test_repetition_quality_matches_python_gopher_model(spark, smoke_dir):
    import re
    from collections import Counter

    rows = _rows(spark, smoke_dir, "q72_repetition_quality")
    docs = _df(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    want = {}
    for _, r in docs.iterrows():
        t = str(r["text"]).lower().strip()
        words = re.split(r"\s+", t)
        ws = t.split(" ")
        n_grams = max(len(ws) - 1, 1)
        bigrams = [" ".join(ws[i : i + 2]) for i in range(n_grams)]
        wc, bc = Counter(words), Counter(bigrams)
        twf = round(max(wc.values()) / sum(wc.values()), 6)
        tbf = round(max(bc.values()) / sum(bc.values()), 6)
        mwl = round(
            sum(n * len(g) for g, n in wc.items()) / sum(wc.values()), 6
        )
        want[int(r["doc_id"])] = (twf, tbf, mwl, twf <= 0.1 and tbf <= 0.06)
    assert len(rows) == len(want)
    for g in rows:
        twf, tbf, mwl, keep = want[g["doc_id"]]
        assert (
            g["top_word_frac"], g["top_bigram_frac"],
            g["mean_word_len"], g["keep"],
        ) == (twf, tbf, mwl, keep), g


def test_rolling_7day_matches_pandas_range_frame(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q99_rolling_7day")
    daily = _df(
        f"select user_id as u,"
        f" datediff('day', date '1970-01-01', cast(date_trunc('day', ts)"
        f" as date)) as di,"
        f" cast(round(sum(cast(value as decimal(38,6))),6) as double) as v"
        f" from read_parquet('{smoke_dir}/events.parquet')"
        f" where user_id % 7 = 0 group by 1,2"
    )
    got = {(r["user_id"], r["day_idx"]): r for r in rows}
    assert len(got) == len(daily)
    for u, grp in daily.groupby("u"):
        obs = dict(zip(grp["di"].astype(int), grp["v"]))
        for di in obs:
            win = [obs[d] for d in range(di - 6, di + 1) if d in obs]
            g = got[(u, di)]
            assert g["v"] == obs[di]
            assert abs(g["v_7d"] - sum(win)) <= 1e-6, (u, di)
            assert g["active_days_7d"] == len(win)


def test_new_vs_returning_matches_pandas_growth_accounting(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q128_new_vs_returning")
    peru = _df(
        f"select distinct user_id as u, cast(date_trunc('day', ts) as date)"
        f" as day from read_parquet('{smoke_dir}/events.parquet')"
    )
    firsts = peru.groupby("u")["day"].min()
    peru["is_new"] = peru.apply(
        lambda r: r["day"] == firsts[r["u"]], axis=1
    )
    agg = peru.groupby("day").agg(
        n_active=("u", "size"), n_new=("is_new", "sum")
    ).sort_index()
    cum = 0
    want = []
    for day, r in agg.iterrows():
        cum += int(r["n_new"])
        want.append(
            (
                pd.Timestamp(day).strftime("%Y-%m-%d"),
                int(r["n_active"]),
                int(r["n_new"]),
                int(r["n_active"] - r["n_new"]),
                cum,
            )
        )
    got = [
        (r["day"], r["n_active"], r["n_new"], r["n_returning"],
         r["n_cumulative"])
        for r in rows
    ]
    assert got == want


def test_sorted_neighborhood_matches_python_levenshtein_window(
    spark, smoke_dir
):
    rows = _rows(spark, smoke_dir, "q157_sorted_neighborhood")
    p = _df(
        f"select p_partkey as k, p_name as nm from "
        f"read_parquet('{smoke_dir}/part.parquet')"
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    ordered = sorted(zip(p["nm"], p["k"].astype(int)))
    want = {}
    for i, (na, ka) in enumerate(ordered):
        for j in range(i + 1, min(i + 6, len(ordered))):  # w=5 window
            nb, kb = ordered[j]
            d = lev(na, nb)
            if d <= 6:
                # pair orientation follows the RANK order (id_a is the
                # earlier (p_name, p_partkey) rank), not id order
                want[(ka, kb)] = d
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in rows}
    assert got == want and len(want) > 0


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_name_pairs_match_python_brand_block(spark, smoke_dir):
    from itertools import combinations

    rows = _rows(spark, smoke_dir, "q115_fuzzy_name_pairs")
    p = _df(
        f"select p_partkey as k, p_name as nm, p_brand as b from "
        f"read_parquet('{smoke_dir}/part.parquet') where p_partkey % 20 = 0"
    )
    want = {}
    for _, grp in p.groupby("b"):
        items = sorted(zip(grp["k"].astype(int), grp["nm"]))
        for (ka, na), (kb, nb) in combinations(items, 2):
            d = _lev(na, nb)
            if d <= 12:
                want[(ka, kb)] = d
    got = {(r["key_a"], r["key_b"]): r["dist"] for r in rows}
    assert got == want and len(want) > 0


def test_tfidf_top_terms_match_python_keyword_model(spark, smoke_dir):
    import re
    from collections import Counter

    rows = _rows(spark, smoke_dir, "q87_tfidf_top_terms")
    docs = _df(
        f"select doc_id, text from read_parquet('{smoke_dir}/documents.parquet')"
    )
    tf = {
        int(r["doc_id"]): Counter(
            re.split(r"\s+", str(r["text"]).lower().strip())
        )
        for _, r in docs.iterrows()
    }
    n_total = len(tf)
    dfreq: Counter = Counter()
    for c in tf.values():
        dfreq.update(c.keys())
    want = []
    for d_ in sorted(tf):
        cnt = tf[d_]
        nw = sum(cnt.values())
        scored = sorted(
            (
                (-round((c / nw) * (n_total / dfreq[w]), 6), w)
                for w, c in cnt.items()
            )
        )[:3]
        for rk, (negs, w) in enumerate(scored, 1):
            want.append((d_, w, -negs, rk))
    got = [(r["doc_id"], r["term"], r["score"], r["rank"]) for r in rows]
    assert got == want


def test_referential_integrity_matches_pandas_anti_joins(spark, smoke_dir):
    rows = {r["fk"]: r for r in _rows(spark, smoke_dir, "q205_referential_integrity")}
    edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    assert set(rows) == {e[0] for e in edges}
    for fk, child, key, parent, pkey in edges:
        ck = _df(
            f"select {key} as k from read_parquet('{smoke_dir}/{child}.parquet')"
        )["k"]
        pk = set(
            _df(
                f"select distinct {pkey} as k from "
                f"read_parquet('{smoke_dir}/{parent}.parquet')"
            )["k"]
        )
        orphans = int((~ck.isin(pk)).sum())
        g = rows[fk]
        assert (g["child_rows"], g["orphans"]) == (len(ck), orphans), fk
        assert g["ok"] == int(orphans == 0)
        assert g["orphan_rate"] == round(orphans / len(ck), 6)


def test_top_supplier_matches_pandas_max_ties(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q193_top_supplier")
    rev = _df(
        f"select l_suppkey as s,"
        f" cast(round(sum(cast(l_extendedprice * (1 - l_discount) as"
        f" decimal(38,6))),6) as double) as r"
        f" from read_parquet('{smoke_dir}/lineitem.parquet')"
        f" where l_shipdate >= date '1997-01-01'"
        f"   and l_shipdate < date '1997-04-01' group by 1"
    )
    mx = rev["r"].max()
    winners = sorted(rev[rev["r"] == mx]["s"].astype(int))
    assert [r["s_suppkey"] for r in rows] == winners
    for r in rows:
        assert r["total_revenue"] == mx


def test_neyman_allocation_matches_python_survey_model(spark, smoke_dir):
    import hashlib as hl
    from decimal import ROUND_HALF_UP, Decimal

    rows = {r["seg"]: r for r in _rows(spark, smoke_dir, "q227_neyman_sample")}
    cust = _df(
        f"select c_mktsegment as seg, c_custkey as k, c_acctbal as v from "
        f"read_parquet('{smoke_dir}/customer.parquet')"
    )
    stats = {}
    for seg, grp in cust.groupby("seg"):
        v = grp["v"].to_numpy()
        stats[seg] = (len(v), float(np.std(v, ddof=1)))
    denom = float(
        sum(
            Decimal(repr(n * sd)).quantize(
                Decimal(1).scaleb(-9), ROUND_HALF_UP
            )
            for n, sd in stats.values()
        )
    )
    for seg, grp in cust.groupby("seg"):
        n, sd = stats[seg]
        rate = min(1.0, (1000.0 * n * sd / denom) / n)
        drawn = sum(
            1
            for k in grp["k"].astype(int)
            if int(hl.md5(str(k).encode()).hexdigest()[:8], 16)
            / 4294967296.0
            < rate
        )
        g = rows[seg]
        assert g["n"] == n
        assert abs(g["sd"] - sd) <= 2e-6
        assert abs(g["rate"] - rate) <= 2e-6
        assert g["n_sampled"] == drawn, (seg, g, drawn)


def test_key_sequence_gaps_match_python_bucket_audit(spark, smoke_dir):
    rows = {r["bucket"]: r for r in _rows(spark, smoke_dir, "q222_key_sequence_gaps")}
    keys = sorted(
        set(
            _df(
                f"select o_orderkey as k from "
                f"read_parquet('{smoke_dir}/orders.parquet')"
            )["k"].astype(int)
        )
    )
    gmin, gmax = keys[0], keys[-1]
    from collections import defaultdict

    buckets = defaultdict(list)
    for k in keys:
        buckets[k // 1000].append(k)
    want = {}
    for b, ks in buckets.items():
        exp_lo = gmin if b == gmin // 1000 else b * 1000
        exp_hi = gmax if b == gmax // 1000 else b * 1000 + 999
        miss = exp_hi - exp_lo + 1 - len(ks)
        if miss > 0:
            want[b] = (len(ks), min(ks), max(ks), miss)
    assert set(rows) == set(want)
    for b, (n, lo, hi, miss) in want.items():
        g = rows[b]
        assert (g["n_keys"], g["lo"], g["hi"], g["missing_in_span"]) == (
            n, lo, hi, miss,
        ), b


def test_multires_rollup_matches_pandas_three_grains(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q94_multires_rollup")
    e = _df(
        f"select strftime(date_trunc('day', ts), '%Y-%m-%d') as day,"
        f" strftime(date_trunc('hour', ts), '%Y-%m-%d %H') as hr, value"
        f" from read_parquet('{smoke_dir}/events.parquet')"
    )
    want = {}
    for (day, hr), grp in e.groupby(["day", "hr"]):  # gid 0: (day, hr)
        want[(day, hr, 0)] = (len(grp), round(float(grp["value"].sum()), 6))
    for day, grp in e.groupby("day"):  # gid 2: day only
        want[(day, "<all>", 2)] = (
            len(grp),
            round(float(grp["value"].sum()), 6),
        )
    want[("<all>", "<all>", 3)] = (  # gid 3: grand total
        len(e),
        round(float(e["value"].sum()), 6),
    )
    assert len(rows) == len(want)
    for g in rows:
        n, vs = want[(g["day"], g["hr"], g["gid"])]
        assert g["n"] == n
        assert abs(g["value_sum"] - vs) <= 1e-6, g


def test_percent_of_parent_matches_pandas_hierarchy(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q223_percent_of_parent")
    nat = _df(
        f"select r.r_name as region, n.n_name as nation,"
        f" cast(round(sum(cast(o.o_totalprice as decimal(38,6))),6)"
        f" as double) as rev"
        f" from read_parquet('{smoke_dir}/orders.parquet') o"
        f" join read_parquet('{smoke_dir}/customer.parquet') c"
        f"   on o.o_custkey = c.c_custkey"
        f" join read_parquet('{smoke_dir}/nation.parquet') n"
        f"   on c.c_nationkey = n.n_nationkey"
        f" join read_parquet('{smoke_dir}/region.parquet') r"
        f"   on n.n_regionkey = r.r_regionkey group by 1,2"
    )
    reg = nat.groupby("region")["rev"].sum()
    grand = nat["rev"].sum()
    want = {
        (r["region"], r["nation"]): (
            r["rev"],
            round(float(r["rev"] / reg[r["region"]]), 6),
            round(float(reg[r["region"]] / grand), 6),
        )
        for _, r in nat.iterrows()
    }
    assert len(rows) == len(want)
    for g in rows:
        rev, sr, rst = want[(g["region"], g["nation"])]
        assert g["rev"] == rev
        assert abs(g["share_of_region"] - sr) <= 1e-6
        assert abs(g["region_share_of_total"] - rst) <= 1e-6


def test_volume_shipping_matches_pandas_snowflake(spark, smoke_dir):
    import os

    import pytest

    # the sf0.001 fixture has no NATION_1<->NATION_2 bilateral rows in
    # the two-year window; the non-trivial check needs sf0.01
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.01 fixture not present")
    smoke_dir = sf_dir
    rows = _rows(spark, smoke_dir, "q168_volume_shipping")
    li = _df(
        f"select l_orderkey, l_suppkey, l_shipdate,"
        f" l_extendedprice * (1 - l_discount) as vol"
        f" from read_parquet('{smoke_dir}/lineitem.parquet')"
        f" where l_shipdate >= date '1996-01-01'"
        f"   and l_shipdate < date '1998-01-01'"
    )
    o = _df(f"select o_orderkey, o_custkey from read_parquet('{smoke_dir}/orders.parquet')")
    c = _df(f"select c_custkey, c_nationkey from read_parquet('{smoke_dir}/customer.parquet')")
    s = _df(f"select s_suppkey, s_nationkey from read_parquet('{smoke_dir}/supplier.parquet')")
    n = _df(f"select n_nationkey, n_name from read_parquet('{smoke_dir}/nation.parquet')")
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(
            n.rename(columns={"n_name": "cust_nation"}),
            left_on="c_nationkey", right_on="n_nationkey",
        )
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(
            n.rename(columns={"n_name": "supp_nation", "n_nationkey": "nk2"}),
            left_on="s_nationkey", right_on="nk2",
        )
    )
    pair = (
        ((j["supp_nation"] == "NATION_1") & (j["cust_nation"] == "NATION_2"))
        | ((j["supp_nation"] == "NATION_2") & (j["cust_nation"] == "NATION_1"))
    )
    j = j[pair]
    j["l_year"] = pd.to_datetime(j["l_shipdate"]).dt.year
    want = {
        (sn, cn, int(y)): round(float(grp["vol"].sum()), 6)
        for (sn, cn, y), grp in j.groupby(
            ["supp_nation", "cust_nation", "l_year"]
        )
    }
    got = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue"]
        for r in rows
    }
    assert set(got) == set(want) and len(want) > 0
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-6, k


def test_promo_revenue_matches_pandas_conditional_agg(spark, smoke_dir):
    got = _rows(spark, smoke_dir, "q172_promo_revenue")[0]
    j = _df(
        f"select p.p_type as t, l.l_extendedprice * (1 - l.l_discount) as v"
        f" from read_parquet('{smoke_dir}/lineitem.parquet') l"
        f" join read_parquet('{smoke_dir}/part.parquet') p"
        f"   on l.l_partkey = p.p_partkey"
        f" where l.l_shipdate >= date '1997-03-01'"
        f"   and l.l_shipdate < date '1997-04-01'"
    )
    promo = float(j[j["t"] == "PROMO"]["v"].sum())
    tot = float(j["v"].sum())
    assert abs(got["promo_revenue"] - promo) <= 1e-6
    assert abs(got["total_revenue"] - tot) <= 1e-6
    assert abs(got["promo_pct"] - 100 * promo / tot) <= 1e-5


def test_order_count_distribution_matches_pandas_left_join(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q171_order_count_distribution")
    c = _df(
        f"select c_custkey as k from read_parquet('{smoke_dir}/customer.parquet')"
    )
    o = _df(
        f"select o_custkey as k from read_parquet('{smoke_dir}/orders.parquet')"
        f" where o_orderpriority <> '4-NOT SPECIFIED'"
    )
    per = o.groupby("k").size()
    counts = c["k"].map(per).fillna(0).astype(int)
    dist = counts.value_counts()
    want = sorted(
        ((int(n), int(cd)) for n, cd in dist.items()),
        key=lambda t: (-t[1], -t[0]),
    )
    got = [(r["c_count"], r["custdist"]) for r in rows]
    assert got == want


def test_returned_revenue_matches_pandas_top20(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q170_returned_revenue")
    j = _df(
        f"select c.c_custkey as k, c.c_name as nm, n.n_name as nat,"
        f" l.l_extendedprice * (1 - l.l_discount) as v"
        f" from read_parquet('{smoke_dir}/lineitem.parquet') l"
        f" join read_parquet('{smoke_dir}/orders.parquet') o"
        f"   on l.l_orderkey = o.o_orderkey"
        f" join read_parquet('{smoke_dir}/customer.parquet') c"
        f"   on o.o_custkey = c.c_custkey"
        f" join read_parquet('{smoke_dir}/nation.parquet') n"
        f"   on c.c_nationkey = n.n_nationkey"
        f" where l.l_returnflag = 'R'"
        f"   and o.o_orderdate >= date '1997-01-01'"
        f"   and o.o_orderdate < date '1997-07-01'"
    )
    per = j.groupby(["k", "nm", "nat"])["v"].sum().round(6)
    ranked = sorted(
        ((-float(v), int(k), nm, nat) for (k, nm, nat), v in per.items())
    )[:20]
    want = [(k, nm, nat, -negv) for negv, k, nm, nat in ranked]
    got = [
        (r["c_custkey"], r["c_name"], r["nation"], r["revenue"]) for r in rows
    ]
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert abs(g[3] - w[3]) <= 1e-6


def test_market_share_matches_pandas_snowflake(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q169_market_share")
    j = _df(
        f"select extract(year from o.o_orderdate) as y, sn.n_name as supp,"
        f" l.l_extendedprice * (1 - l.l_discount) as v"
        f" from read_parquet('{smoke_dir}/lineitem.parquet') l"
        f" join read_parquet('{smoke_dir}/part.parquet') p"
        f"   on l.l_partkey = p.p_partkey and p.p_type = 'ECONOMY'"
        f" join read_parquet('{smoke_dir}/orders.parquet') o"
        f"   on l.l_orderkey = o.o_orderkey"
        f" join read_parquet('{smoke_dir}/customer.parquet') c"
        f"   on o.o_custkey = c.c_custkey"
        f" join read_parquet('{smoke_dir}/nation.parquet') cn"
        f"   on c.c_nationkey = cn.n_nationkey"
        f" join read_parquet('{smoke_dir}/region.parquet') r"
        f"   on cn.n_regionkey = r.r_regionkey and r.r_name = 'ASIA'"
        f" join read_parquet('{smoke_dir}/supplier.parquet') s"
        f"   on l.l_suppkey = s.s_suppkey"
        f" join read_parquet('{smoke_dir}/nation.parquet') sn"
        f"   on s.s_nationkey = sn.n_nationkey"
    )
    got = {r["o_year"]: r for r in rows}
    grouped = j.groupby(j["y"].astype(int))
    assert set(got) == set(grouped.groups)
    for y, grp in grouped:
        nat = float(grp[grp["supp"] == "NATION_3"]["v"].sum())
        tot = float(grp["v"].sum())
        g = got[int(y)]
        assert abs(g["nation_volume"] - nat) <= 1e-6
        assert abs(g["total_volume"] - tot) <= 1e-6
        assert abs(g["mkt_share"] - nat / tot) <= 1e-6


def test_shipping_priority_matches_pandas_q3(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q158_shipping_priority")
    j = _df(
        f"select l.l_orderkey as ok,"
        f" strftime(o.o_orderdate, '%Y-%m-%d') as od, o.o_orderpriority as pr,"
        f" l.l_extendedprice * (1 - l.l_discount) as v"
        f" from read_parquet('{smoke_dir}/customer.parquet') c"
        f" join read_parquet('{smoke_dir}/orders.parquet') o"
        f"   on c.c_custkey = o.o_custkey"
        f" join read_parquet('{smoke_dir}/lineitem.parquet') l"
        f"   on l.l_orderkey = o.o_orderkey"
        f" where c.c_mktsegment = 'BUILDING'"
        f"   and o.o_orderdate < date '1997-03-15'"
        f"   and l.l_shipdate > date '1997-03-15'"
    )
    per = j.groupby(["ok", "od", "pr"])["v"].sum().round(6)
    ranked = sorted(
        ((-float(v), od, int(ok), pr) for (ok, od, pr), v in per.items())
    )[:10]
    want = [(ok, -negv, od, pr) for negv, od, ok, pr in ranked]
    got = [
        (r["l_orderkey"], r["revenue"], r["order_day"], r["o_orderpriority"])
        for r in rows
    ]
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g[0], g[2], g[3]) == (w[0], w[2], w[3])
        assert abs(g[1] - w[1]) <= 1e-6


def test_large_volume_orders_match_pandas_q18(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q162_large_volume_orders")
    li = _df(
        f"select l_orderkey as ok, l_quantity as q from "
        f"read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    per = li.groupby("ok")["q"].sum()
    big = set(per[per > 300].index)
    o = _df(
        f"select o.o_orderkey as ok, c.c_name as nm, c.c_custkey as ck,"
        f" strftime(o.o_orderdate, '%Y-%m-%d') as od, o.o_totalprice as tp"
        f" from read_parquet('{smoke_dir}/orders.parquet') o"
        f" join read_parquet('{smoke_dir}/customer.parquet') c"
        f"   on o.o_custkey = c.c_custkey"
    )
    o = o[o["ok"].isin(big)]
    ranked = sorted(
        (
            (-float(r["tp"]), int(r["ok"]), r["nm"], int(r["ck"]), r["od"])
            for _, r in o.iterrows()
        )
    )[:20]
    want = [
        (nm, ck, ok, od, -negtp, round(float(per[ok]), 6))
        for negtp, ok, nm, ck, od in ranked
    ]
    got = [
        (r["c_name"], r["c_custkey"], r["o_orderkey"], r["order_day"],
         r["o_totalprice"], r["sum_qty"])
        for r in rows
    ]
    assert got == want and len(want) > 0


def test_profit_by_nation_year_matches_pandas_q9(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q209_profit_by_nation_year")
    j = _df(
        f"select n.n_name as nat, extract(year from o.o_orderdate) as y,"
        f" l.l_extendedprice * (1 - l.l_discount)"
        f"   - 0.9 * p.p_retailprice * l.l_quantity as profit"
        f" from read_parquet('{smoke_dir}/lineitem.parquet') l"
        f" join read_parquet('{smoke_dir}/orders.parquet') o"
        f"   on l.l_orderkey = o.o_orderkey"
        f" join read_parquet('{smoke_dir}/supplier.parquet') s"
        f"   on l.l_suppkey = s.s_suppkey"
        f" join read_parquet('{smoke_dir}/nation.parquet') n"
        f"   on s.s_nationkey = n.n_nationkey"
        f" join read_parquet('{smoke_dir}/part.parquet') p"
        f"   on l.l_partkey = p.p_partkey"
        f" where p.p_name like '%a%'"
    )
    got = {(r["nation"], r["o_year"]): r["profit"] for r in rows}
    want = {
        (nat, int(y)): float(grp["profit"].sum())
        for (nat, y), grp in j.groupby(["nat", "y"])
    }
    assert set(got) == set(want) and len(want) > 0
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-5, k


def test_inactive_high_balance_matches_pandas_q22(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q173_inactive_high_balance")
    c = _df(
        f"select c_custkey as k, c_mktsegment as seg, c_acctbal as v"
        f" from read_parquet('{smoke_dir}/customer.parquet')"
    )
    recent = set(
        _df(
            f"select distinct o_custkey as k from "
            f"read_parquet('{smoke_dir}/orders.parquet')"
            f" where o_orderdate >= date '2000-01-01'"
        )["k"]
    )
    thr = float(c[c["v"] > 0]["v"].sum()) / int((c["v"] > 0).sum())
    sel = c[(c["v"] > thr) & (~c["k"].isin(recent))]
    want = {
        seg: (len(grp), round(float(grp["v"].sum()), 6))
        for seg, grp in sel.groupby("seg")
    }
    got = {r["c_mktsegment"]: (r["numcust"], r["totacctbal"]) for r in rows}
    assert set(got) == set(want) and len(want) > 0
    for seg, (n, tot) in want.items():
        assert got[seg][0] == n
        assert abs(got[seg][1] - tot) <= 1e-6


def test_late_shipment_orders_match_pandas_q4(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q186_late_shipment_orders")
    o = _df(
        f"select o_orderkey as ok, o_orderpriority as pr, o_orderdate as od"
        f" from read_parquet('{smoke_dir}/orders.parquet')"
        f" where o_orderdate >= date '1997-01-01'"
        f"   and o_orderdate < date '1997-04-01'"
    )
    li = _df(
        f"select l_orderkey as ok, l_shipdate as sd from "
        f"read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    j = o.merge(li, on="ok")
    late = j[
        pd.to_datetime(j["sd"])
        > pd.to_datetime(j["od"]) + pd.Timedelta(days=60)
    ]
    hit = set(late["ok"])
    want = (
        o[o["ok"].isin(hit)].groupby("pr").size().to_dict()
    )
    got = {r["o_orderpriority"]: r["n_orders"] for r in rows}
    assert got == want and len(want) > 0


def test_small_qty_revenue_matches_pandas_q17(spark, smoke_dir):
    import os

    import pytest

    # sf0.001 has zero qualifying Brand#23 small-part lines (NULL sum);
    # run the non-trivial check at sf0.01
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.01 fixture not present")
    smoke_dir = sf_dir
    got = _rows(spark, smoke_dir, "q207_small_qty_revenue")[0]
    li = _df(
        f"select l_partkey as pk, l_quantity as q, l_extendedprice as p"
        f" from read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    aq = (li.groupby("pk")["q"].sum() / li.groupby("pk")["q"].size()).round(6)
    parts = set(
        _df(
            f"select p_partkey as k from read_parquet('{smoke_dir}/part.parquet')"
            f" where p_brand = 'Brand#23' and p_size <= 10"
        )["k"]
    )
    sel = li[
        li["pk"].isin(parts) & (li["q"] < 0.2 * li["pk"].map(aq))
    ]
    avg_yearly = round(round(float(sel["p"].sum()), 6) / 7.0, 6)
    assert got["n_small_lines"] == len(sel)
    assert abs(got["avg_yearly"] - avg_yearly) <= 1e-6


def test_pricing_summary_matches_pandas_q1(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q01_pricing_summary")
    li = _df(
        f"select l_returnflag as rf, l_linestatus as ls, l_quantity as q,"
        f" l_extendedprice as ep, l_discount as d, l_tax as t"
        f" from read_parquet('{smoke_dir}/lineitem.parquet')"
        f" where l_shipdate <= date '1998-09-02'"
    )
    got = {(r["l_returnflag"], r["l_linestatus"]): r for r in rows}
    grouped = li.groupby(["rf", "ls"])
    assert set(got) == set(grouped.groups)
    for (rf, ls), grp in grouped:
        disc = grp["ep"] * (1 - grp["d"])
        charge = disc * (1 + grp["t"])
        n = len(grp)
        g = got[(rf, ls)]
        for col, series in (
            ("sum_qty", grp["q"].sum()),
            ("sum_base_price", grp["ep"].sum()),
            ("sum_disc_price", disc.sum()),
            ("sum_charge", charge.sum()),
            ("avg_qty", grp["q"].sum() / n),
            ("avg_price", grp["ep"].sum() / n),
            ("avg_disc", grp["d"].sum() / n),
        ):
            assert abs(g[col] - float(series)) <= 1e-5, (rf, ls, col)
        assert g["count_order"] == n


def test_hash_split_matches_python_md5_buckets(spark, smoke_dir):
    import hashlib as hl

    rows = _rows(spark, smoke_dir, "q73_hash_split")
    docs = _df(
        f"select doc_id, lang, n_chars from "
        f"read_parquet('{smoke_dir}/documents.parquet')"
    )
    want = {}
    for _, r in docs.iterrows():
        h = hl.md5(str(int(r["doc_id"])).encode()).hexdigest()[0]
        split = "train" if h <= "b" else ("val" if h <= "d" else "test")
        n, ch = want.get((r["lang"], split), (0, 0))
        want[(r["lang"], split)] = (n + 1, ch + int(r["n_chars"]))
    got = {
        (r["lang"], r["split"]): (r["n_docs"], r["chars_sum"]) for r in rows
    }
    assert got == want


def test_revenue_by_nation_matches_pandas_q5(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q05_revenue_by_nation")
    j = _df(
        f"select n.n_name as nat,"
        f" l.l_extendedprice * (1 - l.l_discount) as v"
        f" from read_parquet('{smoke_dir}/lineitem.parquet') l"
        f" join read_parquet('{smoke_dir}/orders.parquet') o"
        f"   on l.l_orderkey = o.o_orderkey"
        f"   and o.o_orderdate >= date '1996-01-01'"
        f" join read_parquet('{smoke_dir}/customer.parquet') c"
        f"   on o.o_custkey = c.c_custkey"
        f" join read_parquet('{smoke_dir}/nation.parquet') n"
        f"   on c.c_nationkey = n.n_nationkey"
        f" join read_parquet('{smoke_dir}/region.parquet') r"
        f"   on n.n_regionkey = r.r_regionkey"
        f"   and r.r_name in ('ASIA', 'EUROPE')"
    )
    want = {
        nat: float(grp["v"].sum()) for nat, grp in j.groupby("nat")
    }
    got = {r["nation"]: r["revenue"] for r in rows}
    assert set(got) == set(want) and len(want) > 0
    for nat in want:
        assert abs(got[nat] - want[nat]) <= 1e-6


def test_stratified_sample_matches_python_md5_ranks(spark, smoke_dir):
    import hashlib as hl

    rows = _rows(spark, smoke_dir, "q74_stratified_sample")
    docs = _df(
        f"select doc_id, lang from read_parquet('{smoke_dir}/documents.parquet')"
    )
    want = []
    for lang in sorted(docs["lang"].unique()):
        ids = docs[docs["lang"] == lang]["doc_id"].astype(int)
        ranked = sorted(
            (hl.md5(str(k).encode()).hexdigest(), k) for k in ids
        )[:20]
        want.extend((lang, k, rk) for rk, (_, k) in enumerate(ranked, 1))
    got = [(r["lang"], r["doc_id"], r["rk"]) for r in rows]
    assert got == want


def test_mixture_sample_matches_python_md5_cutoffs(spark, smoke_dir):
    import hashlib as hl

    rows = _rows(spark, smoke_dir, "q98_mixture_sample")
    docs = _df(
        f"select doc_id, lang, n_chars from "
        f"read_parquet('{smoke_dir}/documents.parquet')"
    )
    cutoff = {"en": "ff", "zh": "bf"}
    want = {}
    for _, r in docs.iterrows():
        hx = hl.md5(str(int(r["doc_id"])).encode()).hexdigest()[:2]
        if hx <= cutoff.get(r["lang"], "7f"):
            n, ch = want.get(r["lang"], (0, 0))
            want[r["lang"]] = (n + 1, ch + int(r["n_chars"]))
    got = {r["lang"]: (r["n_kept"], r["chars_kept"]) for r in rows}
    assert got == want


def test_hard_negatives_match_numpy_cosine_model(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q119_hard_negatives")
    emb = _df(
        f"select vec_id, label, embedding from "
        f"read_parquet('{smoke_dir}/embeddings.parquet')"
    )
    vecs = {
        int(r["vec_id"]): (
            r["label"],
            np.asarray(r["embedding"], dtype=np.float64),
        )
        for _, r in emb.iterrows()
    }
    nrm = {k: float(np.sqrt(v @ v)) for k, (_, v) in vecs.items()}
    got = {r["q_id"]: r for r in rows}
    anchors = [k for k in vecs if k < 20]
    assert set(got) == set(anchors)
    for qa in anchors:
        la, va = vecs[qa]
        best = None
        for kn, (ln, vn) in vecs.items():
            if ln == la:
                continue
            cos = round(float(va @ vn) / (nrm[qa] * nrm[kn]), 6)
            key = (-cos, kn)
            if best is None or key < best:
                best = key
        g = got[qa]
        assert (g["neg_id"], g["cos"]) == (best[1], -best[0]), (qa, g, best)
        assert g["label_q"] == la and g["label_n"] == vecs[best[1]][0]


def test_cosine_topk_matches_numpy_brute_force(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q44_cosine_topk")
    emb = _df(
        f"select vec_id, embedding from "
        f"read_parquet('{smoke_dir}/embeddings.parquet')"
    )
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for _, r in emb.iterrows()
    }
    nrm = {k: float(np.sqrt(v @ v)) for k, v in vecs.items()}
    want = []
    for qa in sorted(k for k in vecs if k < 8):
        scored = sorted(
            (
                -round(float(vecs[qa] @ vecs[kc]) / (nrm[qa] * nrm[kc]), 6),
                kc,
            )
            for kc in vecs
            if kc != qa
        )[:5]
        want.extend(
            (qa, kc, -negc, rk) for rk, (negc, kc) in enumerate(scored, 1)
        )
    got = [(r["q_id"], r["c_id"], r["cos"], r["rank"]) for r in rows]
    assert got == want


def test_percentiles_match_numpy_linear_interpolation(spark, smoke_dir):
    got = {
        r["o_orderstatus"]: r for r in _rows(spark, smoke_dir, "q65_percentiles")
    }
    o = _df(
        f"select o_orderstatus as s, o_totalprice as p from "
        f"read_parquet('{smoke_dir}/orders.parquet')"
    )
    for s, grp in o.groupby("s"):
        v = grp["p"].to_numpy()
        p50, p90, p99 = np.percentile(v, [50, 90, 99], method="linear")
        g = got[s]
        assert g["n"] == len(v)
        for col, w in (("p50", p50), ("p90", p90), ("p99", p99)):
            assert abs(g[col] - round(float(w), 6)) <= 1e-6, (s, col)


def test_window_rank_matches_pandas_rank_family(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q20_window_rank")
    o = _df(
        f"select o_orderkey as k, o_orderpriority as pr, o_totalprice as p"
        f" from read_parquet('{smoke_dir}/orders.parquet')"
    )
    # Spark round(x, -3): HALF_UP at the thousands
    o["coarse"] = (o["p"] / 1000).map(
        lambda x: math.floor(x + 0.5) * 1000.0
    )
    got = {r["okey"]: r for r in rows}
    assert len(got) == len(o)
    for pr, grp in o.groupby("pr"):
        grp = grp.sort_values(
            ["coarse", "k"], ascending=[False, True], kind="stable"
        ).reset_index(drop=True)
        n = len(grp)
        # ntile(4) over the deterministic order
        sizes = [(n // 4 + 1) if t < n % 4 else n // 4 for t in range(4)]
        tiles = [t + 1 for t, sz in enumerate(sizes) for _ in range(sz)]
        rnk, drnk, seen = {}, {}, 0
        prev = None
        for i, c in enumerate(grp["coarse"], 1):
            if c != prev:
                seen += 1
                rnk[c], drnk[c] = i, seen
                prev = c
        for i, r in grp.iterrows():
            g = got[int(r["k"])]
            assert g["rn"] == i + 1
            assert g["rnk"] == rnk[r["coarse"]]
            assert g["drnk"] == drnk[r["coarse"]]
            assert g["quartile"] == tiles[i]


def test_window_analytic_matches_pandas_frames(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q21_window_analytic")
    o = _df(
        f"select o_orderkey as k, o_custkey as c, o_orderdate as d,"
        f" o_totalprice as p from read_parquet('{smoke_dir}/orders.parquet')"
    )
    got = {r["okey"]: r for r in rows}
    assert len(got) == len(o)
    for _, grp in o.groupby("c"):
        grp = grp.sort_values(["d", "k"], kind="stable").reset_index(drop=True)
        run = 0.0
        for i, r in grp.iterrows():
            g = got[int(r["k"])]
            run = round(run + float(r["p"]), 6)
            assert g["prev_price"] == (
                float(grp["p"][i - 1]) if i > 0 else None
            )
            assert g["next_price"] == (
                float(grp["p"][i + 1]) if i + 1 < len(grp) else None
            )
            assert g["first_price"] == float(grp["p"][0])
            assert abs(g["running_spend"] - run) <= 1e-6


def test_cube_matches_pandas_four_grouping_sets(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q14_cube")
    li = _df(
        f"select l_returnflag as f, l_linestatus as s, l_quantity as q"
        f" from read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    want = {}
    for (f, s), grp in li.groupby(["f", "s"]):  # gid 0
        want[(f, s, 0)] = (len(grp), round(float(grp["q"].sum()), 6))
    for s, grp in li.groupby("s"):  # gid 1: flag rolled up
        want[("<all>", s, 1)] = (len(grp), round(float(grp["q"].sum()), 6))
    for f, grp in li.groupby("f"):  # gid 2: status rolled up
        want[(f, "<all>", 2)] = (len(grp), round(float(grp["q"].sum()), 6))
    want[("<all>", "<all>", 3)] = (
        len(li),
        round(float(li["q"].sum()), 6),
    )
    got = {
        (r["flag"], r["status"], r["gid"]): (r["n"], r["qty"]) for r in rows
    }
    assert set(got) == set(want)
    for k, (n, qty) in want.items():
        assert got[k][0] == n, k
        assert abs(got[k][1] - qty) <= 1e-6, k


def test_dedup_keep_first_matches_pandas_rule(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q18_dedup_keep_first")
    o = _df(
        f"select o_custkey as c, o_orderkey as k, o_orderdate as d,"
        f" epoch_us(o_orderdate) as us"
        f" from read_parquet('{smoke_dir}/orders.parquet')"
    )
    first = (
        o.sort_values(["d", "k"], kind="stable")
        .groupby("c")
        .first()
    )
    got = {r["custkey"]: (r["first_order"], r["order_us"]) for r in rows}
    assert len(got) == len(first)
    for c, r in first.iterrows():
        assert got[int(c)] == (int(r["k"]), int(r["us"])), c


def test_agg_battery_matches_pandas_moments(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q11_agg_battery")
    li = _df(
        f"select l_returnflag as f, l_orderkey as ok, l_quantity as q,"
        f" l_extendedprice as p, l_discount as d, l_linenumber as ln"
        f" from read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    got = {r["flag"]: r for r in rows}
    for f, grp in li.groupby("f"):
        g = got[f]
        assert g["n_rows"] == len(grp)
        assert g["n_orders"] == grp["ok"].nunique()
        assert abs(g["sum_qty"] - float(grp["q"].sum())) <= 1e-6
        assert g["min_price"] == float(grp["p"].min())
        assert g["max_price"] == float(grp["p"].max())
        assert abs(g["avg_disc"] - float(grp["d"].sum()) / len(grp)) <= 1e-6
        assert (g["min_line"], g["max_line"]) == (
            int(grp["ln"].min()), int(grp["ln"].max()),
        )


def test_histogram_matches_numpy_width_buckets(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q104_histogram")
    o = _df(
        f"select o_totalprice as p from read_parquet('{smoke_dir}/orders.parquet')"
    )
    b = np.minimum(np.floor(o["p"].to_numpy() / 30000).astype(int), 19)
    got = {r["bin"]: (r["n"], r["price_sum"]) for r in rows}
    for bin_ in np.unique(b):
        sel = o["p"].to_numpy()[b == bin_]
        n, ps = got[int(bin_)]
        assert n == len(sel)
        assert abs(ps - float(sel.sum())) <= 1e-6
    assert len(got) == len(np.unique(b))


def test_topk_global_and_per_group_match_pandas(spark, smoke_dir):
    rows_g = _rows(spark, smoke_dir, "q22_topk_global")
    rows_p = _rows(spark, smoke_dir, "q23_topk_per_group")
    o = _df(
        f"select o_orderkey as k, o_orderpriority as pr, o_totalprice as p"
        f" from read_parquet('{smoke_dir}/orders.parquet')"
    )
    top50 = sorted(
        ((-float(r["p"]), int(r["k"])) for _, r in o.iterrows())
    )[:50]
    want_g = [(k, -negp) for negp, k in top50]
    got_g = [(r["okey"], r["price"]) for r in rows_g]
    assert got_g == want_g

    want_p = []
    for pr in sorted(o["pr"].unique()):
        grp = sorted(
            (
                (-float(r["p"]), int(r["k"]))
                for _, r in o[o["pr"] == pr].iterrows()
            )
        )[:5]
        want_p.extend(
            (pr, k, -negp, rk) for rk, (negp, k) in enumerate(grp, 1)
        )
    got_p = [
        (r["prio"], r["okey"], r["price"], r["rank_in_group"])
        for r in rows_p
    ]
    assert got_p == want_p


def test_hash_funcs_match_python_hashlib(spark, smoke_dir):
    import hashlib as hl

    rows = _rows(spark, smoke_dir, "q32_hash_funcs")
    docs = _df(
        f"select doc_id, text, lang, source from "
        f"read_parquet('{smoke_dir}/documents.parquet')"
    )
    got = {r["doc_id"]: r for r in rows}
    assert len(got) == len(docs)
    for _, r in docs.iterrows():
        g = got[int(r["doc_id"])]
        assert g["text_md5"] == hl.md5(str(r["text"]).encode()).hexdigest()
        assert (
            g["meta_sha"]
            == hl.sha256(f"{r['lang']}|{r['source']}".encode()).hexdigest()
        )
        assert (
            g["row_md5"]
            == hl.md5(
                f"{int(r['doc_id'])}|{r['lang']}|{r['source']}".encode()
            ).hexdigest()
        )


def test_string_funcs_match_python_string_ops(spark, smoke_dir):
    import re

    rows = _rows(spark, smoke_dir, "q24_string_funcs")
    cust = _df(
        f"select c_custkey as k, c_name as nm, c_mktsegment as seg from "
        f"read_parquet('{smoke_dir}/customer.parquet')"
    )
    got = {r["custkey"]: r for r in rows}
    assert len(got) == len(cust)
    for _, r in cust.iterrows():
        nm, seg = str(r["nm"]), str(r["seg"])
        g = got[int(r["k"])]
        assert g["tagged"] == f"{seg}|{nm}"
        assert g["id_digits"] == nm[9:18]  # substring is 1-based
        assert (g["seg_lo"], g["seg_hi"]) == (seg.lower(), seg.upper())
        assert g["name_len"] == len(nm)
        assert g["trimmed"] == seg
        m = re.search(r"([0-9]+)", nm)
        assert g["extracted"] == (m.group(1) if m else "")
        assert g["squashed"] == re.sub(r"0+", "-", nm)
        assert g["has_hash"] == ("#" in nm)
        assert g["is_cust"] == nm.startswith("Customer")
        assert g["ends_one"] == nm.endswith("1")
        assert g["padded"] == str(int(r["k"])).rjust(8, "0")
        parts = nm.split("#")
        assert g["after_hash"] == (parts[1] if len(parts) > 1 else None)


def test_math_funcs_match_python_arithmetic(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q27_math_funcs")
    li = _df(
        f"select l_orderkey as ok, l_linenumber as ln, l_quantity as q,"
        f" l_extendedprice as p, l_discount as d"
        f" from read_parquet('{smoke_dir}/lineitem.parquet')"
        f" where l_orderkey < 300"
    )
    # rid = ok*8 + ln collides when linenumber > 7 (this synthetic
    # fixture allows it), so compare MULTISETS of the full value tuples
    # rather than keying rows by rid.
    def py_row(ok, ln, q, p, d):
        return (
            ok * 8 + ln,
            p + q,
            p * d,
            round(p / (q + 1), 6),
            math.floor(p),
            math.ceil(p),
            q * q,
            round(math.sqrt(p), 6),
            round(math.log(p + 1), 6),
            ok // 100,
            ok % 97,
        )

    want = sorted(
        py_row(int(r["ok"]), int(r["ln"]), float(r["q"]), float(r["p"]),
               float(r["d"]))
        for _, r in li.iterrows()
    )
    got = sorted(
        (
            g["rid"], g["add_"], g["mul_"], g["div_"], g["floor_"],
            g["ceil_"], g["pow2"], g["sqrt_"], g["ln_"], g["intdiv"],
            g["mod_"],
        )
        for g in rows
    )
    assert len(got) == len(want)
    for gt, wt in zip(got, want):
        assert gt[:3] == wt[:3] and gt[4:7] == wt[4:7] and gt[9:] == wt[9:], (gt, wt)
        for i in (3, 7, 8):  # rounded doubles
            assert abs(gt[i] - wt[i]) <= 1e-6, (gt, wt, i)


def test_union_distinct_matches_python_set_union(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q16_union_distinct")
    c = set(
        _df(
            f"select distinct c_nationkey as k from "
            f"read_parquet('{smoke_dir}/customer.parquet')"
        )["k"].astype(int)
    )
    s = set(
        _df(
            f"select distinct s_nationkey as k from "
            f"read_parquet('{smoke_dir}/supplier.parquet')"
        )["k"].astype(int)
    )
    want = sorted(
        [(k, "c") for k in c] + [(k, "s") for k in s]
    )
    got = [(r["k"], r["src"]) for r in rows]
    assert got == want


def test_intersect_except_match_python_set_algebra(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q17_intersect_except")
    c = set(
        _df(
            f"select distinct c_nationkey as k from "
            f"read_parquet('{smoke_dir}/customer.parquet')"
        )["k"].astype(int)
    )
    s = set(
        _df(
            f"select distinct s_nationkey as k from "
            f"read_parquet('{smoke_dir}/supplier.parquet')"
        )["k"].astype(int)
    )
    want = sorted(
        [(k, "both") for k in c & s] + [(k, "cust_only") for k in c - s],
        key=lambda t: (t[1], t[0]),
    )
    got = [(r["k"], r["op"]) for r in rows]
    assert got == want


def test_scd2_intervals_match_python_lead_model(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q80_scd2_intervals")
    e = _df(
        f"select user_id as u, event_type as t, epoch_us(ts) as us,"
        f" event_id as i from read_parquet('{smoke_dir}/events.parquet')"
    ).sort_values(["us", "i"], kind="stable")
    want = []
    for u, grp in e.groupby("u"):
        recs = list(zip(grp["t"], grp["us"].astype(int)))
        for j, (t, us) in enumerate(recs):
            nxt = recs[j + 1][1] if j + 1 < len(recs) else None
            want.append((int(u), t, us, nxt, nxt is None))
    want.sort(key=lambda r: (r[0], r[2], r[1]))
    got = [
        (r["user_id"], r["state"], r["valid_from_us"], r["valid_to_us"],
         r["is_current"])
        for r in rows
    ]
    assert got == want


def test_window_distribution_matches_python_formulas(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q114_window_distribution")
    c = _df(
        f"select c_custkey as k, c_mktsegment as seg, c_acctbal as v from "
        f"read_parquet('{smoke_dir}/customer.parquet')"
    )
    got = {r["c_custkey"]: r for r in rows}
    assert len(got) == len(c)
    for seg, grp in c.groupby("seg"):
        grp = grp.sort_values(["v", "k"], kind="stable").reset_index(drop=True)
        n = len(grp)
        # rank (ties by value only) for percent_rank / cume_dist
        rnk, cums = {}, {}
        prev_v, start = None, 0
        for i, v in enumerate(grp["v"], 1):
            if v != prev_v:
                rnk[v] = i
                prev_v = v
            cums[v] = i  # last row index with this value wins
        sizes = [(n // 4 + 1) if t < n % 4 else n // 4 for t in range(4)]
        tiles = [t + 1 for t, sz in enumerate(sizes) for _ in range(sz)]
        for i, r in grp.iterrows():
            g = got[int(r["k"])]
            pr = (rnk[r["v"]] - 1) / (n - 1) if n > 1 else 0.0
            cd = cums[r["v"]] / n
            assert g["pr"] == round(pr, 6), (seg, r["k"])
            assert g["cd"] == round(cd, 6), (seg, r["k"])
            assert g["quartile"] == tiles[i], (seg, r["k"])


def test_rollup_and_grouping_sets_match_pandas(spark, smoke_dir):
    # q13: ROLLUP(status, priority)
    rows = _rows(spark, smoke_dir, "q13_rollup")
    o = _df(
        f"select o_orderstatus as s, o_orderpriority as p, o_totalprice as t"
        f" from read_parquet('{smoke_dir}/orders.parquet')"
    )
    want = {}
    for (s, p), grp in o.groupby(["s", "p"]):
        want[(s, p, 0)] = (len(grp), round(float(grp["t"].sum()), 6))
    for s, grp in o.groupby("s"):
        want[(s, "<all>", 2)] = (len(grp), round(float(grp["t"].sum()), 6))
    want[("<all>", "<all>", 3)] = (len(o), round(float(o["t"].sum()), 6))
    got = {
        (r["status"], r["priority"], r["gid"]): (r["n"], r["total"])
        for r in rows
    }
    assert set(got) == set(want)
    for k, (n, t) in want.items():
        assert got[k][0] == n and abs(got[k][1] - t) <= 1e-6, k

    # q62: GROUPING SETS ((f,s),(f),())
    rows = _rows(spark, smoke_dir, "q62_grouping_sets")
    li = _df(
        f"select l_returnflag as f, l_linestatus as s, l_quantity as q"
        f" from read_parquet('{smoke_dir}/lineitem.parquet')"
    )
    want = {}
    for (f, s), grp in li.groupby(["f", "s"]):
        want[(f, s, 0)] = (len(grp), round(float(grp["q"].sum()), 6))
    for f, grp in li.groupby("f"):
        want[(f, "<all>", 1)] = (len(grp), round(float(grp["q"].sum()), 6))
    want[("<all>", "<all>", 3)] = (len(li), round(float(li["q"].sum()), 6))
    got = {
        (r["rflag"], r["lstatus"], r["gid"]): (r["n"], r["qty"]) for r in rows
    }
    assert set(got) == set(want)
    for k, (n, q) in want.items():
        assert got[k][0] == n and abs(got[k][1] - q) <= 1e-6, k


def test_pivot_unpivot_match_pandas_reshape(spark, smoke_dir):
    # q66: pivot = conditional aggregation per nation
    rows = _rows(spark, smoke_dir, "q66_pivot")
    j = _df(
        f"select n.n_name as nat, o.o_orderstatus as s, o.o_totalprice as t"
        f" from read_parquet('{smoke_dir}/orders.parquet') o"
        f" join read_parquet('{smoke_dir}/customer.parquet') c"
        f"   on o.o_custkey = c.c_custkey"
        f" join read_parquet('{smoke_dir}/nation.parquet') n"
        f"   on c.c_nationkey = n.n_nationkey"
    )
    got = {r["n_name"]: r for r in rows}
    for nat, grp in j.groupby("nat"):
        g = got[nat]
        for status, col in (("F", "f_total"), ("O", "o_total"), ("P", "p_total")):
            sel = grp[grp["s"] == status]["t"]
            if len(sel) == 0:
                assert g[col] is None, (nat, col)
            else:
                assert abs(g[col] - float(sel.sum())) <= 1e-6, (nat, col)

    # q67: unpivot/melt
    rows = _rows(spark, smoke_dir, "q67_unpivot")
    c = _df(
        f"select c_custkey as k, c_acctbal as a, c_nationkey as n from "
        f"read_parquet('{smoke_dir}/customer.parquet') where c_custkey <= 100"
    )
    want = []
    for _, r in c.sort_values("k").iterrows():
        want.append((int(r["k"]), "acctbal", round(float(r["a"]), 6)))
        want.append((int(r["k"]), "nationkey", float(int(r["n"]))))
    got_rows = [(r["c_custkey"], r["metric"], r["val"]) for r in rows]
    assert got_rows == want


def test_collect_nations_matches_python_sorted_sets(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q15_collect_nations")
    j = _df(
        f"select r.r_name as region, n.n_name as nat"
        f" from read_parquet('{smoke_dir}/nation.parquet') n"
        f" join read_parquet('{smoke_dir}/region.parquet') r"
        f"   on n.n_regionkey = r.r_regionkey"
    )
    got = {r["region"]: (r["nations"], r["n_nations"]) for r in rows}
    for region, grp in j.groupby("region"):
        nations = sorted(set(grp["nat"]))
        assert got[region] == (",".join(nations), len(grp)), region


def test_conditional_battery_matches_python_rules(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q28_conditional")
    s = _df(
        f"select s_suppkey as k, s_name as nm, s_nationkey as n,"
        f" s_acctbal as b from read_parquet('{smoke_dir}/supplier.parquet')"
    )
    got = {r["skey"]: r for r in rows}
    assert len(got) == len(s)
    for _, r in s.iterrows():
        k, b, n = int(r["k"]), float(r["b"]), int(r["n"])
        g = got[k]
        assert g["bal_class"] == (
            "debt" if b < 0 else ("low" if b < 5000 else "high")
        )
        assert g["nation_or_default"] == (n if n != 0 else -1)
        assert g["bal_floor0"] == max(b, 0.0)
        assert g["least_"] == min(float(k), b)
        assert g["maybe_name"] == (None if k % 2 == 0 else r["nm"])


def test_array_funcs_match_numpy_vector_ops(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q29_array_funcs")
    emb = _df(
        f"select vec_id, embedding from "
        f"read_parquet('{smoke_dir}/embeddings.parquet')"
    )
    got = {r["vec_id"]: r for r in rows}
    assert len(got) == len(emb)
    for _, r in emb.iterrows():
        # replicate the JVM fold: float32 values widened per element,
        # accumulated in double left-to-right
        v32 = [float(np.float32(x)) for x in r["embedding"]]
        g = got[int(r["vec_id"])]
        assert g["dim"] == len(v32)
        assert g["first_val"] == round(v32[0], 6)
        acc = 0.0
        for x in v32:
            acc += x
        assert abs(g["vec_sum"] - acc) <= 2e-6
        assert g["vec_max"] == round(max(v32), 6)
        assert g["n_pos"] == sum(1 for x in v32 if x > 0)
        acc2 = 0.0
        for x in v32[:8]:
            acc2 += x * x
        assert abs(g["head_sq_sum"] - acc2) <= 2e-6


def test_json_funcs_match_python_json(spark, smoke_dir):
    import json as _json

    rows = _rows(spark, smoke_dir, "q31_json_funcs")
    ev = _df(
        f"select event_id as i, props from "
        f"read_parquet('{smoke_dir}/events.parquet') where event_id < 2000"
    )
    got = {r["event_id"]: r for r in rows}
    assert len(got) == len(ev)
    for _, r in ev.iterrows():
        g = got[int(r["i"])]
        try:
            obj = _json.loads(r["props"])
            ok = isinstance(obj, dict)
        except (ValueError, TypeError):
            obj, ok = None, False
        k = obj.get("k") if ok else None
        assert g["k_str"] == (str(k) if k is not None else None)
        assert g["k_num"] == (int(k) if k is not None else None)
        assert g["missing_"] is None
        assert g["is_json"] == ok


def test_outer_join_counts_match_pandas_null_skipping(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q06_outer_join_order_counts")
    c = _df(
        f"select c_custkey as k, c_mktsegment as seg from "
        f"read_parquet('{smoke_dir}/customer.parquet')"
    )
    o = _df(
        f"select o_custkey as k, o_totalprice as t from "
        f"read_parquet('{smoke_dir}/orders.parquet')"
    )
    per_n = o.groupby("k").size()
    per_t = o.groupby("k")["t"].sum().round(6)
    got = {r["custkey"]: r for r in rows}
    assert len(got) == len(c)  # zero-order customers preserved
    for _, r in c.iterrows():
        k = int(r["k"])
        g = got[k]
        assert g["segment"] == r["seg"]
        assert g["n_orders"] == int(per_n.get(k, 0))
        assert abs(g["spend"] - float(per_t.get(k, 0.0))) <= 1e-6


def test_semi_anti_buckets_match_python_membership(spark, smoke_dir):
    rows = _rows(spark, smoke_dir, "q08_semi_anti_customers")
    c = _df(
        f"select c_custkey as k, c_name as nm from "
        f"read_parquet('{smoke_dir}/customer.parquet')"
    )
    big = set(
        _df(
            f"select distinct o_custkey as k from "
            f"read_parquet('{smoke_dir}/orders.parquet')"
            f" where o_totalprice > 100000"
        )["k"].astype(int)
    )
    got = {r["custkey"]: (r["name"], r["bucket"]) for r in rows}
    assert len(got) == len(c)  # every customer lands in exactly one bucket
    for _, r in c.iterrows():
        k = int(r["k"])
        want = "big_spender" if k in big else "no_big_order"
        assert got[k] == (r["nm"], want), k


def test_embedding_meanpool_matches_numpy_model(spark, smoke_dir):
    """q248 re-derived with numpy only: group vectors by vec_id % 50,
    mean the first 8 dims per group (decimal-free — at fixture scale
    the float64 mean of float32 inputs agrees to well past 1e-6), and
    compare means + the 8-dim pooled norm."""
    import math

    rows = _rows(spark, smoke_dir, "q248_embedding_meanpool")
    emb = _df(
        f"select vec_id, embedding from "
        f"read_parquet('{smoke_dir}/embeddings.parquet')"
    )
    groups: dict[int, list] = {}
    for _, r in emb.iterrows():
        v = r["embedding"]
        if v is None or any(
            x is None or not math.isfinite(x) or abs(x) >= 1e15 for x in v
        ):
            continue
        groups.setdefault(int(r["vec_id"]) % 50, []).append(
            np.asarray(v[:8], dtype=np.float64)
        )
    assert rows, "q248 returned no rows"
    for r in rows:
        vs = groups[r["grp"]]
        assert r["n_vecs"] == len(vs)
        m = np.mean(np.stack(vs), axis=0)
        for k in range(4):
            assert abs(r[f"m{k}"] - m[k]) < 1e-5, (r, m)
        assert abs(r["norm8"] - float(np.sqrt((m * m).sum()))) < 1e-5


def test_semantic_dedup_matches_python_lloyd_plus_cosine(spark, smoke_dir):
    """q249 re-derived in pure Python: two deterministic Lloyd
    iterations (init = first 8 ids, d2 rounded HALF_UP at 6 before the
    argmin, Decimal centroid means), then within-cluster cosine pairs
    at >= 0.4 (rounded at 6) among nonzero-norm vectors, dropping the
    higher id of each pair."""
    from decimal import ROUND_HALF_UP, Decimal

    emb = _df(
        f"select vec_id, embedding from "
        f"read_parquet('{smoke_dir}/embeddings.parquet') order by vec_id"
    )
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for _, r in emb.iterrows()
    }

    def rnd6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def assign(cents):
        out = {}
        for i, v in vecs.items():
            v_sq = dot(v, v)
            best = None
            for c_idx, c in cents.items():
                d2 = rnd6(v_sq + dot(c, c) - 2 * dot(v, c))
                if best is None or (d2, c_idx) < best:
                    best = (d2, c_idx)
            out[i] = best[1]
        return out

    cents = {j: vecs[i] for j, i in enumerate(sorted(vecs)[:8])}
    a1 = assign(cents)
    members: dict[int, list] = {}
    for i, c in a1.items():
        members.setdefault(c, []).append(vecs[i])
    c1 = {}
    for c, ms in members.items():
        c1[c] = [
            float(
                (
                    sum(
                        Decimal(repr(m[p])).quantize(
                            Decimal("0.000001"), ROUND_HALF_UP
                        )
                        for m in ms
                    )
                    / len(ms)
                ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            )
            for p in range(len(ms[0]))
        ]
    a2 = assign(c1)

    by_cluster: dict[int, list] = {}
    for i, c in a2.items():
        by_cluster.setdefault(c, []).append(i)
    expect = []
    for c in sorted(by_cluster):
        ids = sorted(by_cluster[c])
        nz = [i for i in ids if dot(vecs[i], vecs[i]) > 0]
        dropped = set()
        for x in range(len(nz)):
            for y in range(x + 1, len(nz)):
                a, b = vecs[nz[x]], vecs[nz[y]]
                cos = rnd6(dot(a, b) / (dot(a, a) ** 0.5 * dot(b, b) ** 0.5))
                if cos >= 0.4:
                    dropped.add(nz[y])
        expect.append(
            {
                "cluster": c,
                "n_members": len(ids),
                "n_dropped": len(dropped),
                "n_kept": len(ids) - len(dropped),
            }
        )
    assert _rows(spark, smoke_dir, "q249_semantic_dedup") == expect
    assert sum(r["n_dropped"] for r in expect) > 0, "fixture drop set empty"


def test_pq_ann_matches_python_codebooks(spark, smoke_dir):
    """q251 re-derived in pure Python: per-subspace 2-iteration Lloyd
    (init first 4 ids, d2 rounded HALF_UP at 6 with ordinal tie-break,
    Decimal centroid means rounded at 6), PQ codes, LUT distances, and
    the (approx_d2, id)-ranked top-3 per query."""
    from decimal import ROUND_HALF_UP, Decimal

    emb = _df(
        f"select vec_id, embedding from "
        f"read_parquet('{smoke_dir}/embeddings.parquet') order by vec_id"
    )
    full = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for _, r in emb.iterrows()
    }

    def rnd6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def fit(vecs):  # -> (codes, centroids)
        def assign(cents):
            out = {}
            for i, v in vecs.items():
                v_sq = dot(v, v)
                best = None
                for c_idx, c in cents.items():
                    d2 = rnd6(v_sq + dot(c, c) - 2 * dot(v, c))
                    if best is None or (d2, c_idx) < best:
                        best = (d2, c_idx)
                out[i] = best[1]
            return out

        cents = {j: vecs[i] for j, i in enumerate(sorted(vecs)[:4])}
        a1 = assign(cents)
        members: dict[int, list] = {}
        for i, c in a1.items():
            members.setdefault(c, []).append(vecs[i])
        c1 = {}
        for c, ms in members.items():
            c1[c] = [
                float(
                    (
                        sum(
                            Decimal(repr(m[p])).quantize(
                                Decimal("0.000001"), ROUND_HALF_UP
                            )
                            for m in ms
                        )
                        / len(ms)
                    ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                )
                for p in range(len(ms[0]))
            ]
        return assign(c1), c1

    subs = [
        ({i: v[:32] for i, v in full.items()}),
        ({i: v[32:] for i, v in full.items()}),
    ]
    fits = [fit(s) for s in subs]
    expect = []
    for q in sorted(i for i in full if i < 5):
        luts = []
        for s, (codes, cents) in enumerate(fits):
            qv = subs[s][q]
            q_sq = dot(qv, qv)
            luts.append(
                {c: rnd6(q_sq + dot(cv, cv) - 2 * dot(qv, cv))
                 for c, cv in cents.items()}
            )
        cand = sorted(
            (
                rnd6(luts[0][fits[0][0][x]] + luts[1][fits[1][0][x]]),
                x,
            )
            for x in full
            if x != q
        )
        for rk, (d2, x) in enumerate(cand[:3], 1):
            expect.append(
                {"q_id": q, "rk": rk, "neighbor_id": x, "approx_d2": d2}
            )
    got = _rows(spark, smoke_dir, "q251_pq_ann")
    assert got == expect


def test_ivfpq_ann_matches_pure_python(spark, smoke_dir):
    """q253 re-derived in pure Python: the q251 PQ model (per-subspace
    2-iteration Lloyd, codes, LUTs) composed with IVF routing — Decimal
    per-label centroid means, L2 rank rounded HALF_UP at 6 with label
    tie-break, top-2 cells per query — candidates restricted to routed
    cells before the LUT-summed top-3."""
    from decimal import ROUND_HALF_UP, Decimal

    emb = _df(
        f"select vec_id, embedding, label from "
        f"read_parquet('{smoke_dir}/embeddings.parquet') order by vec_id"
    )
    full = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for _, r in emb.iterrows()
    }
    label = {int(r["vec_id"]): int(r["label"]) for _, r in emb.iterrows()}

    def rnd6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def dmean(vals):
        return float(
            (
                sum(
                    Decimal(repr(v)).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                    for v in vals
                )
                / len(vals)
            ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def fit(vecs):
        def assign(cents):
            out = {}
            for i, v in vecs.items():
                v_sq = dot(v, v)
                best = None
                for c_idx, c in cents.items():
                    d2 = rnd6(v_sq + dot(c, c) - 2 * dot(v, c))
                    if best is None or (d2, c_idx) < best:
                        best = (d2, c_idx)
                out[i] = best[1]
            return out

        cents = {j: vecs[i] for j, i in enumerate(sorted(vecs)[:4])}
        a1 = assign(cents)
        members: dict[int, list] = {}
        for i, c in a1.items():
            members.setdefault(c, []).append(vecs[i])
        c1 = {
            c: [dmean([m[p] for m in ms]) for p in range(len(ms[0]))]
            for c, ms in members.items()
        }
        return assign(c1), c1

    subs = [
        {i: v[:32] for i, v in full.items()},
        {i: v[32:] for i, v in full.items()},
    ]
    fits = [fit(s) for s in subs]

    # IVF routing: per-label Decimal-mean centroid, top-2 cells by
    # rounded L2 with label tie-break.
    cells: dict[int, list[int]] = {}
    for i in full:
        cells.setdefault(label[i], []).append(i)
    cents = {
        lb: [dmean([full[i][p] for i in ids]) for p in range(64)]
        for lb, ids in cells.items()
    }
    expect = []
    for q in sorted(i for i in full if i < 5):
        qv, q_sq = full[q], dot(full[q], full[q])
        ranked_cells = sorted(
            (rnd6(q_sq + dot(c, c) - 2 * dot(qv, c)), lb)
            for lb, c in cents.items()
        )
        probed = {lb for _, lb in ranked_cells[:2]}
        luts = []
        for s, (codes, cbook) in enumerate(fits):
            qs = subs[s][q]
            qs_sq = dot(qs, qs)
            luts.append(
                {c: rnd6(qs_sq + dot(cv, cv) - 2 * dot(qs, cv))
                 for c, cv in cbook.items()}
            )
        cand = sorted(
            (
                rnd6(luts[0][fits[0][0][x]] + luts[1][fits[1][0][x]]),
                x,
            )
            for x in full
            if x != q and label[x] in probed
        )
        for rk, (d2, x) in enumerate(cand[:3], 1):
            expect.append(
                {"q_id": q, "rk": rk, "neighbor_id": x, "approx_d2": d2}
            )
    got = _rows(spark, smoke_dir, "q253_ivfpq_ann")
    assert got == expect


def test_ivfpq_residual_ann_matches_pure_python(spark, smoke_dir):
    """q256 re-derived in pure Python: IVFADC — per-label Decimal-mean
    cell centroids, residuals x - centroid[cell], the q251 PQ model
    fitted on the RESIDUAL subspaces, routing by rounded L2 with label
    tie-break, and a (query, probed-cell)-keyed LUT built from the
    query's residual against each probed cell."""
    from decimal import ROUND_HALF_UP, Decimal

    emb = _df(
        f"select vec_id, embedding, label from "
        f"read_parquet('{smoke_dir}/embeddings.parquet') order by vec_id"
    )
    full = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for _, r in emb.iterrows()
    }
    label = {int(r["vec_id"]): int(r["label"]) for _, r in emb.iterrows()}

    def rnd6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def dmean(vals):
        return float(
            (
                sum(
                    Decimal(repr(v)).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                    for v in vals
                )
                / len(vals)
            ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def fit(vecs):
        def assign(cents):
            out = {}
            for i, v in vecs.items():
                v_sq = dot(v, v)
                best = None
                for c_idx, c in cents.items():
                    d2 = rnd6(v_sq + dot(c, c) - 2 * dot(v, c))
                    if best is None or (d2, c_idx) < best:
                        best = (d2, c_idx)
                out[i] = best[1]
            return out

        cents = {j: vecs[i] for j, i in enumerate(sorted(vecs)[:4])}
        a1 = assign(cents)
        members: dict[int, list] = {}
        for i, c in a1.items():
            members.setdefault(c, []).append(vecs[i])
        c1 = {
            c: [dmean([m[p] for m in ms]) for p in range(len(ms[0]))]
            for c, ms in members.items()
        }
        return assign(c1), c1

    # Cell centroids over the full vectors, then per-vector residuals
    # against the vector's OWN cell.
    cells: dict[int, list[int]] = {}
    for i in full:
        cells.setdefault(label[i], []).append(i)
    cents = {
        lb: [dmean([full[i][p] for i in ids]) for p in range(64)]
        for lb, ids in cells.items()
    }
    resid = {
        i: [v[p] - cents[label[i]][p] for p in range(64)]
        for i, v in full.items()
    }
    subs = [
        {i: r[:32] for i, r in resid.items()},
        {i: r[32:] for i, r in resid.items()},
    ]
    fits = [fit(s) for s in subs]

    expect = []
    for q in sorted(i for i in full if i < 5):
        qv, q_sq = full[q], dot(full[q], full[q])
        ranked_cells = sorted(
            (rnd6(q_sq + dot(c, c) - 2 * dot(qv, c)), lb)
            for lb, c in cents.items()
        )
        probed = [lb for _, lb in ranked_cells[:2]]
        # (cell, codeword) LUT from the query's residual vs that cell.
        rlut: dict[tuple[int, int, int], float] = {}
        for lb in probed:
            qr = [qv[p] - cents[lb][p] for p in range(64)]
            qsubs = [qr[:32], qr[32:]]
            for s, (_codes, cbook) in enumerate(fits):
                qs = qsubs[s]
                qs_sq = dot(qs, qs)
                for c, cv in cbook.items():
                    rlut[(s, lb, c)] = rnd6(
                        qs_sq + dot(cv, cv) - 2 * dot(qs, cv)
                    )
        cand = sorted(
            (
                rnd6(
                    rlut[(0, label[x], fits[0][0][x])]
                    + rlut[(1, label[x], fits[1][0][x])]
                ),
                x,
            )
            for x in full
            if x != q and label[x] in probed
        )
        for rk, (d2, x) in enumerate(cand[:3], 1):
            expect.append(
                {"q_id": q, "rk": rk, "neighbor_id": x, "approx_d2": d2}
            )
    got = _rows(spark, smoke_dir, "q256_ivfpq_residual_ann")
    assert got == expect


def test_quality_logreg_matches_pure_python_gd(spark, smoke_dir):
    """q258 re-derived in pure Python: the same 3-step full-batch GD —
    integer-ratio features, sigmoid from math.exp (the engine's
    accepted exp-ulp class, buffered by the 9dp term rounding),
    gradient terms HALF_UP at 9dp, means by the exact integer-side
    HALF_UP division, weights as exact 1e-9 multiples."""
    from decimal import ROUND_HALF_UP, Decimal

    docs = _df(
        f"select doc_id, text, lang from "
        f"read_parquet('{smoke_dir}/documents.parquet') "
        f"where text is not null order by doc_id"
    )
    rows = []
    for _, r in docs.iterrows():
        t = r["text"]
        n = len(t)
        x1 = min(n, 2000) / 1000.0
        x2 = (n - len(t.replace("th", ""))) / 2.0 / max(n, 1) * 100.0
        x3 = min(n, 2000) / len(t.split(" ")) / 10.0
        y = 1.0 if r["lang"] == "en" else 0.0
        rows.append((1.0, x1, x2, x3, y))

    def t9(x):
        return int(
            Decimal(repr(x))
            .quantize(Decimal("0.000000001"), ROUND_HALF_UP)
            .scaleb(9)
        )

    def half_up(si, n):
        return (
            (2 * si + n) // (2 * n)
            if si >= 0
            else -((2 * -si + n) // (2 * n))
        )

    w = [0.0, 0.0, 0.0, 0.0]
    n = len(rows)
    for it in range(3):
        sums = [0, 0, 0, 0]
        for x0, x1, x2, x3, y in rows:
            if it == 0:
                p = 0.5
            else:
                z = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
                p = 1.0 / (1.0 + math.exp(-z))
            for j, x in enumerate((x0, x1, x2, x3)):
                sums[j] += t9(0.5 * (y - p) * x)
        w = [w[j] + half_up(sums[j], n) / 1e9 for j in range(4)]
    zf = lambda r: w[0] + w[1] * r[1] + w[2] * r[2] + w[3] * r[3]  # noqa: E731
    acc = sum(1.0 for r in rows if (zf(r) >= 0) == (r[4] == 1.0)) / n
    expect = [
        {"feature": "b", "value": w[0]},
        {"feature": "train_acc", "value": float(
            Decimal(repr(acc)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )},
        {"feature": "x1_len", "value": w[1]},
        {"feature": "x2_thrate", "value": w[2]},
        {"feature": "x3_wordlen", "value": w[3]},
    ]
    got = [
        r.asDict()
        for r in QUERIES["q258_quality_logreg"](spark, smoke_dir).collect()
    ]
    assert got == expect


def test_quality_filter_apply_matches_pure_python(spark, smoke_dir):
    """q259 re-derived in pure Python: the q258 GD walk, per-doc sigmoid
    scores HALF_UP at 6dp, the linear-interpolated median as the keep
    threshold, and the per-language kept funnel."""
    from decimal import ROUND_HALF_UP, Decimal

    docs = _df(
        f"select doc_id, text, lang from "
        f"read_parquet('{smoke_dir}/documents.parquet') "
        f"where text is not null order by doc_id"
    )

    def rnd(x, q):
        return float(Decimal(repr(x)).quantize(Decimal(q), ROUND_HALF_UP))

    rows = []
    for _, r in docs.iterrows():
        t = r["text"]
        n = len(t)
        x1 = min(n, 2000) / 1000.0
        x2 = (n - len(t.replace("th", ""))) / 2.0 / max(n, 1) * 100.0
        x3 = min(n, 2000) / len(t.split(" ")) / 10.0
        y = 1.0 if r["lang"] == "en" else 0.0
        rows.append((r["lang"], x1, x2, x3, y))

    def t9(x):
        return int(
            Decimal(repr(x))
            .quantize(Decimal("0.000000001"), ROUND_HALF_UP)
            .scaleb(9)
        )

    def half_up(si, n):
        return (
            (2 * si + n) // (2 * n)
            if si >= 0
            else -((2 * -si + n) // (2 * n))
        )

    w = [0.0, 0.0, 0.0, 0.0]
    n = len(rows)
    for it in range(3):
        sums = [0, 0, 0, 0]
        for lang, x1, x2, x3, y in rows:
            if it == 0:
                p = 0.5
            else:
                z = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3
                p = 1.0 / (1.0 + math.exp(-z))
            for j, x in enumerate((1.0, x1, x2, x3)):
                sums[j] += t9(0.5 * (y - p) * x)
        w = [w[j] + half_up(sums[j], n) / 1e9 for j in range(4)]

    scored = [
        (
            lang,
            rnd(
                1.0
                / (1.0 + math.exp(-(w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3))),
                "0.000001",
            ),
        )
        for lang, x1, x2, x3, _ in rows
    ]
    vals = sorted(s for _, s in scored)
    # Linear-interpolated median, the percentile/quantile_cont formula.
    idx = (len(vals) - 1) * 0.5
    lo, hi = int(idx), min(int(idx) + 1, len(vals) - 1)
    med = vals[lo] + (idx - lo) * (vals[hi] - vals[lo])
    from collections import defaultdict

    tot, kept = defaultdict(int), defaultdict(int)
    for lang, s in scored:
        tot[lang] += 1
        if s > med:
            kept[lang] += 1
    expect = [
        {
            "lang": lang,
            "n_docs": tot[lang],
            "n_kept": kept[lang],
            "kept_rate": rnd(kept[lang] / tot[lang], "0.000001"),
        }
        for lang in sorted(tot)
    ]
    got = [
        r.asDict()
        for r in QUERIES["q259_quality_filter_apply"](
            spark, smoke_dir
        ).collect()
    ]
    assert got == expect
