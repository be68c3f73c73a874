"""Declared query surface (SURVEY §2B) with DuckDB oracles.

Each submodule registers queries via ``base.query``; importing this package
populates the global registries consumed by ``__spark_entry__``.
"""

from __future__ import annotations

from . import (  # noqa: F401  (import for registration side effects)
    relational,
    scalar_functions,
    windows,
    timeseries,
    maintenance,
    udf,
    llm_text,
    curation,
    multimodal,
    similarity,
    sources_io,
    dedup,
    pipelines,
    streaming,
    graph,
    advanced,
    starshapes,
    stats,
)
from .base import ORACLE, QUERIES

# Registration order = the order a capped correctness sweep visits queries
# (observed: exactly the first 50 registered, per round). To convert
# "passes the local oracle suite" into externally verified rows, queries
# that have never had a driver CORRECTNESS row are surfaced first; the
# already-verified relational/scalar/window surface goes last.
#
# The window is now GENERATED: run `python tools/rotate_sweep.py` at the
# start of each round (after the driver wrote CORRECTNESS_r{N}.json) and
# commit the rewritten list — tests/test_plans.py's rotation-staleness
# test goes red if this is forgotten, the failure mode rounds 3 and 4
# both hit. COVERAGE.md (tools/update_coverage.py) tracks per-round rows.
_SWEEP_PRIORITY = [
    # Round-5 rotation (APPLIED per VERDICT r4 item 1; reproduced
    # byte-for-byte by tools/rotate_sweep.py): the 50 oldest
    # never-driver-verified queries (q153-q202, all registered in round
    # 4 below the round-4 window boundary) fill the whole window.
    "q153_geo_radius_join",
    "q154_pareto_frontier",
    "q155_chisq_terms",
    "q156_weighted_median",
    "q157_sorted_neighborhood",
    "q158_shipping_priority",
    "q159_seasonal_anomaly",
    "q160_ohlc_bars",
    "q161_incremental_rollup",
    "q162_large_volume_orders",
    "q163_ahash_neardup",
    "q164_countmin_freq",
    "q165_revenue_concentration",
    "q166_null_semantics",
    "q167_linear_attribution",
    "q168_volume_shipping",
    "q169_market_share",
    "q170_returned_revenue",
    "q171_order_count_distribution",
    "q172_promo_revenue",
    "q173_inactive_high_balance",
    "q174_boilerplate_coverage",
    "q175_bigram_lm_interp",
    "q176_linear_interpolation",
    "q177_cusum_changepoint",
    "q178_market_basket",
    "q179_event_pattern_match",
    "q180_range_clustered_layout",
    "q181_spearman_by_brand",
    "q182_decile_lift",
    "q183_stream_windowed_topk",
    "q184_forget_users",
    "q185_share_of_total",
    "q186_late_shipment_orders",
    "q187_rolling_hll_distinct",
    "q188_zipf_slope",
    "q189_stream_complete_totals",
    "q190_snapshot_time_travel",
    "q191_cdc_apply",
    "q192_hll_intersection",
    "q193_top_supplier",
    "q194_forecast_revenue",
    "q195_benford_digits",
    "q196_daily_acf",
    "q197_k_anonymity",
    "q198_auc_rank",
    "q199_ab_ztest",
    "q200_degree_distribution",
    "q201_rake_keywords",
    "q202_stream_stream_full_outer",
    # --- 50-query window boundary ---
    # Round-6: run `python tools/rotate_sweep.py` as the FIRST commit —
    # with a green r5 it computes exactly: the 39 never-verified queries
    # q203-q241, then q46/q47 (r1-green) and q01-q09 (r2-green), i.e.
    # the window below (verified by simulating CORRECTNESS_r05):
    # q203_holt_forecast, q204_adamic_adar, q205_referential_integrity,
    # q206_winsorize_acctbal, q207_small_qty_revenue,
    # q208_discount_brackets, q209_profit_by_nation_year,
    # q210_twap_per_user, q211_embedding_covariance, q212_price_brackets,
    # q213_corrupt_json_ingest, q214_mutual_information,
    # q215_decay_attribution, q216_equidepth_histogram,
    # q217_transition_entropy, q218_first_last_touch,
    # q219_fulfillment_latency, q220_rfm_segments,
    # q221_nested_parquet_roundtrip, q222_key_sequence_gaps,
    # q223_percent_of_parent, q224_cross_correlation, q225_kaplan_meier,
    # q226_vocab_coverage, q227_neyman_sample, q228_psi_drift,
    # q229_spectral_dominant, q230_wilson_intervals,
    # q231_audience_jaccard, q232_gini_spend, q233_ks_test,
    # q234_rank_movers, q235_cohort_ltv, q236_runs_test,
    # q237_seasonality_strength, q238_revenue_peaks,
    # q239_markov_stationary, q240_lorenz_curve, q241_odds_ratio,
    # q46_struct_nested, q47_binary_payload, q01_pricing_summary,
    # q02_projection_cast, q03_filter_predicates, q04_broadcast_join,
    # q05_revenue_by_nation, q06_outer_join_order_counts,
    # q07_full_outer_reconcile, q08_semi_anti_customers,
    # q09_theta_size_bucket.
    # (Round 5 added zero new queries per the VERDICT r4 freeze, so the
    # backlog closes completely in round 6.)
]


def _reorder() -> None:
    missing = [n for n in _SWEEP_PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(f"_SWEEP_PRIORITY names unknown queries: {missing}")
    if len(set(_SWEEP_PRIORITY)) != len(_SWEEP_PRIORITY):
        seen: set[str] = set()
        dups = [n for n in _SWEEP_PRIORITY if n in seen or seen.add(n)]
        raise ValueError(
            f"_SWEEP_PRIORITY has duplicates (each wastes a sweep slot): {dups}"
        )
    ordered = {n: QUERIES[n] for n in _SWEEP_PRIORITY}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    o = {n: ORACLE[n] for n in QUERIES if n in ORACLE}
    ORACLE.clear()
    ORACLE.update(o)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
