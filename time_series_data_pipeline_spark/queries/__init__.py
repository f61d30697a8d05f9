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
from . import influxql_q  # noqa: F401  isort: skip
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

# The 50 queries the driver will verify this round, in order. The
# ordering below is COMPUTED policy, not hand lore: run
# ``python tools/rotation_ledger.py`` (VERDICT r12 item 6) — it derives
# every query's last own-row round from the committed
# CORRECTNESS_r*.json files; never-own-row entries lead, then oldest.

#: the round this window was AUTHORED for — the ledger invariant test
#: bounds its evidence at WINDOW_ROUND − 1, so the "leading slots were
#: never-own-row when chosen" pin survives the driver landing THIS
#: round's CORRECTNESS file (which gives them rows — the goal)
WINDOW_ROUND = 16

#: Queries whose implementation changed in this round or the previous
#: one WITHOUT same-round driver verification (VERDICT r15 item 3 —
#: the r15 rotation rolled the r14-attested queries out of the window
#: exactly when r15 rewrote several of them). These are re-attested at
#: the head of the window regardless of ledger age; the window-policy
#: test reads this list.
#:
#: r15 rewrites (commits bd8e2ec/ff74db3): doc_profile/scrub_pii token
#: threading, dsir/duplicate_spans token materialization, rrf union
#: rewrite (hybrid_search_rrf), bpe_encode_stats/doc_chunks/
#: pack_sequences expression dedup, curation_pipeline (via dsir arm).
#: r16 rewrites: repetition_stats token materialization + the shared
#: tokenize-once pipeline (curation_pipeline, doc_repetition), the
#: rollup maintenance stream's file-list date discovery
#: (stream_task_rollup_drained).
TOUCHED_THIS_ROUND = [
    "curation_pipeline",
    "doc_profile",
    "dsir_weights",
    "duplicate_spans",
    "hybrid_search_rrf",
    "bpe_encode_stats",
    "doc_chunks",
    "scrub_pii",
    "pack_sequences",
    "doc_repetition",
    "stream_task_rollup_drained",
]

_CHECKED_WINDOW = [
    # --- round 16 (VERDICT r15 item 3). No new queries this round
    # (optimization round — no never-own-row block). The TOUCHED
    # re-attestation block leads: every query whose implementation
    # changed in r15/r16 without same-round driver verification gets
    # its own hash row now (TOUCHED_THIS_ROUND above, verbatim). ---
    *TOUCHED_THIS_ROUND,
    # --- the ledger's oldest aged entries fill the remaining slots,
    # (round, name) order — the whole remaining r11 block
    # (doc_repetition, also r11, sits in the touched block above). ---
    "approx_distinct_users",
    "asof_error_click",
    "bm25_search",
    "bpe_token_stats",
    "counter_rate",
    "decimate_minmax_15m",
    "embedding_neardup_pairs",
    "embedding_quantized_topk",
    "events_pivot_counts",
    "flux_compiled_cumulative_sum",
    "flux_compiled_difference",
    "flux_compiled_fill_previous",
    "flux_compiled_increase",
    "flux_compiled_map_units",
    "flux_compiled_moving_avg",
    "flux_compiled_state_duration",
    "flux_compiled_tag_filter",
    "flux_compiled_tag_group",
    "flux_compiled_tag_regex",
    "flux_compiled_to_rollup",
    "flux_schema_field_keys",
    "flux_schema_measurements",
    "flux_schema_tag_values",
    "gap_fill_5m",
    "merge_value_intervals",
    "multimodal_features",
    "multimodal_frame_sample",
    "range_join_clicks_before_error",
    "resample_hourly",
    "rolling_stats_zscore",
    "similar_part_names",
    "top_ngrams",
    "value_histogram",
    "vocab_coverage",
    # --- always-checked core: flagships + the suites that remain the
    # sole in-window hash over constituents NOT individually in this
    # window. ---
    "window_5m_mean",
    "flux_pipeline_mean",
    "window_5m_mean_bucketed",
    "suite_round5",
    "suite_timeseries_stats",
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

__all__ = [
    "QUERIES",
    "ORACLE",
    "SUITE_CONSTITUENTS",
    "ROWS_ONLY_ATTESTATION",
    "TOUCHED_THIS_ROUND",
]
