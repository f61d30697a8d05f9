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
WINDOW_ROUND = 15

_CHECKED_WINDOW = [
    # --- round 15 (VERDICT r14 items 1–3). Never-own-row leads: the
    # NEW drained streaming queries — first driver-visible rows for
    # the three streaming surfaces (the applyInPandasWithState
    # keyed-state path, the append-mode windowed-aggregate path, and
    # the start_flux_task ticker + idempotent-sink loop with its
    # result read back from the store; until now attested by
    # streaming==batch / replay tests only). ---
    "stream_moving_avg_drained",
    "stream_task_rollup_drained",
    "stream_window_mean_drained",
    # --- round 15b, the session's second deliverable: the InfluxQL
    # front-end (influxql.py + queries/influxql_q.py) — the reference
    # server's OTHER query language, compiled onto the same tagged
    # store as the Flux twins. New oracle-bearing queries, so they
    # join the never-own-row lead block; the eight oldest r11 entries
    # they displace wait one round (with events_pivot_counts and
    # embedding_quantized_topk). ---
    "influxql_derivative",
    "influxql_fill_previous",
    "influxql_group_mean",
    "influxql_multi_agg",
    "influxql_percentile",
    "influxql_raw_points",
    "influxql_show_tag_values",
    "influxql_top_per_host",
    # --- the rows-only re-attestation block (VERDICT r14 item 3):
    # the five r05 rows-only sketch entries are the OLDEST entries in
    # the whole ledger, but a rows-only slot alone yields only the
    # weak rows-check — so each enters WITH its hash-bearing *_verify
    # twin (pulled forward if the aged order wouldn't reach it:
    # lsh_ann_verify is r11), landing the pair's rows-check + hash
    # evidence in the same round. bpe_learn_merges has no twin by
    # documented design (golden-trace + partition-invariance tests).
    # Ordered by the ledger's (round, name) within the block. ---
    "bpe_learn_merges",
    "embedding_lsh_ann",
    "lsh_ann_verify",
    "heavy_hitter_tokens",
    "heavy_hitter_verify",
    "minhash_lsh_pairs",
    "minhash_lsh_verify",
    "simhash_pairs",
    "simhash_verify",
    # --- the r10 tail (VERDICT r14 item 1), ledger (round, name)
    # order, minus the three verify twins already placed above — this
    # clears the entire r10 block. ---
    "flux_compiled_elapsed",
    "flux_compiled_ema",
    "flux_compiled_gauge",
    "flux_compiled_group_merge",
    "flux_compiled_histogram",
    "flux_compiled_hour_truncate",
    "flux_compiled_integral",
    "flux_compiled_join_overlay",
    "flux_compiled_mean",
    "flux_compiled_pearsonr",
    "flux_compiled_quantile",
    "flux_compiled_spread",
    "flux_compiled_stddev",
    "flux_compiled_tail",
    "flux_compiled_timeshift",
    "flux_compiled_top",
    "flux_compiled_unique",
    "flux_compiled_window_raw",
    "last_value_per_type",
    "ngram_jaccard_pairs",
    "pack_sequences_sharded",
    "sampling_splits",
    "scrub_pii",
    "session_windows_5m",
    "unpivot_lineitem",
    # --- the r11 block rotates next round: its eight oldest entries
    # yielded their slots to the InfluxQL lead block above. ---
    # --- always-checked core: flagships + the suites that remain the
    # sole in-window hash over constituents NOT individually in this
    # window. The r14-green singletons (r1/r4/r6/r7 backlog + first
    # 12 of r10) rotate out on fresh prior rows. ---
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

__all__ = ["QUERIES", "ORACLE", "SUITE_CONSTITUENTS", "ROWS_ONLY_ATTESTATION"]
