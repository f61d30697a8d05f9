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
    # --- round 10: new or changed this round go first (11). Eight NEW
    # compiled queries (VERDICT r9 items 1 + 5: the r9-implemented
    # stddev/spread/quantile aggregates get their driver rows, and
    # timeShift/elapsed/top/histogram/multi-statement-join are new
    # stages); quantile additionally changed
    # convention (ADVICE r9 medium: upstream round(q·n) rank, not
    # percentile_disc's ceil — q=0.25 diverges on this store, so the
    # hash pins the convention). The shared null policy (ADVICE r9
    # low: null _value filtered before the aggregate groupBy, and
    # last() skips nulls like upstream selectors) changed the compiled
    # plan of every bare/windowed aggregate — mean, group_merge and
    # gauge re-attest as the three registered queries on those paths.
    "flux_compiled_quantile",
    "flux_compiled_stddev",
    "flux_compiled_spread",
    "flux_compiled_timeshift",
    "flux_compiled_elapsed",
    "flux_compiled_join_overlay",
    "flux_compiled_top",
    "flux_compiled_histogram",
    # six MORE new flux stages landed later in round 10 (hourSelection/
    # truncateTimeColumn, distinct, unique, non-aggregated window,
    # integral, exponentialMovingAverage) — new queries lead, so six
    # rotation slots below moved to the next-round head
    "flux_compiled_hour_truncate",
    "flux_compiled_distinct",
    "flux_compiled_unique",
    "flux_compiled_window_raw",
    "flux_compiled_integral",
    "flux_compiled_ema",
    # + the generalized derivative (signed default / any unit — the
    # last documented derivative subset gap); label_centroids rotates
    # out to make the slot (label family stays in-window via the
    # suite_round5 label_outliers arm)
    "flux_compiled_derivative_signed",
    # + the pearsonr() combiner (cross-series correlation);
    # profile_columns rotates out (DQ family stays in-window via the
    # suite_round5 dq_lineitem arm)
    "flux_compiled_pearsonr",
    # re-attest: derivative now has ONE implementation for every
    # (unit, nonNegative) combo under the shared null policy (review
    # r10b) — values bit-identical on the null-free store, but the
    # plan changed; contamination_overlap rotates out (leakage family
    # stays in-window via the suite_round5 split_leakage_guard arm)
    "flux_compiled_derivative",
    # + cov() (the covariance sibling of pearsonr — same combiner
    # machinery) and tail() (per-table last-N); bm25_search and
    # embedding_dedup_clusters rotate out (search stays in-window via
    # the suite_round5 hybrid_search_rrf arm; embedding family via
    # embedding_topk/ivf + the PQ suite arms)
    "flux_compiled_cov",
    "flux_compiled_tail",
    # + the round-10c batch (20 new stages: mode/skew/stateCount/CMO/
    # kaufmansER/sample/toFloat+toInt/limit-offset/highest*+lowest*/
    # fused histogramQuantile/doubleEMA/tripleEMA/RSI, plus
    # aggregateWindow period:/offset:/calendar-1mo and the
    # value-series |> aggregateWindow composition), driver-attested
    # through ONE suite whose oracle embeds all 23 new singletons'
    # registered SQL verbatim (the suite_round5 precedent); ewma_final
    # yields the slot — the Arrow per-series recurrence family it
    # represents is freshly attested by the in-window flux_compiled_ema
    # plus the three new kernel arms, and its own r7 row stays recorded
    "suite_flux_round10c",
    "flux_compiled_mean",
    "flux_compiled_group_merge",
    "flux_compiled_gauge",
    # --- rotation (VERDICT r9 item 2, two rounds overdue), oldest-
    # green first: 24 of the 36 r7-green singletons whose own rows are
    # now two rounds old. Left out (slots exhausted): pack_sequences
    # (arm-attested by the in-window suite_round5, which embeds its
    # oracle verbatim), the two multimodal queries (deterministic
    # codec stubs, code untouched since r7 — lowest real-user risk),
    # winnow_fingerprints, weighted_sample_docs and vocab_coverage,
    # plus — displaced by the six later-landed flux rows above, each
    # family still in-window via a sibling or suite arm —
    # bpe_token_stats (bpe_encode_stats stays), embedding_quantized_topk
    # and embedding_neardup_pairs (topk/ivf/dedup_clusters stay; PQ via
    # suite_round5), doc_repetition (doc_profile/doc_chunks stay),
    # similar_part_names (ngram_jaccard_pairs stays), top_ngrams
    # (trigram_familiarity is a suite_round5 arm); all twelve lead the
    # next rotation. ---
    "asof_nearest_click",
    "bpe_encode_stats",
    "dedup_clusters",
    "dedup_exact",
    "doc_chunks",
    "doc_profile",
    "embedding_ivf_topk",
    "embedding_topk",
    "heavy_hitter_verify",
    "last_value_per_type",
    "minhash_lsh_verify",
    "ngram_jaccard_pairs",
    "pack_sequences_sharded",
    "sampling_splits",
    "scrub_pii",
    "session_windows_5m",
    "simhash_verify",
    "unpivot_lineitem",
    # --- always-checked core: flagships + suites (9) ---
    "window_5m_mean",
    "flux_pipeline_mean",
    "window_5m_mean_bucketed",
    "suite_scans",
    "suite_joins",
    "suite_grouping",
    "suite_window_fns",
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
