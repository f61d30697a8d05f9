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
    # --- round 7: new or changed this round go first (7).
    # pack_sequences_sharded is the new distributed pack (VERDICT r6
    # item 2); the four flux_compiled_* are the round's compiler
    # extensions (item 4); pack_sequences re-attests with the
    # HUGEINT-cast oracle fix that turns its r6 red row green (item 1)
    # — its implementation was also refactored for the shard path. ---
    "pack_sequences_sharded",
    "flux_compiled_derivative",
    "flux_compiled_moving_avg",
    "flux_compiled_row_moving_avg",
    "flux_compiled_increase",
    "flux_compiled_state_duration",
    "pack_sequences",
    # --- rotation (VERDICT r6 item 3), oldest-green first: the 34
    # registered singletons whose last own hash-green row is r5 and
    # which no in-window suite covers — includes the three *_verify
    # partners that re-attest the rows-only sketch/LSH ops. ---
    "asof_nearest_click",
    "bm25_search",
    "bpe_encode_stats",
    "bpe_token_stats",
    "contamination_overlap",
    "dedup_clusters",
    "dedup_exact",
    "doc_chunks",
    "doc_profile",
    "doc_repetition",
    "embedding_dedup_clusters",
    "embedding_ivf_topk",
    "embedding_neardup_pairs",
    "embedding_quantized_topk",
    "embedding_topk",
    "ewma_final",
    "heavy_hitter_verify",
    "label_centroids",
    "last_value_per_type",
    "minhash_lsh_verify",
    "multimodal_features",
    "multimodal_frame_sample",
    "ngram_jaccard_pairs",
    "profile_columns",
    "sampling_splits",
    "scrub_pii",
    "session_windows_5m",
    "simhash_verify",
    "similar_part_names",
    "top_ngrams",
    "unpivot_lineitem",
    "vocab_coverage",
    "weighted_sample_docs",
    "winnow_fingerprints",
    # (the five never-own-row suite arms — trailing_1h_mean,
    # state_duration, series_correlation, decimate_lttb,
    # holt_linear_final — stay attested as suite_round5 arms, which are
    # in-window below; two additionally re-attest through the compiled
    # flux_compiled_moving_avg / flux_compiled_state_duration forms)
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
