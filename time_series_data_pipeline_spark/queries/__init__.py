"""Query surface: importing this package populates the registry.

The driver's correctness gate checks only the FIRST 50 registry
entries (registration order), so ordering is part of the contract:
``_CHECKED_WINDOW`` below explicitly pins which 50 queries receive a
driver CORRECTNESS row this round. Policy (VERDICT r4 item 1):

* queries that have never had a driver row go first,
* queries whose last green row predates the current round go next,
* a core of always-checked flagships/suites fills the remainder —
  every operator family keeps at least one in-window representative
  (the ``suite_*`` queries verify many operators through one hash),
* long-stable singletons (hash-green in r1–r4, unchanged since)
  rotate below the cap; their operators stay covered via the suites.
"""

# Module import populates the registry dicts via the @query decorator.
from . import timeseries_q  # noqa: F401  isort: skip
from . import relational  # noqa: F401  isort: skip
from . import extensions  # noqa: F401  isort: skip
from .registry import ORACLE, QUERIES

# The 50 queries the driver will verify this round, in order.
_CHECKED_WINDOW = [
    # --- never driver-checked before round 5 (15) ---
    "bm25_search",
    "dedup_clusters",
    "embedding_dedup_clusters",
    "contamination_overlap",
    "doc_repetition",
    "profile_columns",
    "embedding_quantized_topk",
    "doc_chunks",
    "bpe_encode_stats",
    "vocab_coverage",
    "weighted_sample_docs",
    "simhash_verify",
    "lsh_ann_verify",
    "heavy_hitter_verify",
    "bpe_learn_merges",
    # --- green in r1–r3 but pushed below the cap in r4 (10) ---
    "bpe_token_stats",
    "doc_profile",
    "heavy_hitter_tokens",
    "multimodal_features",
    "multimodal_frame_sample",
    "sampling_splits",
    "scrub_pii",
    "similar_part_names",
    "top_ngrams",
    "winnow_fingerprints",
    # --- always-checked core: flagships, suites, sketch pairs (25) ---
    "window_5m_mean",
    "flux_pipeline_mean",
    "window_5m_mean_bucketed",
    "suite_scans",
    "suite_joins",
    "suite_grouping",
    "suite_window_fns",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_lsh_verify",
    "simhash_pairs",
    "embedding_topk",
    "embedding_neardup_pairs",
    "embedding_lsh_ann",
    "embedding_ivf_topk",
    "label_centroids",
    # suite_round5 hash-verifies all ten round-5 additions in one slot;
    # it displaced the rows-only ewma_value (weakest row — its family
    # stays attested via the in-window ewma_final oracle)
    "suite_round5",
    "ewma_final",
    "gap_fill_5m",
    "session_windows_5m",
    "asof_nearest_click",
    "unpivot_lineitem",
    "last_value_per_type",
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

__all__ = ["QUERIES", "ORACLE"]
