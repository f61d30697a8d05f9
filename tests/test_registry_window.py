"""The driver's correctness gate checks only the FIRST 50 registry
entries — ordering is part of the driver contract (VERDICT r4 item 1),
so pin it: the checked window must be exactly the explicit list in
queries/__init__, every registered query must still be reachable, and
no name may silently drop out of the registry on reorder."""

from time_series_data_pipeline_spark.queries import ORACLE, QUERIES
from time_series_data_pipeline_spark.queries import _CHECKED_WINDOW


def test_checked_window_is_first_50():
    assert len(_CHECKED_WINDOW) == 50
    assert len(set(_CHECKED_WINDOW)) == 50
    assert list(QUERIES)[:50] == _CHECKED_WINDOW


def test_never_checked_r4_queries_lead_the_window():
    # the 15 queries that had no driver row in rounds 1-4 go first so a
    # driver cap tighter than 50 still reaches them
    never_checked = {
        "bm25_search", "dedup_clusters", "embedding_dedup_clusters",
        "contamination_overlap", "doc_repetition", "profile_columns",
        "embedding_quantized_topk", "doc_chunks", "bpe_encode_stats",
        "vocab_coverage", "weighted_sample_docs", "simhash_verify",
        "lsh_ann_verify", "heavy_hitter_verify", "bpe_learn_merges",
    }
    assert set(_CHECKED_WINDOW[:15]) == never_checked


def test_oracles_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)
    # rows-only queries are the documented sketch/sequential set
    rows_only = set(QUERIES) - set(ORACLE)
    assert rows_only == {
        "ewma_value", "minhash_lsh_pairs", "simhash_pairs",
        "embedding_lsh_ann", "heavy_hitter_tokens", "bpe_learn_merges",
    }


def test_folded_singletons_remain_registered():
    # the suite folds these; they stay available as singletons below the
    # cap so a user can still run them directly
    for name in (
        "value_percentiles", "anomaly_mad", "value_trend_per_type",
        "time_weighted_avg", "counter_increase", "json_props_stats",
        "funnel_view_click_purchase", "event_transitions",
        "weekly_retention",
    ):
        assert name in QUERIES and name in ORACLE
