"""Unit tests for the round-4 additions: connected-components dedup
clustering, repetition quality signals, n-gram contamination overlap,
and MAD outlier detection — hand-computable fixtures, exact expected
values (the oracle-parity suite covers the registered-query forms)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_data_pipeline_spark.operators import dedup as dd
from time_series_data_pipeline_spark.operators import graph as gr
from time_series_data_pipeline_spark.operators import text as tx
from time_series_data_pipeline_spark.operators import timeseries as ts_ops


def test_connected_components_chain_and_island(spark):
    # chain 1-2-3-4 (diameter 3) + island {10,11} + self-contained pair
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["component"]
        for r in gr.connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_raises_without_convergence(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        gr.connected_components(edges, max_iter=1)


def test_star_components_long_chain(spark):
    # diameter-29 chain: hash-min needs ~29 rounds, far past the auto
    # fallback's 5 — the star algorithm must finish well inside
    # max_iter=15 (O(log² n) rounds, diameter-independent)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["component"]
        for r in gr.connected_components(edges, max_iter=15).collect()
    }
    assert got == {i: 1 for i in range(1, 31)}


def test_star_matches_hashmin_on_random_graph(spark):
    import random

    rng = random.Random(11)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(70)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    star = {
        r["node"]: r["component"]
        for r in gr.connected_components(df, algorithm="star").collect()
    }
    hm = {
        r["node"]: r["component"]
        for r in gr.connected_components(df, algorithm="hashmin").collect()
    }
    assert star == hm and star


def test_dedup_clusters_keeper_election(spark):
    # two clusters: {1,2,3} (transitive via 2) and {7,9}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["id_a", "id_b"]
    )
    rows = {r["doc_id"]: r for r in gr.dedup_clusters(pairs).collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        1: 1, 2: 1, 3: 1, 7: 7, 9: 7
    }
    assert [d for d, r in sorted(rows.items()) if r["is_keeper"]] == [1, 7]


def test_repetition_stats_exact_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "x x x x"),        # all-repeat pathological doc
            (2, "a b c d e"),      # no repetition at all
            (3, "to be or not to be is to be"),  # "to be" dominates
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in tx.repetition_stats(docs).collect()}

    r1 = rows[1]  # tokens xxxx: bigrams ["x x"]*3, trigrams ["x x x"]*2
    assert r1["n_tokens"] == 4
    assert r1["dup_token_frac"] == pytest.approx(3 / 4)
    assert r1["top_bigram_frac"] == pytest.approx(1.0)
    assert r1["dup_trigram_frac"] == pytest.approx(1 / 2)
    assert r1["repetitive"] is True

    r2 = rows[2]
    assert r2["dup_token_frac"] == 0.0
    # top bigram occurs once -> dominance signal must NOT fire even
    # though 1/4 > 0.20
    assert r2["top_bigram_frac"] == pytest.approx(1 / 4)
    assert r2["repetitive"] is False

    r3 = rows[3]  # "to be" appears 3x among 8 bigrams
    assert r3["top_bigram_frac"] == pytest.approx(3 / 8)
    assert r3["repetitive"] is True


def test_ngram_overlap_pairs_counts_shared_distinct_grams(spark):
    shared = "one two three four five"
    probe = spark.createDataFrame(
        [(1, f"{shared} alpha beta"), (2, "nothing in common here at all")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        # doc 100 shares exactly the grams of `shared` + one extra
        # overlapping window; doc 200 shares nothing
        [(100, f"zz {shared} alpha"), (200, "completely different words everywhere")],
        ["doc_id", "text"],
    )
    got = {
        (r["probe_id"], r["corpus_id"]): r["n_shared_ngrams"]
        for r in dd.ngram_overlap_pairs(probe, corpus, n=5).collect()
    }
    # probe 1 grams: [one..five, two..alpha, three..beta]
    # corpus 100 grams: [zz..four, one..five, two..alpha]
    assert got == {(1, 100): 2}


def test_mad_outliers_spike_and_zero_mad(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 1, 1, 1, 100)]
        + [("b", float(v)) for v in (10, 12, 14, 16, 18)],
        ["event_type", "value"],
    )
    rows = {
        r["event_type"]: r
        for r in ts_ops.mad_outliers(df, "value", ["event_type"]).collect()
    }
    a = rows["a"]  # median 1, MAD 0 -> any deviation is an outlier
    assert a["median_value"] == 1.0 and a["mad"] == 0.0
    assert a["n_outliers"] == 1 and a["n_points"] == 5
    b = rows["b"]  # median 14, adev [4,2,0,2,4], MAD 2, cutoff 8.8956
    assert b["median_value"] == 14.0 and b["mad"] == 2.0
    assert b["n_outliers"] == 0


def test_mad_outliers_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0)],
        ["event_type", "value"],
    )
    [r] = ts_ops.mad_outliers(df, "value", ["event_type"]).collect()
    assert r["n_points"] == 3 and r["median_value"] == 2.0
