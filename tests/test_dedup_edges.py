"""Edge-case behavior of the dedup family: identical docs, empty docs,
sub-shingle-width docs, singleton corpus — inputs where candidate
generation could blow up or crash."""

from __future__ import annotations

import pytest

from time_series_data_pipeline_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def edge_corpus(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, text),
        (1, text),                              # exact duplicate of 0
        (2, text + " extra tail words here"),   # near-duplicate of 0
        (3, "completely different content with other tokens entirely"),
        (4, ""),                                # empty
        (5, "   "),                             # whitespace
        (6, "two words"),                       # < shingle width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_edges(spark, edge_corpus):
    groups = {r["keeper_id"]: r["n_copies"] for r in dd.exact_dedup_groups(edge_corpus).collect()}
    assert groups[0] == 2  # docs 0 and 1 collapse
    assert sum(groups.values()) == 7
    kept = {r["doc_id"] for r in dd.dedup_keep_first(edge_corpus).collect()}
    assert kept == {0, 2, 3, 4, 5, 6}  # min-id kept per content


def test_jaccard_edges(spark, edge_corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.jaccard_pairs(edge_corpus, 0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical docs
    # near-dup: doc0 has 6 shingles, doc2 has 10, all 6 shared -> 6/10
    assert (0, 2) in pairs
    assert abs(pairs[(0, 2)] - 0.6) < 1e-12
    # empty / sub-width docs never pair with anything (incl. each other)
    assert not any(4 in p or 5 in p or 6 in p for p in pairs)


def test_minhash_lsh_edges(spark, edge_corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dd.minhash_lsh_pairs(edge_corpus, 0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert not any(4 in p or 5 in p or 6 in p for p in pairs)


def test_simhash_identical_docs(spark, edge_corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.simhash_pairs(edge_corpus).collect()
    }
    assert pairs[(0, 1)] == 0  # identical prints


def test_singleton_corpus_yields_no_pairs(spark):
    one = spark.createDataFrame(
        [(0, "just one single document with enough tokens")],
        "doc_id long, text string",
    )
    assert dd.jaccard_pairs(one, 0.5).count() == 0
    assert dd.minhash_lsh_pairs(one, 0.5).count() == 0
    assert dd.simhash_pairs(one).count() == 0


def test_split_stability_under_growth(spark):
    """A key's train/val/test assignment must not change when the
    corpus grows — the no-leakage property of hash-based splitting."""
    from pyspark.sql import functions as F

    from time_series_data_pipeline_spark.operators.sampling import (
        train_val_test_split,
    )

    small = spark.range(100).withColumnRenamed("id", "doc_id")
    large = spark.range(1000).withColumnRenamed("id", "doc_id")
    s = {r["doc_id"]: r["split"] for r in train_val_test_split(small, "doc_id").collect()}
    l = {r["doc_id"]: r["split"] for r in train_val_test_split(large, "doc_id").collect()}
    assert all(l[k] == v for k, v in s.items())
    # all three splits realized at n=1000, roughly 90/5/5
    counts = {k: sum(1 for v in l.values() if v == k) for k in ("train", "val", "test")}
    assert counts["train"] > 800
    assert 10 <= counts["val"] <= 120 and 10 <= counts["test"] <= 120


def test_shingle_store_roundtrip(spark, edge_corpus, tmp_path):
    """Jaccard over a materialized shingle store equals the direct
    computation — the write-once amortization path for corpora
    processed by several dedup queries."""
    path = str(tmp_path / "shingles")
    dd.build_shingle_store(edge_corpus, path)
    store = dd.load_shingle_store(spark, path)
    direct = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dd.jaccard_pairs(edge_corpus, 0.5).collect()
    }
    via_store = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dd.jaccard_pairs(edge_corpus, 0.5, shingle_sets=store).collect()
    }
    assert direct == via_store and direct


def test_misra_gries_heavy_hitters_guarantees(spark):
    """Merged per-partition Misra-Gries summaries: (a) every item with
    true frequency > n/k appears; (b) estimates never exceed true
    counts and undercount by at most n/k."""
    from pyspark.sql import functions as F

    from time_series_data_pipeline_spark.catalog import table
    from time_series_data_pipeline_spark.operators.sketch import heavy_hitters
    from tests.conftest import SF_CORRECT

    toks = (
        table(spark, SF_CORRECT, "documents")
        .select(F.explode(F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")).alias("item"))
    )
    exact = {r["item"]: r["n"] for r in toks.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_total = sum(exact.values())
    k = 64
    est = {r["item"]: r["est_count"] for r in heavy_hitters(toks, "item", k=k, top=10_000).collect()}
    bound = n_total / k
    for item, cnt in exact.items():
        if cnt > bound:
            assert item in est, f"guaranteed heavy hitter {item!r} missing"
    for item, e in est.items():
        assert e <= exact[item]
        assert e >= exact[item] - bound
