"""Semantic tests for the curation operators (DSIR importance weights,
exact-substring duplicate spans, RRF hybrid fusion) beyond the DuckDB
hash parity that test_oracle_parity already runs for each."""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_data_pipeline_spark.catalog import table
from time_series_data_pipeline_spark.operators import curation as cu
from time_series_data_pipeline_spark.queries import QUERIES

from .conftest import SF_SMOKE


def test_dsir_separates_target_from_rest(spark):
    # The whole point of DSIR: docs drawn from the target distribution
    # (lang='en') must average a clearly higher log-weight than docs
    # from any other language.
    w = QUERIES["dsir_weights"](spark, SF_SMOKE)
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    by_lang = {
        r["lang"]: r["m"]
        for r in w.join(docs, "doc_id")
        .groupBy("lang")
        .agg(F.avg("dsir_logw").alias("m"))
        .collect()
    }
    assert by_lang["en"] == max(by_lang.values())
    for lang, m in by_lang.items():
        if lang != "en":
            assert by_lang["en"] > m + 1.0, (lang, m, by_lang["en"])


def test_dsir_partitioning_invariance(spark):
    # decimal Σ c·L is associative: any partitioning yields the same
    # weights bit-for-bit
    docs = table(spark, SF_SMOKE, "documents")
    a = cu.dsir_logweights(docs, F.col("lang") == "en").collect()
    b = cu.dsir_logweights(docs.repartition(7, "source"), F.col("lang") == "en").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_duplicate_spans_are_real_and_maximal(spark):
    docs = table(spark, SF_SMOKE, "documents")
    spans = cu.duplicate_spans(docs, k=6, min_tokens=8, max_df=10).collect()
    assert spans, "smoke corpus has known near-dup pairs, expected spans"
    toks = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id",
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "").alias("t"),
        ).collect()
    }
    for r in spans:
        a, b = toks[r["id_a"]], toks[r["id_b"]]
        i, j, n = r["a_start"], r["b_start"], r["n_tokens"]
        assert r["id_a"] < r["id_b"]
        assert n >= 8
        # the claimed span is token-identical in both documents
        assert a[i : i + n] == b[j : j + n], (r, a[i : i + n], b[j : j + n])
        # and maximal: extending one token either side breaks equality
        # (or runs off a document edge)
        if i > 0 and j > 0:
            assert a[i - 1] != b[j - 1], ("left-extensible", r)
        if i + n < len(a) and j + n < len(b):
            assert a[i + n] != b[j + n], ("right-extensible", r)


def test_duplicate_spans_df_cap_prunes_stopgrams(spark):
    # with max_df=1 every gram is either unshared or over the cap, so
    # no spans can be witnessed at all — the cap genuinely gates the
    # candidate generation rather than filtering output
    docs = table(spark, SF_SMOKE, "documents")
    assert cu.duplicate_spans(docs, k=6, min_tokens=8, max_df=1).count() == 0


def test_rrf_formula_and_ordering(spark):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    dense = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank long"
    )
    out = {r["doc_id"]: r for r in cu.rrf_fuse(lex, dense, k=4).collect()}
    # doc 2 appears in both lists: 1/62 + 1/61
    assert abs(out[2]["rrf_score"] - round(1 / 62 + 1 / 61, 9)) < 1e-12
    # single-list docs score 1/(60+rank)
    assert abs(out[1]["rrf_score"] - round(1 / 61, 9)) < 1e-12
    assert abs(out[4]["rrf_score"] - round(1 / 62, 9)) < 1e-12
    # both-lists doc outranks everything; rank 1..k dense, tie-broken by id
    assert out[2]["rank"] == 1
    assert [out[d]["rank"] for d in (2, 1, 4, 3)] == [1, 2, 3, 4]


def test_hybrid_query_k_rows(spark):
    df = QUERIES["hybrid_search_rrf"](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == 10
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, 11))
    # scores non-increasing in rank
    by_rank = sorted(rows, key=lambda r: r["rank"])
    for x, y in zip(by_rank, by_rank[1:]):
        assert x["rrf_score"] >= y["rrf_score"]


def test_curation_pipeline_manifest(spark):
    rows = QUERIES["curation_pipeline"](spark, SF_SMOKE).collect()
    docs_n = table(spark, SF_SMOKE, "documents").count()
    # exactly one verdict per document — nothing dropped, nothing duplicated
    assert len(rows) == docs_n
    assert len({r["doc_id"] for r in rows}) == docs_n
    reasons = {r["reason"] for r in rows}
    assert reasons <= {
        "exact_dup", "near_dup", "repetitive", "low_quality",
        "off_target", "kept",
    }
    # keep is exactly the 'kept' verdict, and the pipeline keeps a
    # nontrivial fraction while rejecting a nontrivial fraction
    for r in rows:
        assert r["keep"] == (r["reason"] == "kept")
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < docs_n
    # every near-dup cluster retains at least its keeper: kept set plus
    # singleton docs must cover every cluster id
    from time_series_data_pipeline_spark.queries.extensions import (
        dedup_clusters_q,
    )
    by_doc = {r["doc_id"]: r["reason"] for r in rows}
    for c in dedup_clusters_q(spark, SF_SMOKE).collect():
        if c["is_keeper"]:
            assert by_doc[c["doc_id"]] not in ("exact_dup", "near_dup")
