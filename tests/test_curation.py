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


def test_duplicate_spans_planted_localization(spark):
    # plant one exact 10-token substring inside otherwise-disjoint docs
    # and require the operator to localize exactly that span
    shared = "q w e r t y u i o p".split()
    a = [f"a{i}" for i in range(7)] + shared + [f"z{i}" for i in range(5)]
    b = [f"b{i}" for i in range(3)] + shared + [f"y{i}" for i in range(9)]
    c = [f"c{i}" for i in range(20)]  # no overlap with anything
    docs = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b)), (2, " ".join(c))],
        "doc_id long, text string",
    )
    spans = cu.duplicate_spans(docs, k=6, min_tokens=8, max_df=10).collect()
    assert len(spans) == 1
    r = spans[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)
    assert r["a_start"] == 7 and r["b_start"] == 3 and r["n_tokens"] == 10


def test_duplicate_spans_independent_runs_stay_separate(spark):
    # two disjoint shared runs between the same pair must come back as
    # two spans, not merge across the gap
    s1 = "m1 m2 m3 m4 m5 m6 m7 m8".split()
    s2 = "n1 n2 n3 n4 n5 n6 n7 n8 n9".split()
    a = s1 + ["ga"] + s2
    b = ["h1", "h2"] + s1 + ["gb", "gc"] + s2 + ["h3"]
    docs = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b))], "doc_id long, text string"
    )
    spans = {
        (r["a_start"], r["b_start"], r["n_tokens"])
        for r in cu.duplicate_spans(docs, k=6, min_tokens=8, max_df=10).collect()
    }
    assert spans == {(0, 2, 8), (9, 12, 9)}


def test_dsir_weight_moves_toward_target_grams(spark):
    # two probe docs with the SAME number of bigrams, all novel except
    # that one swaps its last gram for the target corpus's signature
    # bigram — that doc must score strictly higher. (Same-length probes
    # matter: DSIR's weight is a SUM of per-gram log-ratios, and under
    # add-one smoothing every additional gram shifts the sum, so only
    # a like-for-like gram swap isolates target affinity.)
    rows = [(i, "tt1 tt2 tt1 tt2 tt1 tt2", "en") for i in range(8)]
    rows += [(8 + i, f"u{i}a u{i}b u{i}c u{i}d", "de") for i in range(8)]
    rows += [(100, "p1 p2 p3 p4", "de"), (101, "q1 q2 tt1 tt2", "de")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in cu.dsir_logweights(docs, F.col("lang") == "en").collect()
    }
    assert w[101] > w[100]


def test_span_dedup_apply_planted(spark):
    shared = "q w e r t y u i o p".split()
    a = [f"a{i}" for i in range(7)] + shared + [f"z{i}" for i in range(5)]
    b = [f"b{i}" for i in range(3)] + shared + [f"y{i}" for i in range(9)]
    c = [f"c{i}" for i in range(20)]
    docs = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b)), (2, " ".join(c))],
        "doc_id long, text string",
    )
    spans = cu.duplicate_spans(docs, k=6, min_tokens=8, max_df=10)
    out = {
        r["doc_id"]: r
        for r in cu.remove_duplicate_spans(docs, spans).collect()
    }
    import hashlib

    def h(toks):
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    # doc 0 (earlier) keeps everything; doc 1 loses exactly the span;
    # doc 2 untouched
    assert out[0]["n_tokens_after"] == len(a)
    assert out[0]["cleaned_hash"] == h(a)
    assert out[1]["n_tokens_before"] == len(b)
    assert out[1]["n_tokens_after"] == len(b) - len(shared)
    assert out[1]["cleaned_hash"] == h([t for t in b if t not in shared])
    assert out[2]["cleaned_hash"] == h(c)


def test_span_dedup_apply_corpus_invariants(spark):
    docs = table(spark, SF_SMOKE, "documents")
    spans = cu.duplicate_spans(docs, k=6, min_tokens=8, max_df=10)
    out = cu.remove_duplicate_spans(docs, spans).collect()
    assert len(out) == docs.count()  # every doc gets a row
    victims = {r["id_b"] for r in spans.collect()}
    for r in out:
        assert r["n_tokens_after"] <= r["n_tokens_before"]
        if r["doc_id"] not in victims:
            assert r["n_tokens_after"] == r["n_tokens_before"]
        else:
            assert r["n_tokens_after"] < r["n_tokens_before"]


def test_mixture_plan_feasibility(spark):
    out = {r["lang"]: r for r in QUERIES["mixture_plan"](spark, SF_SMOKE).collect()}
    assert set(out) == {"en", "es", "de", "fr", "zh"}
    weights = {"en": 0.5, "es": 0.2, "de": 0.15, "fr": 0.1, "zh": 0.05}
    budget = min(r["n_tokens"] / weights[lg] for lg, r in out.items())
    for lg, r in out.items():
        # never oversample; the binding group saturates at rate 1
        assert 0 < r["sample_rate"] <= 1.0
        assert r["expected_tokens"] <= r["n_tokens"] + 1e-6
        assert abs(r["expected_tokens"] - budget * weights[lg]) < 1e-3
    assert any(abs(r["sample_rate"] - 1.0) < 1e-9 for r in out.values())


# ---------------------------------------------------- property tests

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    def _ref_spans(docs, k=6, min_tokens=8, max_df=10):
        """Pure-Python reference for duplicate_spans: same gram/df-cap/
        diagonal-merge semantics, written independently of Spark."""
        toks = {i: t.lower().split() for i, t in docs.items()}
        grams = {
            i: [tuple(t[p : p + k]) for p in range(len(t) - k + 1)]
            for i, t in toks.items()
        }
        df = {}
        for i, gs in grams.items():
            for g in set(gs):
                df[g] = df.get(g, 0) + 1
        ok = {g for g, n in df.items() if 2 <= n <= max_df}
        out = set()
        ids = sorted(docs)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                matches = {}
                for i, g in enumerate(grams[a]):
                    if g not in ok:
                        continue
                    for j, g2 in enumerate(grams[b]):
                        if g2 == g:
                            matches.setdefault(j - i, []).append(i)
                for d, pos in matches.items():
                    pos = sorted(set(pos))
                    run = [pos[0]]
                    for p in pos[1:]:
                        if p == run[-1] + 1:
                            run.append(p)
                        else:
                            n = run[-1] - run[0] + k
                            if n >= min_tokens:
                                out.add((a, b, run[0], run[0] + d, n))
                            run = [p]
                    n = run[-1] - run[0] + k
                    if n >= min_tokens:
                        out.add((a, b, run[0], run[0] + d, n))
        return out

    _WORDS = ["w%d" % i for i in range(6)]

    @given(
        docs=st.lists(
            st.lists(st.sampled_from(_WORDS), min_size=0, max_size=24),
            min_size=2,
            max_size=4,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_duplicate_spans_matches_reference(spark, docs):
        # tiny alphabet makes shared 6-grams likely, so the property
        # exercises real matches, not just empty outputs
        dmap = {i: " ".join(t) for i, t in enumerate(docs)}
        sdf = spark.createDataFrame(
            list(dmap.items()), "doc_id long, text string"
        )
        got = {
            (r["id_a"], r["id_b"], r["a_start"], r["b_start"], r["n_tokens"])
            for r in cu.duplicate_spans(
                sdf, k=6, min_tokens=8, max_df=10
            ).collect()
        }
        assert got == _ref_spans(dmap)


def test_distribution_drift_semantics(spark):
    # identical distributions -> all three metrics collapse to ~0;
    # disjoint vocabularies -> clearly positive and KL >= 0, tvd <= 1
    same = spark.createDataFrame(
        [(i, "a b c d e f", i % 2 == 0) for i in range(20)],
        "doc_id long, text string, is_t boolean",
    )
    r0 = cu.distribution_drift(same, F.col("is_t")).collect()[0]
    assert abs(r0["kl_target_rest"]) < 1e-6
    assert abs(r0["kl_rest_target"]) < 1e-6
    assert abs(r0["tvd"]) < 1e-6
    disjoint = spark.createDataFrame(
        [(i, "a b c d e f" if i % 2 == 0 else "u v w x y z", i % 2 == 0)
         for i in range(20)],
        "doc_id long, text string, is_t boolean",
    )
    r1 = cu.distribution_drift(disjoint, F.col("is_t")).collect()[0]
    assert r1["kl_target_rest"] > 0.01 and r1["kl_rest_target"] > 0.01
    assert 0.01 < r1["tvd"] <= 1.0
    # corpus query: en vs rest genuinely differ on this corpus
    r = QUERIES["corpus_drift"](spark, SF_SMOKE).collect()[0]
    assert r["tvd"] > 0.05 and r["n_buckets_hit"] > 100


def test_mixture_plan_rejects_absent_and_zero_token_groups(spark):
    """A weighted group missing from the corpus (or present with zero
    tokens) must raise at execution, not silently overstate the
    servable budget / emit a NaN sample_rate (ADVICE r5)."""
    import pandas as pd
    import pytest as _pytest

    from time_series_data_pipeline_spark.operators import curation as cu

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"lang": ["en", "en", "de"], "text": ["a b c", "d e", "f g h i"]}
        )
    )
    with _pytest.raises(Exception, match="absent from the corpus"):
        cu.mixture_plan(docs, {"en": 0.5, "de": 0.3, "xx": 0.2}).collect()
    empties = spark.createDataFrame(
        pd.DataFrame({"lang": ["en", "de"], "text": ["a b", ""]})
    )
    with _pytest.raises(Exception, match="zero tokens"):
        cu.mixture_plan(empties, {"en": 0.5, "de": 0.5}).collect()
    with _pytest.raises(ValueError, match="non-empty"):
        cu.mixture_plan(docs, {})
