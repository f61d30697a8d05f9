"""Edge-case goldens for the text operators: empty/whitespace docs,
short docs (< shingle width), punctuation, BPE splits — the inputs a
100 TB crawl corpus is full of and the sf testdata doesn't contain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_data_pipeline_spark.operators import text as tx


@pytest.fixture(scope="module")
def edge_docs(spark):
    rows = [
        (0, ""),                       # empty
        (1, "   \t  "),                # whitespace only
        (2, "one"),                    # single token (< shingle width)
        (3, "two words"),              # 2 tokens (< shingle width)
        (4, "a b c"),                  # exactly one 3-shingle
        (5, "a b c d"),                # two 3-shingles
        (6, "Hello, world! 123 x2"),   # punctuation + digits
        (7, "the the the the"),        # repeated token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _col(df, expr, alias="x"):
    return {r["doc_id"]: r[alias] for r in df.select("doc_id", expr.alias(alias)).collect()}


def test_tokens_edges(spark, edge_docs):
    got = _col(edge_docs, tx.tokens("text"))
    assert got[0] == [] and got[1] == []
    assert got[2] == ["one"]
    assert got[6] == ["hello,", "world!", "123", "x2"]
    assert got[7] == ["the"] * 4


def test_shingles_edges(spark, edge_docs):
    got = _col(edge_docs, tx.shingles(tx.tokens("text")))
    assert got[0] == [] and got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["a b c"]
    assert got[5] == ["a b c", "b c d"]
    assert got[7] == ["the the the"]  # distinct collapses repeats


def test_shingle_hashes_match_shingles(spark, edge_docs):
    n_sh = _col(edge_docs, F.size(tx.shingles(tx.tokens("text"))))
    n_h = _col(edge_docs, F.size(tx.shingle_hashes(tx.tokens("text"))))
    assert n_sh == n_h


def test_bpe_tokens_edges(spark, edge_docs):
    got = _col(edge_docs, tx.bpe_tokens("text"))
    assert got[0] == [] and got[1] == []
    # case preserved; punctuation split off; digit runs kept whole
    assert got[6] == ["Hello", ",", "world", "!", "123", "x", "2"]


def test_quality_and_langid_no_crash_on_empty(spark, edge_docs):
    """Degenerate docs must not divide by zero or throw — NULL ratios
    are the contract for token-free documents."""
    q = tx.quality_score(edge_docs).filter(F.col("doc_id") <= 1).collect()
    assert len(q) == 2
    for r in q:
        assert r["n_tokens"] == 0
    lid = {r["doc_id"]: r["predicted_lang"] for r in tx.lang_id(edge_docs).collect()}
    assert lid[0] == "und"


def test_scrub_pii_goldens(spark):
    rows = [
        (0, "contact me at jane.doe+x@example.co.uk or visit https://ex.com/a?b=1 now"),
        (1, "no pii here"),
        (2, "two mails a@b.io c@d.org and http://x.y plus https://z.w/p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in tx.scrub_pii(df).collect()}
    assert got[0]["scrubbed"] == "contact me at <EMAIL> or visit <URL> now"
    assert (got[0]["n_emails"], got[0]["n_urls"]) == (1, 1)
    assert got[1]["scrubbed"] == "no pii here"
    assert (got[2]["n_emails"], got[2]["n_urls"]) == (2, 2)
    assert got[2]["scrubbed"] == "two mails <EMAIL> <EMAIL> and <URL> plus <URL>"


def test_clean_text_golden(spark):
    df = spark.createDataFrame([(0, "  a \t b\n\nc  ")], "doc_id long, text string")
    assert df.select(tx.clean_text("text").alias("x")).collect()[0]["x"] == "a b c"


def test_bpe_merges_well_formed():
    """Every merge component must be a single char or the product of an
    earlier merge — the property that makes rank-order application
    equivalent to true iterative BPE (operators/text.BPE_MERGES doc)."""
    formed = set()
    for a, b in tx.BPE_MERGES:
        for comp in (a, b):
            assert len(comp) == 1 or comp in formed, (
                f"merge component {comp!r} not buildable before its rule"
            )
        formed.add(a + b)


def test_bpe_encode_word_goldens():
    assert tx.bpe_encode_word("the") == ["the"]
    assert tx.bpe_encode_word("birth") == ["b", "i", "r", "th"]
    assert tx.bpe_encode_word("standing") == ["st", "and", "ing"]
    assert tx.bpe_encode_word("x") == ["x"]
    assert tx.bpe_encode_word("") == []
    # case-sensitive: uppercase never matches the lowercase table
    assert tx.bpe_encode_word("THE") == ["T", "H", "E"]


def test_bpe_encode_distributed_matches_reference(spark, edge_docs):
    """The Arrow-batched encoder must equal the pure-Python reference
    (pre-split + per-word merge fold) on every edge doc."""
    import re

    pat = re.compile(tx.BPE_SPLIT_RE)
    got = _col(tx.bpe_encode(edge_docs), F.col("bpe_tokens"))
    texts = {r["doc_id"]: r["text"] for r in edge_docs.collect()}
    for doc_id, text in texts.items():
        ref = [t for w in pat.findall(text) for t in tx.bpe_encode_word(w)]
        assert list(got[doc_id]) == ref, f"doc {doc_id}: {got[doc_id]} != {ref}"


def test_learn_bpe_merges_golden_and_wellformed(spark):
    from pyspark.sql import Row
    from time_series_data_pipeline_spark.operators.text import (
        bpe_encode_word,
        learn_bpe_merges,
    )

    # corpus: "aaab" x3, "aab" x2. Round 1: (a,a) freq 3*2+2=8 wins.
    # Round 2: "aaab"->(aa,a,b), "aab"->(aa,b); pairs (aa,a):3 and
    # (a,b):3 TIE -> lexicographically smallest ('a','b') wins.
    # Round 3: "aaab"->(aa,ab); (aa,ab):3 beats (aa,b):2.
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="aaab aaab aaab aab aab")]
    )
    merges = learn_bpe_merges(docs, n_merges=3, min_freq=2)
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]
    # well-formedness: every component is a single char or the product
    # of an earlier merge
    products = set()
    for a, b in merges:
        assert (len(a) == 1 or a in products) and (len(b) == 1 or b in products)
        products.add(a + b)
    # the learned table drives the reference encoder
    assert bpe_encode_word("aaab", tuple(merges)) == ["aaab"]
    assert bpe_encode_word("aab", tuple(merges)) == ["aa", "b"]


def test_learn_bpe_merges_partitioning_invariant(spark):
    from time_series_data_pipeline_spark.catalog import table as cat_table
    from time_series_data_pipeline_spark.operators.text import learn_bpe_merges

    docs = cat_table(spark, "/root/testdata/sf0.001", "documents")
    a = learn_bpe_merges(docs, n_merges=10)
    b = learn_bpe_merges(docs.repartition(13), n_merges=10)
    assert a == b and len(a) == 10
