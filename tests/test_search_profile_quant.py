"""Property tests for the round-4 additions: BM25 search, token-window
chunking, table profiling, int8-quantized ANN, histogram, linear trend.

The oracle-parity suite already pins cross-engine value equality; these
tests pin the SEMANTIC invariants the oracle can't see (recall floors,
coverage reconstructions, known-answer fixtures).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from time_series_data_pipeline_spark.catalog import table
from time_series_data_pipeline_spark.operators import profile as prof
from time_series_data_pipeline_spark.operators import search as srch
from time_series_data_pipeline_spark.operators import similarity as sim
from time_series_data_pipeline_spark.operators import text as tx
from time_series_data_pipeline_spark.operators import timeseries as ts_ops

from .conftest import SF_SMOKE


# ---------------------------------------------------------------- BM25


def test_bm25_ranks_matching_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="spark spark spark join"),
            Row(doc_id=1, text="spark join"),
            Row(doc_id=2, text="nothing relevant here at all"),
            Row(doc_id=3, text="join " + "filler " * 50),
        ]
    )
    out = srch.bm25_topk(docs, ["spark", "join"], k=10).collect()
    by_id = {r.doc_id: r for r in out}
    # non-matching doc is dropped
    assert 2 not in by_id
    # doc 0 (more matched terms, higher tf) outranks everything
    assert by_id[0].rank == 1
    # longer doc with same tf scores lower than the short one (length norm)
    assert by_id[1].score > by_id[3].score


def test_bm25_rank_is_dense_and_ordered(spark):
    out = srch.bm25_topk(
        table(spark, SF_SMOKE, "documents"), ["spark", "window"], k=25
    ).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


# ------------------------------------------------------------- chunking


def test_chunk_coverage_and_overlap(spark):
    n_tok = 150  # -> chunks at starts 0,48,96 (full) and 144 (tail)
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=" ".join(f"w{i}" for i in range(n_tok)))]
    )
    rows = sorted(
        tx.chunk_docs(docs, size=64, stride=48).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    # every chunk but the last is full; the last covers through the end
    assert [r.n_tokens for r in rows] == [64, 64, 54]
    # starts advance by stride: last chunk starts at 96, 96+54 = 150 = dl
    assert 96 + rows[-1].n_tokens == n_tok


def test_chunk_short_and_empty_docs_emit_one_chunk(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="one two"), Row(doc_id=1, text="")]
    )
    rows = tx.chunk_docs(docs, size=64, stride=48).collect()
    assert {(r.doc_id, r.chunk_idx, r.n_tokens) for r in rows} == {
        (0, 0, 2),
        (1, 0, 0),
    }


def test_chunk_ids_reconstruct_corpus_token_count(spark):
    """Σ n_tokens == Σ dl + overlap double-count: with stride 48/size 64
    every non-final chunk double-counts exactly (64-48)=16 tokens of its
    successor's window — checked per doc."""
    docs = table(spark, SF_SMOKE, "documents")
    chunks = tx.chunk_docs(docs, size=64, stride=48)
    agg = (
        chunks.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("sum_ct"), F.count("*").alias("n_chunks"))
        .join(
            docs.select(
                "doc_id", F.size(tx.tokens("text")).alias("dl")
            ),
            "doc_id",
        )
    )
    bad = agg.filter(
        F.col("sum_ct") != F.col("dl") + (F.col("n_chunks") - 1) * 16
    ).count()
    assert bad == 0


# ------------------------------------------------------------ profiling


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [
            Row(a=1.0, s="x", d=None),
            Row(a=None, s="y", d=None),
            Row(a=2.5, s="x", d=None),
        ],
        schema="a double, s string, d timestamp",
    )
    rows = {r.col_name: r for r in prof.profile_columns(
        df, numeric=["a"], string=["s"], temporal=["d"]
    ).collect()}
    assert rows["a"].n_nulls == 1 and rows["a"].n_distinct == 2
    assert rows["a"].min_v == "1.00" and rows["a"].max_v == "2.50"
    assert rows["s"].n_nulls == 0 and rows["s"].n_distinct == 2
    assert rows["d"].n_nulls == 3 and rows["d"].min_v is None


def test_profile_is_single_scan(spark):
    df = table(spark, SF_SMOKE, "lineitem")
    plan = prof.profile_columns(
        df, numeric=["l_quantity"], string=["l_returnflag"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


# ----------------------------------------------------- int8 quantization


def test_quantized_topk_recall_vs_exact(spark):
    emb = table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_topk(emb, queries, k=10).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in sim.quantized_topk(emb, queries, dim=64, k=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    # global-scale symmetric int8 keeps brute-force top-10 nearly
    # intact (measured 1.0 at sf0.001/sf0.01)
    assert recall >= 0.9, f"quantized recall {recall:.3f}"


def test_int8_codes_bounds(spark):
    emb = table(spark, SF_SMOKE, "embeddings")
    scale = sim.max_abs(emb)
    coded = sim.int8_codes(emb, scale)
    stats = coded.select(
        F.min(F.array_min("codes")).alias("cmin"),
        F.max(F.array_max("codes")).alias("cmax"),
        F.max(
            F.greatest(F.abs(F.array_min("codes")), F.abs(F.array_max("codes")))
        ).alias("cabs"),
    ).collect()[0]
    assert -127 <= stats.cmin and stats.cmax <= 127
    # the element that set the scale maps to a full-magnitude code
    assert stats.cabs == 127


# ------------------------------------------------------------- histogram


def test_histogram_counts_total_and_domain(spark):
    ev = table(spark, SF_SMOKE, "events")
    hist = ts_ops.histogram(ev, "value", ["event_type"], bins=20).collect()
    assert sum(r.n for r in hist) == ev.count()
    assert all(0 <= r.bin <= 19 for r in hist)
    lo = ev.agg(F.min("value")).collect()[0][0]
    hi = ev.agg(F.max("value")).collect()[0][0]
    assert all(
        math.isclose(r.domain_lo, lo, abs_tol=1e-9)
        and math.isclose(r.domain_hi, hi, abs_tol=1e-9)
        for r in hist
    )


# ---------------------------------------------------------- linear trend


def test_linear_trend_recovers_exact_line(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            ts=base + dt.timedelta(seconds=10 * i),
            value=float(2 * (10 * i) + 5),  # y = 2x + 5 in rebased seconds
            event_type="a",
        )
        for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    out = ts_ops.linear_trend(df, "ts", "value", ["event_type"]).collect()[0]
    assert out.n == 100
    assert math.isclose(out.slope_per_s, 2.0, abs_tol=1e-9)
    assert math.isclose(out.intercept, 5.0, abs_tol=1e-6)


def test_linear_trend_ignores_null_values(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(ts=base + dt.timedelta(seconds=i), value=v, event_type="a")
        for i, v in enumerate([1.0, None, 3.0, None, 5.0])
    ]
    df = spark.createDataFrame(rows, schema="ts timestamp, value double, event_type string")
    out = ts_ops.linear_trend(df, "ts", "value", ["event_type"]).collect()[0]
    assert out.n == 3  # null rows excluded from every sufficient statistic
    # surviving points (0,1),(2,3),(4,5) lie on y = x + 1
    assert math.isclose(out.slope_per_s, 1.0, abs_tol=1e-9)
    assert math.isclose(out.intercept, 1.0, abs_tol=1e-6)


# --------------------------------------------------------- plan hygiene


@pytest.mark.parametrize(
    "build",
    [
        lambda spark: srch.bm25_topk(
            table(spark, SF_SMOKE, "documents"), ["spark"], k=10
        ),
        lambda spark: sim.quantized_topk(
            table(spark, SF_SMOKE, "embeddings"),
            table(spark, SF_SMOKE, "embeddings").filter(F.col("vec_id") < 5),
            dim=64,
        ),
    ],
    ids=["bm25", "quantized_topk"],
)
def test_small_side_is_broadcast(spark, build):
    plan = build(spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


# ------------------------------------------------------- interval merge


def test_merge_intervals_bridges_and_splits(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    mk = lambda s: base + dt.timedelta(seconds=s)
    rows = [
        # long interval (60s) bridges an event 30s later...
        Row(user_id=1, event_id=0, ts=mk(0), dur=60_000_000),
        Row(user_id=1, event_id=1, ts=mk(30), dur=5_000_000),
        # ...but a 5s interval does NOT bridge a 30s gap
        Row(user_id=1, event_id=2, ts=mk(100), dur=5_000_000),
        # touching intervals merge (end == next start)
        Row(user_id=2, event_id=3, ts=mk(0), dur=10_000_000),
        Row(user_id=2, event_id=4, ts=mk(10), dur=10_000_000),
    ]
    from time_series_data_pipeline_spark.operators.timeseries import merge_intervals

    out = merge_intervals(
        spark.createDataFrame(rows), "ts", F.col("dur"), ["user_id"], "event_id"
    ).collect()
    got = {(r.user_id, r.island): (r.interval_start, r.interval_end, r.n_events) for r in out}
    assert got[(1, 1)] == (mk(0), mk(60), 2)
    assert got[(1, 2)] == (mk(100), mk(105), 1)
    assert got[(2, 1)] == (mk(0), mk(20), 2)


def test_merge_intervals_conserves_events(spark):
    ev = table(spark, SF_SMOKE, "events").filter(F.col("value").isNotNull())
    from time_series_data_pipeline_spark.operators.timeseries import merge_intervals

    out = merge_intervals(
        ev, "ts", F.floor(F.col("value") * 1e6).cast("long"), ["user_id"], "event_id"
    )
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # islands are disjoint per user: start of island i+1 > end of island i
    w_bad = out.alias("a").join(
        out.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.island") == F.col("a.island") + 1)
        & (F.col("b.interval_start") <= F.col("a.interval_end")),
    )
    assert w_bad.count() == 0


# ----------------------------------------------------- weighted sampling


def test_weighted_sample_is_stable_and_weight_biased(spark):
    from time_series_data_pipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    a = weighted_sample_topk(docs, "doc_id", "n_chars", k=100).collect()
    b = weighted_sample_topk(
        docs.repartition(7), "doc_id", "n_chars", k=100
    ).collect()
    # identical selection and ranks under any partitioning
    assert {(r.doc_id, r.rank) for r in a} == {(r.doc_id, r.rank) for r in b}
    # heavier-than-average docs should be overrepresented in the sample
    mean_all = docs.agg(F.avg("n_chars")).collect()[0][0]
    mean_sampled = sum(r.n_chars for r in a) / len(a)
    assert mean_sampled > mean_all


# ------------------------------------------------------ product quantization


def test_pq_rerank_recall_vs_exact(spark):
    emb = table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_topk(emb, queries, k=10).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in sim.pq_topk(emb, queries, dim=64, k=10).collect()
    }
    rr = {
        (r.query_id, r.neighbor_id)
        for r in sim.pq_topk_rerank(emb, queries, dim=64, k=10).collect()
    }
    # pure-ADC ranking on iid synthetic vectors (PQ's worst case — no
    # correlation structure to exploit): measured 0.6 sf0.001 / 0.46
    # sf0.01 at (m=16, ksub=64)
    assert len(exact & adc) / len(exact) >= 0.4
    # exact re-rank of the ADC top-100 restores the ranking: measured
    # 1.0 sf0.001 / 0.98 sf0.01
    assert len(exact & rr) / len(exact) >= 0.9


def test_pq_codes_shape_and_determinism(spark):
    emb = table(spark, SF_SMOKE, "embeddings")
    cb = sim.pq_codebooks(emb, dim=64, m=16, ksub=8)
    assert len(cb) == 16 and len(cb[0]) == 8 and len(cb[0][0]) == 4
    # codebooks are an md5-rank sample — identical on any partitioning
    cb2 = sim.pq_codebooks(emb.repartition(13), dim=64, m=16, ksub=8)
    assert cb == cb2
    codes = sim.pq_encode(emb, cb, dim=64).collect()
    assert all(len(r["codes"]) == 16 for r in codes)
    assert all(1 <= c <= 8 for r in codes for c in r["codes"])
