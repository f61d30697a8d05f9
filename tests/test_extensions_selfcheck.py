"""Self-consistency checks for the APPROXIMATE operators — the ones the
DuckDB oracle can't grade (hash-dependent candidates, HLL estimates).
Each approximate path is pinned against its exact in-repo baseline at
sf0.01; bounds are set from measured values with safety margin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_data_pipeline_spark.catalog import table
from time_series_data_pipeline_spark.operators import dedup as dd
from time_series_data_pipeline_spark.operators import similarity as sim

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF_CORRECT, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_CORRECT, "embeddings")


def test_minhash_lsh_recall_vs_exact_jaccard(spark, docs):
    """r=2, b=32 banding at j>=0.5 has ~0.9999 candidate recall; the
    estimator threshold loses a little more. Measured 1.0; pin >= 0.9."""
    exact = {(r.id_a, r.id_b) for r in dd.jaccard_pairs(docs, 0.5).collect()}
    approx = {(r.id_a, r.id_b) for r in dd.minhash_lsh_pairs(docs, 0.5).collect()}
    assert exact, "fixture should contain near-dup documents"
    assert len(exact & approx) / len(exact) >= 0.9


def test_ivf_recall_vs_brute_force(spark, emb):
    """16 cells / 4 probes scores ~25% of the corpus per query.
    Measured recall@10 = 0.92; pin >= 0.7."""
    q = emb.filter(F.col("vec_id") < 5)
    bf = {(r.query_id, r.neighbor_id) for r in sim.cosine_topk(emb, q, k=10).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in sim.ivf_topk(emb, q, k=10).collect()}
    assert len(ivf) == len(bf) == 50  # k results per query either way
    assert len(bf & ivf) / len(bf) >= 0.7


def test_ivf_kmeans_recall_vs_brute_force(spark, emb):
    """Balanced (trained) cells cover exactly n_probe/n_cells of the
    corpus, so recall tracks the probed fraction: measured 0.52 @ 4/16,
    0.76 @ 6/16, 0.90 @ 8/16. Pin the recall/probe curve's mid points
    with margin — recall MUST rise with probes."""
    q = emb.filter(F.col("vec_id") < 5)
    bf = {(r.query_id, r.neighbor_id) for r in sim.cosine_topk(emb, q, k=10).collect()}
    r4 = {(r.query_id, r.neighbor_id) for r in sim.ivf_topk_kmeans(emb, q, k=10, n_probe=4).collect()}
    r8 = {(r.query_id, r.neighbor_id) for r in sim.ivf_topk_kmeans(emb, q, k=10, n_probe=8).collect()}
    assert len(r4) == len(r8) == 50
    assert len(bf & r4) / len(bf) >= 0.4
    assert len(bf & r8) / len(bf) >= 0.8
    assert len(bf & r8) >= len(bf & r4)


def test_cosine_pairs_kernels_agree(spark, emb):
    """The BLAS (cogrouped-Arrow matmul) and pure-SQL kernels of exact
    all-pairs cosine must return the identical pair set with identical
    rounded sims — the kernel changes the per-cell engine, never the
    semantics. (The BLAS pre-filter keeps a half-quantum + 1e-9 margin
    and the authoritative round/threshold decision is JVM-side.)"""
    blas = {
        (r.id_a, r.id_b): r.cos_sim
        for r in sim.cosine_pairs(emb, threshold=0.3, kernel="blas").collect()
    }
    sql = {
        (r.id_a, r.id_b): r.cos_sim
        for r in sim.cosine_pairs(emb, threshold=0.3, kernel="sql").collect()
    }
    assert blas == sql
    assert blas  # non-vacuous


def test_lsh_ann_kernels_agree(spark, emb):
    """The grid-cogrouped BLAS verify (Arrow signatures + per-cell
    gathered einsum, in-kernel pair dedup) and the pure-SQL path
    (interpreted zip_with signatures/dots, distinct-shuffle dedup) must
    return the identical pair set with identical rounded sims — the
    packed-int band keys group exactly like the JVM form, and the
    authoritative round/threshold decision is JVM-side in both."""
    blas = {
        (r.id_a, r.id_b): r.cos_sim
        for r in sim.lsh_ann(emb, threshold=0.3, verify_kernel="blas").collect()
    }
    sql = {
        (r.id_a, r.id_b): r.cos_sim
        for r in sim.lsh_ann(emb, threshold=0.3, verify_kernel="sql").collect()
    }
    assert blas == sql
    assert blas  # non-vacuous


def test_lsh_ann_recall_regimes(spark, emb):
    """Sign-LSH recall grows with true similarity: the round-6 derived
    default banding (lsh_tuning(0.3, 0.9) → r=5, b=30) must hold the
    0.9 theoretical recall target at the threshold angle (theory
    1-(1-s^5)^30 = 0.906 at s = 0.597; the old fixed r=5/b=16 measured
    0.76), and strong pairs are found (near-)completely."""
    lsh = {(r.id_a, r.id_b) for r in sim.lsh_ann(emb, threshold=0.3).collect()}
    weak = {(r.id_a, r.id_b) for r in sim.cosine_pairs(emb, threshold=0.3).collect()}
    strong = {(r.id_a, r.id_b) for r in sim.cosine_pairs(emb, threshold=0.5).collect()}
    assert weak
    assert len(weak & lsh) / len(weak) >= 0.8
    # per-pair miss at cos>=0.5 is (1-s^5)^30 < 1e-4; allow at most one
    # unlucky strong pair on the fixture rather than pinning perfection
    assert len(strong - lsh) <= max(1, len(strong) // 100)


def test_minhash_signature_narrow_equals_explode(spark, docs):
    """The narrow (array_min ∘ transform) signature must equal the
    explode+groupBy reference form hash-for-hash. Guards the
    transform-arity trap: a 2-arg lambda receives the ARRAY INDEX as
    its second argument, silently shadowing a captured salt."""
    from time_series_data_pipeline_spark.operators.text import shingle_hashes, tokens

    narrow = dd.minhash_signatures(docs, n_hashes=8)
    post = docs.select("doc_id", F.explode(shingle_hashes(tokens("text"))).alias("s"))
    ref = (
        post.groupBy("doc_id")
        .agg(*[F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"h{i}") for i in range(8)])
        .select("doc_id", F.array(*[F.col(f"h{i}") for i in range(8)]).alias("mh"))
    )
    joined = narrow.alias("n").join(ref.alias("r"), "doc_id")
    assert joined.filter(F.col("n.mh") != F.col("r.mh")).count() == 0
    assert joined.count() == docs.count()


def test_heavy_hitter_invariants(spark, docs):
    """Misra-Gries guarantees, asserted against the exact counts the
    sketch exists to avoid computing (the exact-count shuffle lives
    HERE, not in the benched query): (1) every token with true count
    > n/k appears among the tracked items; (2) every merged estimate is
    a lower bound of its true count."""
    from time_series_data_pipeline_spark.operators import text as tx
    from time_series_data_pipeline_spark.operators.sketch import heavy_hitters

    k = 64
    toks = docs.select(F.explode(tx.tokens("text")).alias("item")).persist()
    try:
        sketch = heavy_hitters(toks, "item", k=k, top=None)
        exact = toks.groupBy("item").agg(F.count(F.lit(1)).alias("true_n"))
        total = toks.count()
        heavy = exact.filter(F.col("true_n") * k > F.lit(total))
        missed = heavy.join(sketch, "item", "left_anti").count()
        assert missed == 0, f"{missed} heavy hitters missed by the sketch"
        over = (
            sketch.join(exact, "item")
            .filter(F.col("est_count") > F.col("true_n"))
            .count()
        )
        assert over == 0, f"{over} estimates exceed their true count"
        # and the sketch actually tracked something
        assert sketch.count() > 0
    finally:
        toks.unpersist()


def test_approx_count_distinct_error(spark):
    ev = table(spark, SF_CORRECT, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact <= 0.05


def test_approx_percentile_accuracy(spark):
    """percentile_approx (the constant-memory sketch path for 100 TB
    quantiles) must land within 2% relative error of the exact
    interpolated percentile at default accuracy."""
    ev = table(spark, SF_CORRECT, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("exact_p50"),
            F.percentile_approx("value", F.lit(0.5)).alias("approx_p50"),
            F.percentile("value", F.lit(0.9)).alias("exact_p90"),
            F.percentile_approx("value", F.lit(0.9)).alias("approx_p90"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx_p50 - r.exact_p50) / abs(r.exact_p50) <= 0.02
        assert abs(r.approx_p90 - r.exact_p90) / abs(r.exact_p90) <= 0.02


def test_semantic_dedup_lsh_keeps_superset_of_exact(spark):
    """The LSH pair source can only MISS pairs, so its kept set is a
    superset of the exact kept set — dedup's safe direction (a miss
    keeps an extra near-duplicate; it never drops a unique doc). Both
    variants are hash-attested; this pins their relationship."""
    from time_series_data_pipeline_spark.catalog import table
    from time_series_data_pipeline_spark.operators import similarity as sim

    from .conftest import SF_SMOKE

    emb = table(spark, SF_SMOKE, "embeddings")
    exact = {
        r["vec_id"]
        for r in sim.semantic_dedup(emb, threshold=0.35).select("vec_id").collect()
    }
    lsh = {
        r["vec_id"]
        for r in sim.semantic_dedup(
            emb, threshold=0.35, method="lsh", kernel="sql"
        ).select("vec_id").collect()
    }
    assert exact <= lsh
    assert len(exact) > 0
    # and the unknown method raises
    import pytest

    with pytest.raises(ValueError, match="exact|lsh"):
        sim.semantic_dedup(emb, threshold=0.35, method="kmeans")
