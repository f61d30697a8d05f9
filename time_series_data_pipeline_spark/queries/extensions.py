"""Extension-operator query surface (SURVEY.md §2.9, M3): the
training-data-pipeline operators — dedup (exact / hash / n-gram Jaccard
/ MinHash LSH / SimHash), embedding similarity search, text analysis,
multimodal columns.

Oracle policy: everything with deterministic SQL-expressible semantics
gets an exact DuckDB oracle (token pipeline mirrored with list
functions). LSH-family candidate generation depends on xxhash64 — not
reproducible in DuckDB — so those queries take the rows-only check; the
exact-Jaccard / brute-force-cosine queries are their verified ground
truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import dedup as dd
from ..operators import multimodal as mm
from ..operators import similarity as sim
from ..operators import text as tx
from .registry import query

#: Bump when the shingle pipeline changes (tokenization, n, hash fn):
#: part of the cache key, so a stale store can never be silently reused.
_SHINGLE_STORE_VERSION = "n3-xxhash64-v1"


def _shingle_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized shingle table shared by the dedup family (jaccard +
    minhash here; repeated runs too): the shingle pipeline is the
    dominant COLD cost of every near-dup query, and it is identical
    across them — so it is built ONCE per corpus version (keyed by
    source path + mtime + pipeline version) and every query equi-joins/
    minhashes off the 8-byte hash arrays. This is the inverted-index-
    build amortization a 100 TB dedup pipeline does as a matter of
    course. Publish is atomic-rename (operators/_util.cached_store), so
    concurrent sessions never clobber each other mid-write."""
    import os

    from ..operators._util import cached_store

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        mtime = int(os.path.getmtime(src))
    except OSError:
        mtime = 0
    path = cached_store(
        lambda scratch: dd.build_shingle_store(
            table(spark, sf_dir, "documents"), scratch
        ),
        "tsdp_shingle_store",
        f"{os.path.abspath(sf_dir)}:{mtime}:{_SHINGLE_STORE_VERSION}",
    )
    return dd.load_shingle_store(spark, path)


# Canonical DuckDB token/shingle pipeline — must mirror operators/text.py
_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"
_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, len(__t)-2),"
    " i -> __t[i] || ' ' || __t[i+1] || ' ' || __t[i+2]))"
)


@query(
    "dedup_exact",
    # suite: grouping form (one row per distinct content: keeper, copy
    # count) UNION the keep-first form (the surviving deduplicated rows)
    # — both X1 shapes hash-verified in one registry slot.
    oracle="""
    SELECT 'groups' AS sub, md5(text) AS k1,
           CAST(MIN(doc_id) AS VARCHAR) AS k2, COUNT(*) AS n
    FROM documents GROUP BY md5(text)
    UNION ALL
    SELECT 'keep_first', CAST(doc_id AS VARCHAR),
           sha256(text) || '|' || lang || '|' || source, NULL
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup, both forms: content-hash groups (32-byte shuffle
    keys — the raw text never moves; keeper = min doc_id) and the
    deterministic keep-first deduplicated corpus."""
    docs = table(spark, sf_dir, "documents")
    groups = dd.exact_dedup_groups(docs).select(
        F.lit("groups").alias("sub"),
        F.col("text_md5").alias("k1"),
        F.col("keeper_id").cast("string").alias("k2"),
        F.col("n_copies").alias("n"),
    )
    kept = dd.dedup_keep_first(docs).select(
        F.lit("keep_first").alias("sub"),
        F.col("doc_id").cast("string").alias("k1"),
        F.concat_ws("|", "content_sha256", "lang", "source").alias("k2"),
        F.lit(None).cast("long").alias("n"),
    )
    return groups.unionByName(kept)


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS __t FROM documents
    ),
    sh AS (
      SELECT doc_id, {_SHINGLES} AS s FROM toks
    ),
    post AS (
      SELECT doc_id, len(s) AS ls, unnest(s) AS g FROM sh
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS inter, ANY_VALUE(a.ls) AS la, ANY_VALUE(b.ls) AS lb
      FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, inter::DOUBLE / (la + lb - inter) AS jaccard
    FROM cand
    WHERE inter::DOUBLE / (la + lb - inter) >= 0.5
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 near-dup (exact form): 3-shingle Jaccard ≥ 0.5 via inverted
    index — work is Σ df(shingle)², never O(n²) (operators/dedup.py).
    Shingles come from the shared materialized store."""
    return dd.jaccard_pairs(
        table(spark, sf_dir, "documents"),
        threshold=0.5,
        shingle_sets=_shingle_store(spark, sf_dir),
    )


@query("minhash_lsh_pairs")  # rows-only: probabilistic recall — see minhash_lsh_verify
def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 near-dup (scale form): MinHash(64) + LSH banding (r=2, b=32;
    candidate recall ≈ 0.9999 at j=0.5) + exact jaccard verification of
    the candidates ONLY — the standard production shape, and the cost a
    real pipeline pays. The benched query is the pure sketch path
    (heavy_hitter_tokens precedent: never bundle the exact brute-force
    audit the sketch exists to avoid into the benched plan); the exact
    AllPairs cross-check lives in the non-benched, driver-hash-verified
    minhash_lsh_verify. Precision is exact by construction (candidates
    filtered by TRUE jaccard); per-pair LSH equality at pinned sfs stays
    in tests/test_extensions_selfcheck.py.
    """
    docs = table(spark, sf_dir, "documents")
    store = _shingle_store(spark, sf_dir)
    return dd.minhash_lsh_pairs(
        docs, threshold=0.5, shingle_sets=store, exact_verify=True
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@query(
    "minhash_lsh_verify",
    # RECALL-BOUND ATTESTATION (the value_percentiles_approx /
    # heavy_hitter_verify pattern): the pipeline is probabilistic — LSH
    # banding (r=2, b=32) has a ~1e-4 per-pair miss probability at
    # j=0.5 — so registering the brute-force pair list as an exact
    # oracle was one missed pair away from a red gate on any unpinned
    # corpus. This query verifies the LSH output against the exact
    # AllPairs join (shared shingle store, so the exact side is the same
    # prefix-filtered jaccard_pairs the driver already hash-verifies
    # pair-by-pair) and returns (n_exact_pairs, recall_ok):
    # n_exact_pairs is deterministic and cross-checked against DuckDB's
    # brute force; recall_ok attests misses <= max(1, 1% of true pairs)
    # — ~100x looser than the theoretical miss rate, so it holds on ANY
    # corpus/sf, while a genuinely broken banding (systematic misses)
    # still flips it and breaks the hash. The exact-join shuffle belongs
    # HERE — the benched minhash_lsh_pairs stays the pure LSH cost.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS __t FROM documents
    ),
    sh AS (
      SELECT doc_id, {_SHINGLES} AS s FROM toks
    ),
    post AS (
      SELECT doc_id, len(s) AS ls, unnest(s) AS g FROM sh
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS inter, ANY_VALUE(a.ls) AS la, ANY_VALUE(b.ls) AS lb
      FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    p AS (
      SELECT id_a, id_b FROM cand
      WHERE inter::DOUBLE / (la + lb - inter) >= 0.5
    )
    SELECT COUNT(*) AS n_exact_pairs, TRUE AS recall_ok FROM p
    """,
)
def minhash_lsh_verify_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall attestation for minhash_lsh_pairs (see oracle comment):
    joins the LSH pair list against the exact AllPairs join and attests
    misses <= max(1, 1% of true pairs)."""
    docs = table(spark, sf_dir, "documents")
    store = _shingle_store(spark, sf_dir)
    exact = dd.jaccard_pairs(docs, threshold=0.5, shingle_sets=store).select(
        "id_a", "id_b"
    )
    lsh = dd.minhash_lsh_pairs(
        docs, threshold=0.5, shingle_sets=store, exact_verify=True
    ).select("id_a", "id_b", F.lit(1).alias("__hit"))
    stats = exact.join(lsh, ["id_a", "id_b"], "left").agg(
        F.count(F.lit(1)).alias("n_exact_pairs"),
        F.sum(F.col("__hit").isNull().cast("long")).alias("__n_missed"),
    )
    allowed = F.greatest(F.lit(1), F.ceil(F.lit(0.01) * F.col("n_exact_pairs")))
    return stats.select(
        "n_exact_pairs",
        (F.coalesce("__n_missed", F.lit(0)) <= allowed).alias("recall_ok"),
    )


@query("simhash_pairs")  # rows-only: xxhash64-based
def simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 near-dup (SimHash form): 64-bit prints, 16-bit band candidates,
    hamming ≤ 8 verification."""
    return dd.simhash_pairs(table(spark, sf_dir, "documents"), max_hamming=8)


@query(
    "embedding_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
    ),
    s AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(qv, c.embedding::DOUBLE[]), 6) AS cos_sim
      FROM q CROSS JOIN embeddings c
      WHERE c.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM s
    ) WHERE rank <= 10
    """,
)
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 similarity search baseline: brute-force cosine top-10 for 5
    query vectors — broadcast queries, map-only scoring pass."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


@query(
    "embedding_neardup_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
             AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.3
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X1 embedding near-dup: all pairs with cosine ≥ 0.3 (exact)."""
    return sim.cosine_pairs(table(spark, sf_dir, "embeddings"), threshold=0.3)


# the oracle SQL lives in timeseries_q (suite_round11 embeds it
# verbatim at that module's import time); registered here with the
# X-tier it belongs to
from .timeseries_q import (  # noqa: E402  isort: skip
    SEMANTIC_DEDUP_LSH_SQL,
    SEMANTIC_DEDUP_SQL,
)


@query("semantic_dedup_apply", oracle=SEMANTIC_DEDUP_SQL)
def semantic_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X3 SemDeDup-style semantic dedup (Abbas et al., 2023),
    APPLY form: keep rows no LOWER-id row scores cosine ≥ 0.35
    against (the order-free any-lower-id pin documented in
    operators/similarity.py semantic_dedup); pair generation is the
    grid-decomposed exact kernel here, the LSH/IVF candidate path at
    100 TB (detect/act split)."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(emb, threshold=0.35).select("vec_id", "label")


@query("semantic_dedup_lsh", oracle=SEMANTIC_DEDUP_LSH_SQL)
def semantic_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB form of semantic dedup: the banded-LSH pair source
    (derived banding, plane-literal-replayable verify) feeding the
    same keep-no-lower-id-partner anti-join. Missed candidates keep
    extra rows, never drop extra — kept_lsh ⊇ kept_exact, the safe
    direction for dedup; both variants hash-attested side by side in
    suite_round11, so the approximation's effect is driver-visible."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(
        emb, threshold=0.35, method="lsh", kernel="sql"
    ).select("vec_id", "label")


@query(
    "label_centroids",
    oracle="""
    SELECT label,
           CAST(i AS BIGINT) AS pos,
           round(SUM(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE))
                 / COUNT(*), 9) AS centroid_val,
           COUNT(*) AS n
    FROM embeddings, range(1, 65) t(i)
    GROUP BY label, i
    """,
)
def label_centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 prototype computation: element-wise per-label mean vector in
    long form — posexplode + one map-side-combined hash-agg; 9-dp
    rounding absorbs summation-order float drift."""
    return sim.label_centroids(table(spark, sf_dir, "embeddings"))


@query("embedding_lsh_ann")  # rows-only: hyperplane LSH candidates
def embedding_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: sign-random-projection LSH buckets → equi-join
    candidates → exact cosine verify. Ground truth =
    embedding_neardup_pairs."""
    return sim.lsh_ann(table(spark, sf_dir, "embeddings"), threshold=0.3)


@query(
    "embedding_ivf_topk",
    # deterministic medoid centroids make even this APPROXIMATE path
    # exactly oracle-able: DuckDB replays assignment -> probe -> score
    oracle="""
    WITH cent AS (
      SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
                          c.cell) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, c.cell,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cell) AS rn
        FROM q CROSS JOIN cent c
      ) WHERE rn <= 4
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(p.qv, a.embedding::DOUBLE[]), 6) AS cos_sim
      FROM probes p JOIN assigned a USING (cell)
      WHERE a.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path #2: IVF — medoid cells, n_probe nearest cells per
    query, exact cosine inside probed cells. Recall vs the brute-force
    baseline is pinned in tests/test_extensions_selfcheck.py."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


@query(
    "distinct_users_two_phase",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_user_id
    FROM events GROUP BY event_type
    """,
)
def distinct_users_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof exact distinct count (operators/skew.py): dedup on
    (key, value) spreads hot keys across the cluster, then a cheap
    count — parity with the single-pass oracle proves equivalence."""
    from ..operators.skew import two_phase_count_distinct

    return two_phase_count_distinct(
        table(spark, sf_dir, "events"), ["event_type"], "user_id"
    )


@query(
    "salted_join_segment_counts",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def salted_join_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-join pattern (operators/skew.py): events salted 16 ways,
    customer replicated per salt — a hot user lands on 16 tasks, not 1.
    Oracle is the plain join: parity proves salt-invariance."""
    from ..operators.skew import salted_join

    ev = table(spark, sf_dir, "events").select("user_id", "value")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        salted_join(ev, cust, ["user_id"], n_salts=16)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


def embedding_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path #3: IVF with pyspark.ml KMeans-trained coarse
    centroids (fixed seed) — recall pinned vs brute force in
    tests/test_extensions_selfcheck.py. Unregistered (the medoid IVF
    carries the driver row for the IVF search path; MLlib centroids are
    not cross-engine-replayable)."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.ivf_topk_kmeans(emb, emb.filter(F.col("vec_id") < 5), k=10)


@query(
    "approx_distinct_users",
    # driver-verified: the exact per-series distinct count PLUS an
    # attestation that the HLL estimate is within 5% of it (default
    # HLL++ rsd is 2%; a sketch regression breaks the value-hash).
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count (SURVEY.md §2.5): the constant-memory
    path for 100 TB cardinality questions, verified against exact
    countDistinct in the same aggregation pass."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_5pct"),
        )
    )


@query(
    "doc_profile",
    # suite: token stats + quality score + language-ID + min-hash
    # fingerprint in ONE per-document projection (one scan, zero
    # shuffle) — each X4 component hash-verified through its columns.
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, n_chars, {_TOKS} AS __t FROM documents),
    s AS (
      SELECT doc_id, lang, n_chars,
             len(__t)::BIGINT AS n_tokens,
             len(list_distinct(__t))::BIGINT AS n_unique_tokens,
             CAST(list_sum(list_transform(__t, x -> length(x))) AS BIGINT)
               AS total_token_chars,
             len(list_filter(__t, x -> list_contains(['the','a','of','and','is'], x)))::BIGINT
               AS n_stopwords,
             len(list_filter(__t, x -> list_contains(['el','la','de','y','es'], x)))::BIGINT
               AS es_score,
             {_SHINGLES} AS sh
      FROM t
    )
    SELECT doc_id, lang, n_chars, n_tokens, n_unique_tokens, total_token_chars,
           CAST(total_token_chars AS DOUBLE) / n_tokens AS avg_token_len,
           n_stopwords,
           CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
           0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
             + 0.4 * (1.0 - CAST(n_stopwords AS DOUBLE) / n_tokens)
             + 0.2 * least((CAST(total_token_chars AS DOUBLE) / n_tokens) / 10.0, 1.0)
             AS quality,
           n_stopwords AS en_score,
           es_score,
           CASE WHEN n_stopwords >= es_score AND n_stopwords > 0 THEN 'en'
                WHEN es_score > 0 THEN 'es'
                ELSE 'und' END AS predicted_lang,
           len(sh)::BIGINT AS n_shingles,
           list_aggregate(list_transform(sh, x -> md5(x)), 'min') AS fingerprint
    FROM s
    """,
)
def doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 text analysis, full per-document profile: token counting
    (whitespace tokens, uniques, char totals), quality scoring
    (length/stopword/word-length components), marker-word language ID,
    and the 1-perm MinHash fingerprint — all higher-order array
    expressions fused into a single scan projection. (en_score equals
    n_stopwords by construction: the English marker set IS the stopword
    set.)"""
    # One materialized token array feeds all four passes (the split is an
    # interpreted higher-order expression — re-deriving it per pass cost
    # 13 split() evaluations per row in the r14 plan), and the one-split
    # scan is spread to the cluster first (a small corpus plans as one
    # 128 MB split = one task; at scale the repartition is a no-op).
    docs = tx.spread_small_scan(table(spark, sf_dir, "documents")).withColumn(
        "__toks", tx.tokens("text")
    )
    out = tx.with_token_stats(docs, tokens_col="__toks")
    out = tx.quality_score(out, tokens_col="__toks")
    out = tx.lang_id(out, tokens_col="__toks")
    out = tx.fingerprint(out, tokens_col="__toks")
    return out.select(
        "doc_id", "lang", "n_chars", "n_tokens", "n_unique_tokens",
        "total_token_chars", "avg_token_len", "n_stopwords", "stopword_ratio",
        "quality", "en_score", "es_score", "predicted_lang", "n_shingles",
        "fingerprint",
    )


@query(
    "bpe_token_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS bpe,
             {_TOKS} AS words
      FROM documents
    )
    SELECT doc_id,
           len(bpe)::BIGINT AS n_bpe_tokens,
           len(words)::BIGINT AS n_word_tokens,
           CAST(len(bpe) AS DOUBLE) / len(words) AS bpe_per_word
    FROM t
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 token counting, BPE-ish variant: GPT-2-family pre-split
    (letter runs / digit runs / single punctuation) next to whitespace
    words — the tokens-per-word ratio is the standard cost estimator
    for LLM training data."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tx.bpe_tokens("text")).cast("long").alias("n_bpe_tokens"),
        F.size(tx.tokens("text")).cast("long").alias("n_word_tokens"),
        F.try_divide(
            F.size(tx.bpe_tokens("text")).cast("double"),
            F.size(tx.tokens("text")),
        ).alias("bpe_per_word"),
    )


@query(
    "heavy_hitter_tokens",
    # rows-only BY DESIGN: the sketch's merged counters are
    # partition-dependent (a Misra-Gries summary is a function of the
    # partition split, not just the multiset), so the output is not
    # cross-engine-hashable. Its two exact guarantees — (1) no token
    # with true count > n/k is missed, (2) every estimate lower-bounds
    # the true count — are asserted against exact counts in
    # tests/test_extensions_selfcheck.py::test_heavy_hitter_invariants,
    # where the exact-count shuffle belongs. The benched query costs
    # what a user pays for the sketch: one narrow map pass + a
    # (#partitions x k)-row shuffle, never a per-distinct-token shuffle.
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy-hitter sketch (operators/sketch.py): the
    approximate counterpart of top_ngrams whose shuffle is
    #partitions x k rows instead of one per distinct token. Returns the
    sketch's top-20 tokens by estimated (lower-bound) count."""
    from ..operators.sketch import heavy_hitters

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tx.tokens("text")).alias("item"))
    return heavy_hitters(toks, "item", k=64, top=20)


def _bpe_fold_sql(inner: str, merges) -> str:
    """Generate the DuckDB replay of merge-table BPE encoding: one
    ``list_reduce`` left-to-right pass per merge rule, nested in rank
    order, over a list<string> token expression — exactly
    operators/text.bpe_encode_word restated as SQL folds. Generated
    programmatically so the oracle string always carries the same merge
    table as the Spark encoder."""
    cur = inner
    for i, (a, b) in enumerate(merges):
        aq = a.replace("'", "''")
        bq = b.replace("'", "''")
        abq = (a + b).replace("'", "''")
        cur = (
            f"list_reduce(list_transform({cur}, t{i} -> [t{i}]), "
            f"(a{i}, x{i}) -> CASE WHEN len(a{i}) > 0 AND a{i}[-1] = '{aq}' "
            f"AND x{i}[1] = '{bq}' "
            f"THEN list_append(a{i}[1:len(a{i})-1], '{abq}') "
            f"ELSE list_append(a{i}, x{i}[1]) END)"
        )
    return cur


_BPE_ENC = _bpe_fold_sql("regexp_extract_all(w, '.')", tx.BPE_MERGES)


@query(
    "bpe_encode_stats",
    # True BPE is replayable in SQL because rank-order application (one
    # left-to-right fold per rule) equals the iterative lowest-rank-pair
    # loop for a well-formed merge table (see operators/text.BPE_MERGES)
    # — so the driver hash-verifies real token counts, not a pre-split
    # proxy.
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(text, '{tx.BPE_SPLIT_RE}') AS words,
             {_TOKS} AS wtoks
      FROM documents
    )
    SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(words, w -> len({_BPE_ENC}))), 0)
                AS BIGINT) AS n_bpe_tokens,
           len(wtoks)::BIGINT AS n_word_tokens,
           CASE WHEN len(wtoks) > 0
                THEN CAST(coalesce(list_sum(list_transform(words, w -> len({_BPE_ENC}))), 0)
                          AS DOUBLE) / len(wtoks)
           END AS bpe_per_word
    FROM t
    """,
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 token counting, TRUE BPE: merge-table encoding (operators/
    text.bpe_encode — Arrow-batched, word-memoized) over the demo
    vocabulary, giving real tokens-per-word cost estimates; upgrade of
    the regex pre-split proxy in bpe_token_stats."""
    # word counts come off one materialized token array instead of two
    # inline splits (no spread: the memoized Arrow kernel is cheap
    # enough that the exchange costs more than it saves — A/B'd)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    enc = tx.bpe_encode(docs).withColumn("__nw", F.size(tx.tokens("text")))
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.col("__nw").cast("long").alias("n_word_tokens"),
        F.try_divide(
            F.size("bpe_tokens").cast("double"), F.col("__nw")
        ).alias("bpe_per_word"),
    )


@query(
    "heavy_hitter_verify",
    # Driver-verified attestation of the Misra-Gries guarantees at the
    # driver's own scale factor (the pytest self-check pins them at
    # SF_CORRECT; this row pins them wherever the driver runs): (1) no
    # token with true count > n/k is missing from the sketch, (2) every
    # estimate lower-bounds its true count. The exact-count shuffle
    # belongs HERE — the benched heavy_hitter_tokens stays the pure
    # sketch cost. A sketch regression flips a zero and breaks the hash.
    oracle="""
    SELECT CAST(0 AS BIGINT) AS n_missed_hitters,
           CAST(0 AS BIGINT) AS n_overestimates
    """,
)
def heavy_hitter_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries invariant attestation (see oracle comment): joins the
    merged sketch against exact token counts and counts violations of
    the two guarantees — both provably zero for any input."""
    from ..operators.sketch import heavy_hitters

    k = 64
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tx.tokens("text")).alias("item"))
    sketch = heavy_hitters(toks, "item", k=k, top=None)
    exact = toks.groupBy("item").agg(F.count(F.lit(1)).alias("true_n"))
    total = exact.agg(F.sum("true_n").alias("n_total"))
    return (
        exact.join(sketch, "item", "left")
        .crossJoin(F.broadcast(total))
        .agg(
            F.sum(
                (
                    (F.col("true_n") * k > F.col("n_total"))
                    & F.col("est_count").isNull()
                ).cast("long")
            ).alias("n_missed_hitters"),
            F.sum(
                (F.coalesce("est_count", F.lit(0)) > F.col("true_n")).cast("long")
            ).alias("n_overestimates"),
        )
    )


@query(
    "similar_part_names",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM part a JOIN part b
      ON substring(a.p_name, 1, 3) = substring(b.p_name, 1, 3)
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
      AND abs(length(a.p_name) - length(b.p_name)) <= 2
    """,
)
def similar_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup with prefix blocking: candidate pairs
    share their first 3 chars (an equi-join, never a cross product) and
    pass the |len diff| <= k length filter before the exact levenshtein
    verify. The blocking is part of the declared semantics (prefix
    typos are out of contract) — both engines apply it identically."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    a = p.select(
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"),
        F.substring("p_name", 1, 3).alias("__blk"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"),
        F.substring("p_name", 1, 3).alias("__blk"),
    )
    return (
        a.join(b, "__blk")
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= 2)
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_dist") <= 2)
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )


@query(
    "top_ngrams",
    # suite: unigram vocabulary head (with document frequency) UNION
    # bigram LM-counts head — the vocab-building / stopword-discovery /
    # n-gram-counts passes in one slot.
    oracle=f"""
    SELECT * FROM (
      WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
      SELECT 'token' AS sub, tok AS gram, COUNT(*) AS n,
             COUNT(DISTINCT doc_id) AS df
      FROM t GROUP BY tok
      ORDER BY n DESC, tok
      LIMIT 50
    )
    UNION ALL
    SELECT * FROM (
      WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
      b AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                      i -> toks[CAST(i AS INTEGER)] || ' '
                           || toks[CAST(i AS INTEGER) + 1])) AS bigram
        FROM t WHERE len(toks) >= 2
      )
      SELECT 'bigram' AS sub, bigram AS gram, COUNT(*) AS n,
             CAST(NULL AS BIGINT) AS df
      FROM b GROUP BY bigram
      ORDER BY n DESC, bigram
      LIMIT 50
    )
    """,
)
def top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head (term + document frequency for the 50 most
    frequent tokens) and bigram frequency head (the n-gram LM-counts
    step; bigrams via the zip-with-shifted-slice construction — O(n) per
    doc, NOT element_at over an index array). One explode + one agg
    each; deterministic (n DESC, gram) top-k cut."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tx.tokens("text")).alias("gram"))
    top_tok = (
        toks.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("n").desc(), "gram")
        .limit(50)
        .select(F.lit("token").alias("sub"), "gram", "n", "df")
    )
    tok = tx.tokens("text")
    ln = F.greatest(F.size(tok) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(tok, 1, ln),
        F.slice(tok, 2, ln),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    top_bi = (
        docs.select(F.explode(bigrams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "gram")
        .limit(50)
        .select(
            F.lit("bigram").alias("sub"),
            "gram",
            "n",
            F.lit(None).cast("long").alias("df"),
        )
    )
    return top_tok.unionByName(top_bi)


@query(
    "scrub_pii",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^ \t\n]+', '<URL>', 'g'),
             '[ \t\n\r]+', ' ', 'g')) AS scrubbed,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, 'https?://[^ \t\n]+')) AS BIGINT)
             AS n_urls
    FROM documents
    """,
)
def scrub_pii_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 cleaning: email/URL redaction with counts + whitespace
    normalization — regexes are RE2-and-Java compatible so the oracle
    applies the identical patterns."""
    # spread: three regex passes per row otherwise run on the single
    # scan task of a one-split corpus
    out = tx.scrub_pii(tx.spread_small_scan(table(spark, sf_dir, "documents")))
    return out.select(
        "doc_id", tx.clean_text(F.col("scrubbed")).alias("scrubbed"), "n_emails", "n_urls"
    )


_BUCKET_SQL = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 15)) "
    "AS BIGINT) % 1000000"
)


@query(
    "sampling_splits",
    # suite: deterministic 10% sample + per-stratum sampling +
    # train/val/test split — exact membership replayed by the oracle
    # (all md5-hash-bucket based, engine-independent).
    oracle=f"""
    SELECT 'sample10' AS sub, doc_id, lang || '|' || source AS tag
    FROM documents
    WHERE {_BUCKET_SQL.format(salt="")} < 100000
    UNION ALL
    SELECT 'stratified', doc_id, lang
    FROM documents
    WHERE CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 1.0 ELSE NULL END
            IS NOT NULL
      AND {_BUCKET_SQL.format(salt="strat")}
          < CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 1.0 END
                 * 1000000 AS BIGINT)
    UNION ALL
    SELECT 'split', doc_id,
           CASE WHEN {_BUCKET_SQL.format(salt="split")} < 50000 THEN 'val'
                WHEN {_BUCKET_SQL.format(salt="split")} < 100000 THEN 'test'
                ELSE 'train' END
    FROM documents
    """,
)
def sampling_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling family (operators/sampling.py), one
    hash-verified union: 10% sample by doc_id hash (reproducible across
    runs/engines/partitionings, unlike seeded PRNG sampling),
    per-stratum sampling (downsample the dominant language, keep all of
    a rare one), and the stable 90/5/5 train/val/test split (a
    document's split never changes as the corpus grows — no leakage
    across retrains)."""
    from ..operators.sampling import (
        deterministic_sample,
        stratified_sample,
        train_val_test_split,
    )

    docs = table(spark, sf_dir, "documents")
    s10 = deterministic_sample(
        docs.select("doc_id", "lang", "source"), "doc_id", 0.10
    ).select(
        F.lit("sample10").alias("sub"),
        "doc_id",
        F.concat_ws("|", "lang", "source").alias("tag"),
    )
    strat = stratified_sample(
        docs.select("doc_id", "lang"), "doc_id", "lang", {"en": 0.5, "es": 1.0},
        salt="strat",
    ).select(F.lit("stratified").alias("sub"), "doc_id", F.col("lang").alias("tag"))
    spl = train_val_test_split(docs.select("doc_id"), "doc_id", 0.05, 0.05).select(
        F.lit("split").alias("sub"), "doc_id", F.col("split").alias("tag")
    )
    return s10.unionByName(strat).unionByName(spl)


@query(
    "winnow_fingerprints",
    oracle="""
    WITH d AS (
      SELECT doc_id, lower(text) AS lc,
             greatest(length(text) - 4, 0) AS ng
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(1, ng + 1),
                            i -> md5(substring(lc, CAST(i AS INTEGER), 5))) AS grams
      FROM d
    )
    SELECT doc_id, unnest(list_distinct(
             list_transform(range(1, len(grams) - 3 + 1),
                            i -> list_aggregate(grams[i:i+3], 'min'))
           )) AS fingerprint
    FROM g
    WHERE len(grams) - 3 >= 1
    """,
)
def winnow_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 rolling-hash fingerprinting (MOSS winnowing): 5-char gram
    hashes, window-of-4 local minima — any shared substring of length
    >= 8 chars yields a shared fingerprint. Exploded to (doc,
    fingerprint) rows so the oracle compares the exact selection."""
    docs = table(spark, sf_dir, "documents")
    return tx.winnow_fingerprints(docs, "text", "doc_id", k=5, w=4)


@query(
    "multimodal_features",
    # suite: pack (typed metadata struct), decode (feature extraction),
    # and resize — all per-document mapInPandas/expression passes joined
    # on doc_id, each column family hash-verified. Deterministic stub
    # codecs (the container has none); the Arrow plumbing is real.
    oracle="""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    )
    SELECT doc_id,
           'image/fake' AS kind,
           CAST(n AS BIGINT) AS n_bytes,
           sha256(text) AS sha256,
           CAST(n % 640 + 1 AS INTEGER) AS width,
           CAST(n % 480 + 1 AS INTEGER) AS height,
           CAST(n % 256 AS DOUBLE) / 255.0 AS mean_luma,
           224 AS rs_width, 224 AS rs_height,
           CAST(trunc(n * ((224.0 * 224.0) / ((n % 640 + 1) * (n % 480 + 1))))
                AS BIGINT) AS resized_bytes,
           'text/plain' AS meta_kind,
           CAST(n AS BIGINT) AS meta_bytes,
           sha256(text) AS meta_sha256
    FROM d
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 multimodal pipeline: opaque binary payload with typed metadata
    (pack_media), Arrow-batched decode/feature-extraction, and resize —
    joined per doc_id into one verified profile."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    meta = mm.pack_media(docs, "payload", "text/plain").select(
        "doc_id",
        F.col("media_meta.kind").alias("meta_kind"),
        F.col("media_meta.n_bytes").alias("meta_bytes"),
        F.col("media_meta.sha256").alias("meta_sha256"),
    )
    dec = mm.decode_image(
        docs.withColumn("kind", F.lit("image/fake")).withColumn(
            "sha256", F.sha2(F.col("payload"), 256)
        )
    )
    rs = mm.resize_image(docs, 224, 224).select(
        "doc_id",
        F.col("width").alias("rs_width"),
        F.col("height").alias("rs_height"),
        "resized_bytes",
    )
    return dec.join(rs, "doc_id").join(meta, "doc_id")


@query(
    "multimodal_frame_sample",
    # the stub decoder is deterministic byte-slicing, so the oracle can
    # reproduce it exactly (docs are ASCII: char ops == byte ops)
    oracle="""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             greatest(octet_length(encode(text)) // 4, 1) AS step
      FROM documents
    )
    SELECT doc_id,
           i AS frame_idx,
           CAST(length(substring(text, i * step + 1, step)) AS BIGINT) AS frame_bytes,
           sha256(substring(text, i * step + 1, step)) AS frame_sha256
    FROM d, (SELECT unnest([0, 1, 2, 3]) AS i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 row-expanding decode: 4 sampled frames per payload via
    mapInPandas (one Arrow batch in, longer batch out) — the video
    frame-sampling plumbing with a deterministic byte-slice stub."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    return mm.sample_frames(docs, n_frames=4)




@query(
    "doc_repetition",
    # Every fraction is an exact-int division (correctly rounded in
    # both engines), so the whole profile hash-verifies with no rounding
    # slack at all.
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS __t FROM documents),
    g AS (
      SELECT doc_id, __t,
             list_transform(range(1, len(__t)),
               i -> __t[CAST(i AS INTEGER)] || ' '
                    || __t[CAST(i AS INTEGER) + 1]) AS bg,
             list_transform(range(1, len(__t) - 1),
               i -> __t[CAST(i AS INTEGER)] || ' '
                    || __t[CAST(i AS INTEGER) + 1] || ' '
                    || __t[CAST(i AS INTEGER) + 2]) AS tg
      FROM t
    )
    SELECT doc_id,
           len(__t)::BIGINT AS n_tokens,
           CASE WHEN len(__t) > 0
                THEN CAST(len(__t) - len(list_distinct(__t)) AS DOUBLE) / len(__t)
           END AS dup_token_frac,
           CASE WHEN len(bg) > 0
                THEN CAST(list_max(list_transform(bg,
                       x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / len(bg)
           END AS top_bigram_frac,
           CASE WHEN len(tg) > 0
                THEN CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE) / len(tg)
           END AS dup_trigram_frac,
           coalesce(list_max(list_transform(bg,
                      x -> len(list_filter(bg, y -> y = x)))) >= 2
                    AND CASE WHEN len(bg) > 0
                THEN CAST(list_max(list_transform(bg,
                       x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / len(bg)
           END > 0.20, FALSE)
           OR coalesce(CASE WHEN len(tg) > 0
                THEN CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE) / len(tg)
           END > 0.30, FALSE) AS repetitive
    FROM g
    """,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 quality filtering, repetition signals (the Gopher filters —
    Rae et al. 2021 — over word n-grams): duplicate-token fraction,
    most-frequent-bigram dominance, duplicate-trigram fraction, and the
    composite `repetitive` flag. In-row array expressions, zero
    shuffle (operators/text.repetition_stats)."""
    return tx.repetition_stats(table(spark, sf_dir, "documents"))


@query(
    "contamination_overlap",
    # The oracle joins on the identical 16-hex-char md5 prefix the Spark
    # plan shuffles on, so even a (cosmically unlikely) prefix collision
    # would agree across engines.
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS __t FROM documents),
    g AS (
      SELECT doc_id,
             substring(md5(unnest(list_distinct(list_transform(
               range(1, len(__t) - 3),
               i -> __t[CAST(i AS INTEGER)] || ' '
                    || __t[CAST(i AS INTEGER) + 1] || ' '
                    || __t[CAST(i AS INTEGER) + 2] || ' '
                    || __t[CAST(i AS INTEGER) + 3] || ' '
                    || __t[CAST(i AS INTEGER) + 4])))), 1, 16) AS gh
      FROM t
    )
    SELECT p.doc_id AS probe_id, c.doc_id AS corpus_id,
           COUNT(*) AS n_shared_ngrams
    FROM g p JOIN g c ON p.gh = c.gh
    WHERE p.doc_id < 20 AND c.doc_id >= 20
    GROUP BY p.doc_id, c.doc_id
    """,
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X4 benchmark decontamination: every (probe, corpus) document
    pair sharing at least one 5-token n-gram, with the shared-distinct-
    gram count — the exact-overlap contamination check run before
    training (operators/dedup.ngram_overlap_pairs; inverted-index join
    on gram hashes, never a cross product). Probe set = doc_id < 20
    standing in for a held-out benchmark."""
    docs = table(spark, sf_dir, "documents")
    return dd.ngram_overlap_pairs(
        docs.filter(F.col("doc_id") < 20),
        docs.filter(F.col("doc_id") >= 20),
        n=5,
    )


#: Bump when the cluster pipeline changes (jaccard threshold, shingle
#: pipeline, CC algorithm/keeper rule).
_CLUSTER_STORE_VERSION = "jacc05-cc-v1"


def _cluster_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized dedup-cluster assignment shared by the acting
    queries (dedup_clusters, split_leakage_guard, curation_pipeline):
    the jaccard-pair + connected-components fixpoint is the dominant
    cost of every consumer and is identical across them, so the
    (doc_id, cluster_id, is_keeper) table is built ONCE per corpus
    version (path+mtime+pipeline-version key, atomic publish — the
    shingle/PQ store lifecycle) — exactly the cluster-assignment table
    a 100 TB dedup pipeline materializes between its detect and act
    phases."""
    import os

    from ..operators import graph as gr
    from ..operators._util import cached_store

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        mtime = int(os.path.getmtime(src))
    except OSError:
        mtime = 0

    def _build(scratch: str) -> None:
        docs = table(spark, sf_dir, "documents")
        pairs = dd.jaccard_pairs(
            docs, threshold=0.5, shingle_sets=_shingle_store(spark, sf_dir)
        ).select("id_a", "id_b")
        gr.dedup_clusters(pairs).write.mode("overwrite").parquet(scratch)

    path = cached_store(
        _build,
        "tsdp_cluster_store",
        f"{os.path.abspath(sf_dir)}:{mtime}:"
        f"{_SHINGLE_STORE_VERSION}:{_CLUSTER_STORE_VERSION}",
    )
    # published stores are immutable → relation reuse is sound
    from ..operators._util import load_store

    return load_store(spark, path)


@query(
    "dedup_clusters",
    # Recursive min-label propagation is exactly replayable in SQL: the
    # oracle computes the transitive closure of the (bidirectional)
    # near-dup pair graph with a recursive CTE and takes MIN over each
    # node's reachable set — the same fixpoint the distributed hash-min
    # loop converges to (operators/graph.py).
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_TOKS} AS __t FROM documents
    ),
    sh AS (
      SELECT doc_id, {_SHINGLES} AS s FROM toks
    ),
    post AS (
      SELECT doc_id, len(s) AS ls, unnest(s) AS g FROM sh
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS inter, ANY_VALUE(a.ls) AS la, ANY_VALUE(b.ls) AS lb
      FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    p AS (
      SELECT id_a, id_b FROM cand
      WHERE inter::DOUBLE / (la + lb - inter) >= 0.5
    ),
    e AS (
      SELECT id_a AS u, id_b AS v FROM p
      UNION
      SELECT id_b, id_a FROM p
    ),
    reach(node, r) AS (
      SELECT DISTINCT u, u FROM e
      UNION
      SELECT x.node, e.v FROM reach x JOIN e ON x.r = e.u
    )
    SELECT node AS doc_id, MIN(r) AS cluster_id,
           MIN(r) = node AS is_keeper
    FROM reach GROUP BY node
    """,
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 dedup, the acting step: near-dup pairs (exact 3-shingle
    jaccard >= 0.5 off the shared store) grouped into duplicate
    CLUSTERS via distributed connected components (hash-min label
    propagation, operators/graph.py), with the canonical keeper
    elected per cluster — pair lists become delete lists. Served from
    the materialized cluster store (_cluster_store): the CC fixpoint
    runs once per corpus version, not once per query."""
    return _cluster_store(spark, sf_dir)


_BM25_TERMS = ["spark", "window", "join", "hash"]


def _bm25_oracle() -> str:
    from ..operators import search as srch

    return srch.bm25_oracle_sql(_BM25_TERMS, _TOKS, k=50)


@query("bm25_search", oracle=None)  # oracle attached below (built from helper)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 lexical retrieval: BM25 top-50 for a bag-of-words query —
    in-row term frequencies (no token explosion), a 1-row broadcast
    stats join, and a TakeOrderedAndProject top-k. The lexical
    counterpart of embedding_topk for corpus curation / eval mining."""
    from ..operators import search as srch

    return srch.bm25_topk(table(spark, sf_dir, "documents"), _BM25_TERMS, k=50)


@query(
    "doc_chunks",
    oracle=f"""
    WITH t2 AS (
      SELECT doc_id, __t, len(__t) AS dl
      FROM (SELECT doc_id, {_TOKS} AS __t FROM documents)
    ),
    c AS (
      SELECT doc_id, i - 1 AS chunk_idx,
             list_slice(__t, (i-1)*48 + 1, (i-1)*48 + 64) AS ch
      FROM (
        SELECT doc_id, __t,
               unnest(generate_series(1,
                 CASE WHEN dl <= 64 THEN 1
                      ELSE (dl - 64 + 47) // 48 + 1 END)) AS i
        FROM t2
      )
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(ch) AS BIGINT) AS n_tokens,
           md5(CASE WHEN len(ch) = 0 THEN ''
                    ELSE array_to_string(ch, ' ') END) AS chunk_hash
    FROM c
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 corpus shaping: overlapping 64-token windows advancing by 48
    (the fixed-budget training/embedding input shape). Pure in-row
    sequence+slice+posexplode — no shuffle; chunks leave the scan as
    16-byte md5 digests, not text."""
    return tx.chunk_docs(table(spark, sf_dir, "documents"), size=64, stride=48)


@query(
    "profile_columns",
    oracle=None,  # attached below (built from helper)
)
def profile_columns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 data profiling: nulls / distincts / min / max for 7 lineitem
    columns in ONE scan (single aggregate row pivoted long via inline).
    The first query anyone runs against a new 100 TB drop — and the
    naive per-column loop scans the table 7x instead."""
    from ..operators import profile as prof

    return prof.profile_columns(
        table(spark, sf_dir, "lineitem"),
        numeric=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        string=["l_returnflag", "l_linestatus"],
        temporal=["l_shipdate"],
    )


@query(
    "embedding_quantized_topk",
    oracle="""
    WITH s AS (
      SELECT MAX(list_max(list_transform(embedding::DOUBLE[],
                                         x -> abs(x)))) AS scale
      FROM embeddings
    ),
    codes AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> LEAST(127, GREATEST(-127,
                      CAST(FLOOR(x / scale * 127) AS INTEGER)))) AS cc
      FROM embeddings, s
    ),
    q AS (SELECT vec_id AS query_id, cc AS qc FROM codes WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(q.qc[CAST(i AS INTEGER)] AS BIGINT)
                      * c.cc[CAST(i AS INTEGER)]) AS BIGINT) AS qscore
      FROM q CROSS JOIN codes c CROSS JOIN range(1, 65) t(i)
      WHERE c.vec_id != q.query_id
      GROUP BY q.query_id, c.vec_id
    )
    SELECT query_id, neighbor_id, qscore, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY qscore DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def embedding_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 compressed-corpus search: symmetric global-scale int8
    quantization (4x smaller in flight than float32 — at 100 TB the
    codes are what stays hot) + integer dot-product top-10. Integer
    scores are exact on any engine, so even this approximate path is
    hash-verified; recall vs exact cosine is pinned in tests."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.quantized_topk(emb, emb.filter(F.col("vec_id") < 5), dim=64, k=10)


@query(
    "vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT SUM(cnt) AS total FROM counts),
    ranked AS (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rank,
             SUM(cnt) OVER (ORDER BY cnt DESC, token
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM counts
    )
    SELECT token, cnt, CAST(rank AS BIGINT) AS rank,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_frac
    FROM ranked, tot WHERE rank <= 100
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 tokenizer planning: cumulative corpus coverage of the top-100
    vocabulary — explode+hash-agg token counts, a global top-100 (heap,
    not sort), then the running-coverage window over just those 100
    rows. Answers 'how big a vocab covers 95% of tokens'."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tx.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(100)
    w = Window.orderBy(F.col("cnt").desc(), "token")
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_frac",
            F.sum("cnt")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            / F.col("total").cast("double"),
        )
        .select("token", "cnt", "rank", "cum_frac")
    )


# Oracles whose SQL is generated by the operator module (kept beside the
# operator so query and oracle can never drift apart):
from .registry import ORACLE as _ORACLE  # noqa: E402
from ..operators import profile as _prof  # noqa: E402
from ..operators import search as _srch  # noqa: E402

_ORACLE["bm25_search"] = _srch.bm25_oracle_sql(_BM25_TERMS, _TOKS, k=50)
_ORACLE["profile_columns"] = _prof.profile_oracle_sql(
    "lineitem",
    numeric=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    string=["l_returnflag", "l_linestatus"],
    temporal=["l_shipdate"],
)


@query(
    "weighted_sample_docs",
    oracle=f"""
    SELECT doc_id, weight, priority,
           row_number() OVER (ORDER BY priority DESC, doc_id) AS rank
    FROM (
      SELECT doc_id, n_chars AS weight,
             round(ln((CAST({_BUCKET_SQL.format(salt="wsample")} AS DOUBLE)
                       + 0.5) / 1000000.0)
                   / CAST(n_chars AS DOUBLE), 9) AS priority
      FROM documents WHERE n_chars > 0
    ) ORDER BY priority DESC, doc_id LIMIT 200
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 mixture sampling: deterministic weighted sampling without
    replacement (Efraimidis-Spirakis priorities ln(u)/w, u from salted
    md5 — no PRNG, so the drawn set is reproducible across runs,
    engines, and partitionings). Longer documents (weight = n_chars)
    are proportionally likelier; selection is one global top-k heap."""
    from ..operators.sampling import weighted_sample_topk

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        weighted_sample_topk(docs, "doc_id", "n_chars", k=200, salt="wsample")
        .withColumnRenamed("n_chars", "weight")
        .select("doc_id", "weight", "priority", "rank")
    )


@query(
    "embedding_dedup_clusters",
    # same recursive-CTE fixpoint oracle as dedup_clusters, over the
    # exact-cosine pair graph the driver already hash-verifies
    oracle="""
    WITH RECURSIVE p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 6) >= 0.3
    ),
    e AS (
      SELECT id_a AS u, id_b AS v FROM p
      UNION
      SELECT id_b, id_a FROM p
    ),
    reach(node, r) AS (
      SELECT DISTINCT u, u FROM e
      UNION
      SELECT x.node, e.v FROM reach x JOIN e ON x.r = e.u
    )
    SELECT node AS vec_id, MIN(r) AS cluster_id, MIN(r) = node AS is_keeper
    FROM reach GROUP BY node
    """,
)
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X1 semantic dedup, the acting step: exact cosine>=0.3 pairs
    grouped into clusters via the same distributed connected-components
    loop as the text dedup family, keeper elected per cluster. At scale
    the pair source swaps to lsh_ann with identical downstream shape."""
    from ..operators import graph as gr

    pairs = sim.cosine_pairs(
        table(spark, sf_dir, "embeddings"), threshold=0.3
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )
    return gr.dedup_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id", "is_keeper"
    )


def _simhash_oracle() -> str:
    """Full SQL replay of the md5-form SimHash pipeline (generated so
    the 64 bit-sums / packing / banding can never drift from the
    operator's parameters)."""
    sums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(64)
    )
    pack = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(64)
    )
    bandkeys = ", ".join(
        f"(CAST({k} AS BIGINT) << 16) | ((sig >> {k * 16}) & 65535)"
        for k in range(4)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS t FROM documents
    ),
    h AS (
      SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS h
      FROM tok
    ),
    s AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id, {pack} AS sig FROM s),
    banded AS (SELECT doc_id, sig, unnest([{bandkeys}]) AS key FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sig AS sa, b.sig AS sb
      FROM banded a JOIN banded b ON a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming FROM cand
    WHERE bit_count(xor(sa, sb)) <= 8
    """


@query("simhash_verify", oracle=None)  # oracle attached below (generated)
def simhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 SimHash, the driver-verified form (minhash_lsh_verify
    precedent): the SAME banding/verify pipeline as simhash_pairs but
    with md5-prefix token hashes, which DuckDB replays bit-for-bit —
    signature sums, packing, 16-bit band join, and the popcount verify
    are all hash-checked. The benched simhash_pairs keeps xxhash64
    (fastest JVM hash, not SQL-replayable -> rows-only by design)."""
    return dd.simhash_pairs(
        table(spark, sf_dir, "documents"), max_hamming=8, hash_fn="md5"
    )


from .registry import ORACLE as _ORACLE2  # noqa: E402

_ORACLE2["simhash_verify"] = _simhash_oracle()


@query("lsh_ann_verify", oracle=None)  # oracle attached below (generated)
def lsh_ann_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 hyperplane-LSH, the driver-verified form: the SAME seeded
    planes / banding / threshold as the benched embedding_lsh_ann, run
    through the pure-JVM signature+verify kernel, which DuckDB replays
    bit-for-bit (plane literals, fold-order-identical dots). The
    benched query keeps the Arrow/BLAS kernel (kernel equality is
    pinned in tests); with this, every sketch family in the registry
    carries a driver-hash-verified attestation."""
    return sim.lsh_ann(
        table(spark, sf_dir, "embeddings"), threshold=0.3, verify_kernel="sql"
    )


from .registry import ORACLE as _ORACLE3  # noqa: E402

_ORACLE3["lsh_ann_verify"] = sim.lsh_ann_oracle_sql()


# ---------------------------------------------------------------------------
# Round-5 additions. Registered BELOW the driver's 50-entry checked
# window (the window is reserved this round for the 25 queries that had
# no driver row after r4); local oracle parity covers them now and the
# round-6 rotation moves them into the window (see queries/__init__).
# ---------------------------------------------------------------------------


@query(
    "source_cap_docs",
    # the kept set is partitioning-independent, so a single QUALIFY
    # window replays the two-phase skew-safe implementation exactly
    oracle=f"""
    SELECT doc_id, source FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY source
      ORDER BY {_BUCKET_SQL.format(salt="cap")}, doc_id) <= 10
    """,
)
def source_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the RefinedWeb/C4 "domain cap": no
    single site may dominate the mixture): keep the 10 docs per source
    with the smallest salted-md5 rank — deterministic uniform draw per
    group, two-phase skew-safe window (operators/sampling.cap_per_group)."""
    from ..operators.sampling import cap_per_group

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(docs, "source", "doc_id", cap=10)


@query(
    "trigram_familiarity",
    oracle="""
    WITH low AS (SELECT doc_id, lower(text) AS t FROM documents),
    occ AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 2),
                    i -> substring(t, CAST(i AS INTEGER), 3))) AS tri
      FROM low WHERE len(t) >= 3
    ),
    model AS (SELECT tri, COUNT(*) AS n_t FROM occ GROUP BY tri),
    d AS (SELECT doc_id, tri, COUNT(*) AS c FROM occ GROUP BY doc_id, tri)
    SELECT d.doc_id, CAST(SUM(c) AS BIGINT) AS n_tri,
           CAST(SUM(c * n_t) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS familiarity
    FROM d JOIN model USING (tri)
    GROUP BY d.doc_id
    """,
)
def trigram_familiarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative text quality: mean corpus frequency of each
    document's character trigrams — the exact-integer stand-in for the
    CCNet n-gram-LM perplexity filter (garbled text is built from
    trigrams the corpus rarely produces). Ratio of exact counts, so
    hash-verified — no log/float model drift."""
    return tx.trigram_familiarity(table(spark, sf_dir, "documents"))


@query(
    "split_leakage_guard",
    # split replay: the md5-bucket 90/5/5 assignment keyed by the
    # cluster id (cluster = recursive-CTE closure over the exact
    # jaccard pair graph — same fixpoint as distributed hash-min CC)
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_TOKS} AS __t FROM documents
    ),
    sh AS (
      SELECT doc_id, {_SHINGLES} AS s FROM toks
    ),
    post AS (
      SELECT doc_id, len(s) AS ls, unnest(s) AS g FROM sh
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS inter, ANY_VALUE(a.ls) AS la, ANY_VALUE(b.ls) AS lb
      FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    p AS (
      SELECT id_a, id_b FROM cand
      WHERE inter::DOUBLE / (la + lb - inter) >= 0.5
    ),
    e AS (
      SELECT id_a AS u, id_b AS v FROM p
      UNION
      SELECT id_b, id_a FROM p
    ),
    reach(node, r) AS (
      SELECT DISTINCT u, u FROM e
      UNION
      SELECT x.node, e.v FROM reach x JOIN e ON x.r = e.u
    ),
    clusters AS (
      SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    ),
    assigned AS (
      SELECT d.doc_id, c.cluster_id,
             COALESCE(c.cluster_id, d.doc_id) AS sk
      FROM documents d LEFT JOIN clusters c USING (doc_id)
    ),
    split AS (
      SELECT doc_id, cluster_id,
             CASE WHEN CAST(('0x' || substring(
                      md5(CAST(sk AS VARCHAR) || 'split'), 1, 15)) AS BIGINT)
                    % 1000000 < 50000 THEN 'val'
                  WHEN CAST(('0x' || substring(
                      md5(CAST(sk AS VARCHAR) || 'split'), 1, 15)) AS BIGINT)
                    % 1000000 < 100000 THEN 'test'
                  ELSE 'train' END AS split
      FROM assigned
    ),
    viol AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_leaky_clusters
      FROM (SELECT cluster_id, COUNT(DISTINCT split) AS n_splits
            FROM split WHERE cluster_id IS NOT NULL GROUP BY cluster_id)
    )
    SELECT split, COUNT(*) AS n_docs, n_leaky_clusters
    FROM split, viol
    GROUP BY split, n_leaky_clusters
    """,
)
def split_leakage_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents
    MUST land in the same split (a train/test pair of near-dups leaks
    the test set into training), so the split key is the doc's dedup
    CLUSTER id (falling back to its own id when unclustered). Output:
    per-split doc counts plus the cross-split-cluster violation count,
    which the shared key makes zero BY CONSTRUCTION — the guard the
    oracle independently recomputes."""
    from ..operators.sampling import train_val_test_split

    docs = table(spark, sf_dir, "documents")
    clusters = _cluster_store(spark, sf_dir).select("doc_id", "cluster_id")
    assigned = docs.select("doc_id").join(F.broadcast(clusters), "doc_id", "left")
    split = train_val_test_split(
        assigned.withColumn(
            "sk", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
        ),
        "sk",
    )
    viol = (
        split.filter(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("n_leaky_clusters")
        )
    )
    return (
        split.groupBy("split")
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(F.broadcast(viol))
    )


@query(
    "dedup_apply",
    # the acting step on top of the cluster oracle: survivors = docs
    # that are unclustered or their cluster's keeper
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_TOKS} AS __t FROM documents
    ),
    sh AS (
      SELECT doc_id, {_SHINGLES} AS s FROM toks
    ),
    post AS (
      SELECT doc_id, len(s) AS ls, unnest(s) AS g FROM sh
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS inter, ANY_VALUE(a.ls) AS la, ANY_VALUE(b.ls) AS lb
      FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    p AS (
      SELECT id_a, id_b FROM cand
      WHERE inter::DOUBLE / (la + lb - inter) >= 0.5
    ),
    e AS (
      SELECT id_a AS u, id_b AS v FROM p
      UNION
      SELECT id_b, id_a FROM p
    ),
    reach(node, r) AS (
      SELECT DISTINCT u, u FROM e
      UNION
      SELECT x.node, e.v FROM reach x JOIN e ON x.r = e.u
    ),
    clusters AS (
      SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    )
    SELECT 'survivors' AS sub, d.doc_id AS n
    FROM documents d LEFT JOIN clusters c USING (doc_id)
    WHERE c.cluster_id IS NULL OR c.cluster_id = d.doc_id
    UNION ALL
    SELECT 'n_removed', (SELECT CAST(COUNT(*) AS BIGINT) FROM clusters
                         WHERE cluster_id != doc_id)
    """,
)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 dedup, the FINAL acting step a pipeline actually ships:
    the cleaned corpus — every document that is either unclustered or
    its near-dup cluster's elected keeper — plus the removed-row count.
    Pairs → clusters → apply, end to end, with the cluster membership
    and the surviving id set both inside the one union hash. The
    anti-join is a broadcast (cluster frame ≪ corpus)."""
    from ..operators import graph as gr

    docs = table(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs(
        docs, threshold=0.5, shingle_sets=_shingle_store(spark, sf_dir)
    ).select("id_a", "id_b")
    clusters = gr.dedup_clusters(pairs).select(
        "doc_id", "cluster_id", "is_keeper"
    )
    joined = docs.select("doc_id").join(F.broadcast(clusters), "doc_id", "left")
    survivors = joined.filter(
        F.col("cluster_id").isNull() | F.col("is_keeper")
    ).select(F.lit("survivors").alias("sub"), F.col("doc_id").alias("n"))
    removed = (
        joined.filter(F.col("cluster_id").isNotNull() & ~F.col("is_keeper"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("n_removed").alias("sub"), "n")
    )
    return survivors.unionByName(removed)


@query(
    "dq_lineitem",
    oracle="""
    SELECT 'not_null:l_orderkey' AS constraint_name,
           CAST(COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT)
             AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'not_null:l_quantity',
           CAST(COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'check:qty_range',
           CAST(COUNT(CASE WHEN NOT COALESCE(
             l_quantity BETWEEN 1 AND 50, FALSE) THEN 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'check:discount_range',
           CAST(COUNT(CASE WHEN NOT COALESCE(
             l_discount BETWEEN 0.0 AND 0.10, FALSE) THEN 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'check:price_nonneg',
           CAST(COUNT(CASE WHEN NOT COALESCE(
             l_extendedprice >= 0.0, FALSE) THEN 1 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'unique:l_orderkey,l_linenumber',
           CAST(COUNT(*) - (SELECT COUNT(*) FROM
             (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
             AS BIGINT)
    FROM lineitem
    """,
)
def dq_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (operators/dq.check_constraints): TPC-H-style
    lineitem invariants — key non-nullness, (orderkey, linenumber)
    uniqueness, quantity/discount ranges, non-negative prices — one
    scan of conditional counts + one distinct-count per key. The
    publish-gate every ingest batch should pass before the data goes
    live; the violation counts are exact so even "0" is hash-verified."""
    from ..operators.dq import check_constraints

    li = table(spark, sf_dir, "lineitem")
    return check_constraints(
        li,
        not_null=["l_orderkey", "l_quantity"],
        unique=[["l_orderkey", "l_linenumber"]],
        checks={
            "qty_range": F.col("l_quantity").between(1, 50),
            "discount_range": F.col("l_discount").between(0.0, 0.10),
            "price_nonneg": F.col("l_extendedprice") >= 0.0,
        },
    )


#: Bump when the PQ pipeline changes (codebook rule, m, ksub, encode).
_PQ_STORE_VERSION = "pq-d64-m16-k64-v1"


def _pq_store(spark: SparkSession, sf_dir: str):
    """Persisted PQ index shared by the PQ query family (the FAISS
    train/add vs search split): codebooks + encoded codes are built
    once per corpus version (keyed by path + mtime + pipeline version,
    atomic publish) and queries score from the m-byte codes scan —
    the raw embedding table is not read at query time."""
    import os

    from ..operators._util import cached_store

    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        mtime = int(os.path.getmtime(src))
    except OSError:
        mtime = 0
    path = cached_store(
        lambda scratch: sim.pq_index_build(
            table(spark, sf_dir, "embeddings"), scratch, dim=64, m=16, ksub=64
        ),
        "tsdp_pq_index",
        f"{os.path.abspath(sf_dir)}:{mtime}:{_PQ_STORE_VERSION}",
    )
    return sim.pq_index_load(spark, path)


@query("embedding_pq_topk", oracle=None)  # oracle attached below (generated)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 product-quantization search (FAISS-style ADC, Jégou et al.
    2011): the corpus collapses to 16 one-byte centroid codes per
    vector (16× smaller than float32 — at 100 TB the codes table is
    what stays hot) and queries score against codebook lookups, never
    raw vectors. Deterministic md5-rank codebooks + fixed fold orders
    make even this approximate path hash-verified end-to-end (codebook
    selection, argmin encoding, ADC scores); recall vs exact cosine is
    pinned in tests, with embedding_pq_rerank as the high-recall form.
    Codes + codebooks come from the persisted PQ index (_pq_store) —
    queries never re-encode the corpus."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.pq_topk(
        emb, emb.filter(F.col("vec_id") < 5), dim=64, k=10,
        index=_pq_store(spark, sf_dir),
    )


from .registry import ORACLE as _ORACLE4  # noqa: E402

_ORACLE4["embedding_pq_topk"] = sim.pq_oracle_sql()


@query("embedding_pq_rerank", oracle=None)  # oracle attached below (generated)
def embedding_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 ADC + exact re-rank (the IVFADC+R pattern): the compressed
    pass shortlists 100 candidates per query from codes alone, raw
    vectors are fetched for the shortlist ONLY (per-mille of the corpus
    at scale), and exact cosine restores the ranking — measured
    recall@10 = 0.98 vs exact on this corpus. Hash-verified end to end
    including the re-rank join. Shortlisting scores off the persisted
    index; only the shortlist join touches raw vectors."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.pq_topk_rerank(
        emb, emb.filter(F.col("vec_id") < 5), dim=64, shortlist=100, k=10,
        index=_pq_store(spark, sf_dir),
    )


_ORACLE4["embedding_pq_rerank"] = sim.pq_oracle_sql(rerank_from=100)


@query("bpe_learn_merges")  # rows-only: iterative training loop — no SQL replay
def bpe_learn_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 tokenizer TRAINING: learn the top-20 BPE merges from the
    corpus word-frequency table (one distributed aggregate; the pair
    loop runs driver-side over the bounded vocabulary — the
    HF-tokenizers shape). Iterative with data-dependent state, so no
    SQL engine can replay it (same rows-only class as the CC loop
    before its recursive-CTE oracle); determinism (max count, lexico-
    smallest tie-break), well-formedness, and partitioning-invariance
    are pinned in tests, and the learned table feeds the SAME encoder
    the hash-verified bpe_encode_stats already replays in DuckDB."""
    merges = tx.learn_bpe_merges(table(spark, sf_dir, "documents"), n_merges=20)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    )


@query(
    "pack_sequences",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'pack'),
                   1, 15)) AS BIGINT) % 1000000 AS b
      FROM documents
    ),
    o AS (
      SELECT doc_id, n_tokens,
             -- CAST: DuckDB's SUM(BIGINT) returns HUGEINT, which pandas
             -- materializes as float64 and breaks the value-hash against
             -- Spark's int64 even when every value is identical.
             CAST(SUM(n_tokens) OVER (ORDER BY b, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS token_offset
      FROM d
    )
    SELECT doc_id, n_tokens, token_offset,
           CAST(FLOOR(token_offset / 128) AS BIGINT) AS seq_first,
           CAST(FLOOR((token_offset + n_tokens - 1) / 128) AS BIGINT)
             AS seq_last,
           CAST(FLOOR((token_offset + n_tokens - 1) / 128)
                - FLOOR(token_offset / 128) AS BIGINT) AS n_boundary_splits
    FROM o
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 sequence packing (the GPT-style concat-and-chop pack): the
    manifest a training loader uses to build 128-token packed batches —
    deterministic md5-rank layout, running token offsets, first/last
    sequence per doc and boundary-split counts, all exact integers.
    One window over one global ordering (shard first at 100 TB)."""
    return tx.pack_sequences(table(spark, sf_dir, "documents"), budget=128)


@query(
    "pack_sequences_sharded",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'pack'),
                   1, 15)) AS BIGINT) % 1000000 AS b,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                   || 'pack:shard'), 1, 15)) AS BIGINT) % 1000000 % 8 AS shard
      FROM documents
    ),
    o AS (
      SELECT doc_id, n_tokens,
             -- The sharded pack is by construction the exact global pack
             -- under the ordering (shard, rank, id); CAST because DuckDB's
             -- SUM(BIGINT) returns HUGEINT (pandas float64, hash-breaking).
             CAST(SUM(n_tokens) OVER (ORDER BY shard, b, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS token_offset
      FROM d
    )
    SELECT doc_id, n_tokens, token_offset,
           CAST(FLOOR(token_offset / 128) AS BIGINT) AS seq_first,
           CAST(FLOOR((token_offset + n_tokens - 1) / 128) AS BIGINT)
             AS seq_last,
           CAST(FLOOR((token_offset + n_tokens - 1) / 128)
                - FLOOR(token_offset / 128) AS BIGINT) AS n_boundary_splits
    FROM o
    """,
)
def pack_sequences_sharded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 sequence packing, SCALE PATH (VERDICT r6 item 2): 8-way
    hash-sharded — per-shard running offsets via Window.partitionBy
    (distributed), shard base offsets via a triangular broadcast join
    over the 8-row totals aggregate. The plan contains no
    single-partition exchange (pinned by tests/test_plans.py), yet the
    result is the exact global pack under the (shard, rank, id)
    ordering, so it stays hash-attestable against a plain windowed-SUM
    oracle."""
    return tx.pack_sequences(
        table(spark, sf_dir, "documents"), budget=128, n_shards=8
    )


_NEG_BUCKET = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '{salt}'),"
    " 1, 15)) AS BIGINT) % 1000000"
)


@query(
    "negative_pairs",
    oracle=f"""
    WITH ra AS (
      SELECT doc_id AS a, row_number() OVER (ORDER BY
        {_NEG_BUCKET.format(salt="nega")}, doc_id) AS r
      FROM documents QUALIFY r <= 120
    ),
    rb AS (
      SELECT doc_id AS b, row_number() OVER (ORDER BY
        {_NEG_BUCKET.format(salt="negb")}, doc_id) AS r
      FROM documents QUALIFY r <= 120
    ),
    cand AS (
      SELECT DISTINCT LEAST(a, b) AS id_a, GREATEST(a, b) AS id_b
      FROM ra JOIN rb USING (r) WHERE a != b
    ),
    pos AS (
      SELECT id_a, id_b FROM ({{jacc}})
    )
    SELECT id_a, id_b FROM cand
    WHERE NOT EXISTS (SELECT 1 FROM pos
                      WHERE pos.id_a = cand.id_a AND pos.id_b = cand.id_b)
    """.replace("{jacc}", "__JACC__"),
)
def negative_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X3 contrastive-training negatives: 120 deterministic
    pseudo-random document pairs that are NOT near-dups — two salted
    md5 rankings zipped by rank (reproducible pairing, no cross join),
    canonicalized, with the exact-jaccard positives anti-joined out."""
    from ..operators.sampling import negative_pairs

    docs = table(spark, sf_dir, "documents")
    pos = dd.jaccard_pairs(
        docs, threshold=0.5, shingle_sets=_shingle_store(spark, sf_dir)
    ).select("id_a", "id_b")
    return negative_pairs(docs, pos, n=120)


from .registry import ORACLE as _ORACLE5  # noqa: E402

_ORACLE5["negative_pairs"] = _ORACLE5["negative_pairs"].replace(
    "__JACC__", _ORACLE5["ngram_jaccard_pairs"]
)


@query(
    "dsir_weights",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang = 'en' AS is_t, {_TOKS} AS __t FROM documents),
    gr AS (
      SELECT doc_id, is_t,
             unnest(list_transform(range(1, len(__t)),
               i -> __t[CAST(i AS INTEGER)] || ' '
                    || __t[CAST(i AS INTEGER) + 1])) AS g
      FROM t
    ),
    gb AS (
      SELECT doc_id, is_t,
             CAST(('0x' || substring(md5(g || 'dsir'), 1, 15)) AS BIGINT)
               % 1024 AS b
      FROM gr
    ),
    model AS (
      SELECT b, COUNT(*) AS n_raw,
             SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_tgt
      FROM gb GROUP BY b
    ),
    tot AS (SELECT SUM(n_raw) AS nr, SUM(n_tgt) AS nt FROM model),
    lm AS (
      SELECT b,
             CAST(round(
               ln((CAST(n_tgt AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + 1024))
               - ln((CAST(n_raw AS DOUBLE) + 1.0) / (CAST(nr AS DOUBLE) + 1024)),
               6) AS DECIMAL(18,6)) AS l
      FROM model, tot
    ),
    d AS (SELECT doc_id, b, COUNT(*) AS c FROM gb GROUP BY doc_id, b)
    SELECT d.doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(SUM(c * l) AS DOUBLE) AS dsir_logw
    FROM d JOIN lm USING (b)
    GROUP BY d.doc_id
    """,
)
def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 data selection: DSIR importance log-weights (Xie et al. 2023)
    under hashed-bigram bag models — target = English docs, raw = the
    whole corpus. The model is B=1024 buckets REGARDLESS of corpus size
    (the hashing trick), broadcast back onto one exploded scan; per-doc
    scores are exact decimal Σ c·L sums, so even this statistical
    operator is hash-verified. On this corpus English docs average
    −0.14 vs −2.6..−3.0 for other languages — the separation a
    target-mixture resample keys on."""
    from ..operators import curation as cu

    return cu.dsir_logweights(
        table(spark, sf_dir, "documents"), target=F.col("lang") == "en"
    )


@query(
    "duplicate_spans",
    # the oracle joins on the identical 16-hex md5-prefix keys the Spark
    # plan shuffles on (contamination_overlap convention)
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS __t FROM documents),
    g AS (
      SELECT doc_id, u.pos AS pos, u.gh AS gh FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(__t) - 4),
          i -> struct_pack(pos := i - 1,
            gh := substring(md5(__t[CAST(i AS INTEGER)] || ' '
                    || __t[CAST(i AS INTEGER) + 1] || ' '
                    || __t[CAST(i AS INTEGER) + 2] || ' '
                    || __t[CAST(i AS INTEGER) + 3] || ' '
                    || __t[CAST(i AS INTEGER) + 4] || ' '
                    || __t[CAST(i AS INTEGER) + 5]), 1, 16)))) AS u
        FROM t)
    ),
    ok AS (SELECT gh FROM g GROUP BY gh
           HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 10),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS i,
             b.pos - a.pos AS diag
      FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
      WHERE a.gh IN (SELECT gh FROM ok)
    ),
    isl AS (
      SELECT *, i - row_number() OVER (
        PARTITION BY id_a, id_b, diag ORDER BY i) AS grp
      FROM m
    )
    SELECT id_a, id_b, MIN(i) AS a_start, MIN(i) + diag AS b_start,
           MAX(i) - MIN(i) + 6 AS n_tokens
    FROM isl GROUP BY id_a, id_b, diag, grp
    HAVING MAX(i) - MIN(i) + 6 >= 8
    """,
)
def duplicate_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 span-level exact dedup (Lee et al. 2022): maximal runs of ≥8
    consecutive shared tokens between document pairs via a positional
    6-gram inverted index + diagonal run-length merge — catches the
    quoted-passage / boilerplate duplication document-level near-dedup
    scores but cannot localize. Posting lists are df-capped (2..10) so
    the pair expansion stays near-linear; only 16-byte hashes and int
    offsets ever shuffle."""
    from ..operators import curation as cu

    return cu.duplicate_spans(
        table(spark, sf_dir, "documents"), k=6, min_tokens=8, max_df=10
    )


@query(
    "mixture_plan",
    oracle=f"""
    WITH t AS (SELECT lang, len({_TOKS}) AS n FROM documents),
    a AS (
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens
      FROM t GROUP BY lang
    ),
    w(lang, weight) AS (VALUES
      ('en', CAST(0.5 AS DOUBLE)), ('es', CAST(0.2 AS DOUBLE)),
      ('de', CAST(0.15 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE)),
      ('zh', CAST(0.05 AS DOUBLE))),
    j AS (SELECT a.*, w.weight FROM a JOIN w USING (lang)),
    b AS (SELECT MIN(CAST(n_tokens AS DOUBLE) / weight) AS budget FROM j)
    SELECT lang, n_docs, n_tokens, weight,
           round(least(budget * weight / CAST(n_tokens AS DOUBLE), 1.0), 9)
             AS sample_rate,
           round(budget * weight, 6) AS expected_tokens
    FROM j, b
    """,
)
def mixture_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 data mixing (Pile/Dolma-style): the largest token budget the
    corpus can serve at the target language mixture (en .5 / es .2 /
    de .15 / fr .1 / zh .05) without oversampling any group, plus the
    per-group deterministic sample rate realizing it — the planning
    step between curation and training. One corpus aggregate; all
    mixture arithmetic on the 5-row group frame."""
    from ..operators import curation as cu

    return cu.mixture_plan(
        table(spark, sf_dir, "documents"),
        {"en": 0.5, "es": 0.2, "de": 0.15, "fr": 0.1, "zh": 0.05},
    )


@query(
    "corpus_drift",
    oracle=f"""
    WITH t AS (SELECT lang = 'en' AS is_t, {_TOKS} AS __t FROM documents),
    gr AS (
      SELECT is_t, unnest(list_transform(range(1, len(__t)),
        i -> __t[CAST(i AS INTEGER)] || ' '
             || __t[CAST(i AS INTEGER) + 1])) AS g
      FROM t
    ),
    gb AS (
      SELECT is_t,
             CAST(('0x' || substring(md5(g || 'dsir'), 1, 15)) AS BIGINT)
               % 1024 AS b
      FROM gr
    ),
    model AS (
      SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS cp,
             SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cq
      FROM gb GROUP BY b
    ),
    tot AS (SELECT SUM(cp) AS np, SUM(cq) AS nq, COUNT(*) AS hits FROM model),
    terms AS (
      SELECT
        SUM(CAST(cp + 1 AS DECIMAL(20,0))
            * CAST(round(ln((CAST(cp AS DOUBLE) + 1.0)
                            / (CAST(cq AS DOUBLE) + 1.0))
                       + ln((CAST(nq AS DOUBLE) + 1024)
                            / (CAST(np AS DOUBLE) + 1024)), 6)
                   AS DECIMAL(18,6))) AS s_pq,
        SUM(CAST(cq + 1 AS DECIMAL(20,0))
            * CAST(round(ln((CAST(cq AS DOUBLE) + 1.0)
                            / (CAST(cp AS DOUBLE) + 1.0))
                       + ln((CAST(np AS DOUBLE) + 1024)
                            / (CAST(nq AS DOUBLE) + 1024)), 6)
                   AS DECIMAL(18,6))) AS s_qp,
        SUM(abs(CAST(cp + 1 AS DECIMAL(18,0))
                  * CAST(nq + 1024 AS DECIMAL(18,0))
              - CAST(cq + 1 AS DECIMAL(18,0))
                  * CAST(np + 1024 AS DECIMAL(18,0)))) AS s_tvd
      FROM model, tot
    )
    SELECT hits AS n_buckets_hit,
           CAST(s_pq + CAST(1024 - hits AS DECIMAL(18,0))
                * CAST(round(ln((CAST(nq AS DOUBLE) + 1024)
                               / (CAST(np AS DOUBLE) + 1024)), 6)
                       AS DECIMAL(18,6)) AS DOUBLE)
             / (CAST(np AS DOUBLE) + 1024) AS kl_target_rest,
           CAST(s_qp + CAST(1024 - hits AS DECIMAL(18,0))
                * CAST(round(ln((CAST(np AS DOUBLE) + 1024)
                               / (CAST(nq AS DOUBLE) + 1024)), 6)
                       AS DECIMAL(18,6)) AS DOUBLE)
             / (CAST(nq AS DOUBLE) + 1024) AS kl_rest_target,
           0.5 * CAST(s_tvd + CAST(1024 - hits AS DECIMAL(18,0))
                * abs(CAST(nq AS DECIMAL(18,0))
                      - CAST(np AS DECIMAL(18,0))) AS DOUBLE)
             / ((CAST(np AS DOUBLE) + 1024) * (CAST(nq AS DOUBLE) + 1024))
             AS tvd
    FROM terms, tot
    """,
)
def corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 corpus monitoring: distribution drift between the target
    (English) subcorpus and the rest — both KL divergences and total
    variation over hashed-bigram buckets with add-one smoothing. The
    statistic a pipeline tracks across crawl/curation versions to
    detect token-distribution shift. Exact decimal sums of 6-dp log
    terms + a pure-integer TVD numerator make even the divergence
    hash-verified; empty buckets enter via a closed-form correction so
    it is the full-simplex statistic."""
    from ..operators import curation as cu

    return cu.distribution_drift(
        table(spark, sf_dir, "documents"), target=F.col("lang") == "en"
    )


@query("chunk_dedup_stats", oracle=None)  # oracle attached below (composed)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X4 chunk-level dedup audit: total chunks, distinct chunk
    hashes, duplicate fraction, and the most-copied chunk's multiplicity
    over the doc_chunks windows — duplication at the training-input
    granularity (boilerplate shows up here even when documents differ).
    One aggregate over the chunk digests; never the text."""
    chunks = doc_chunks(spark, sf_dir)
    d = chunks.agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("chunk_hash").alias("n_distinct"),
    )
    top = (
        chunks.groupBy("chunk_hash")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("max_copies"))
    )
    return d.crossJoin(F.broadcast(top)).select(
        "n_chunks",
        "n_distinct",
        (
            (F.col("n_chunks") - F.col("n_distinct")).cast("double")
            / F.col("n_chunks").cast("double")
        ).alias("dup_chunk_fraction"),
        "max_copies",
    )


@query("label_outliers", oracle=None)  # oracle attached below (composed)
def label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 label QA (Confident-Learning-lite): the 20 vectors globally
    farthest from their own label centroid by cosine — the first-pass
    screen for mislabeled / out-of-class samples. Centroids broadcast
    (9-dp-rounded, engine-reproducible), bottom-k is a
    TakeOrderedAndProject."""
    return sim.centroid_outliers(table(spark, sf_dir, "embeddings"), k=20)


_ORACLE5["chunk_dedup_stats"] = f"""
    WITH ch AS ({_ORACLE5["doc_chunks"]})
    SELECT COUNT(*) AS n_chunks,
           COUNT(DISTINCT chunk_hash) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT chunk_hash) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_chunk_fraction,
           (SELECT MAX(c) FROM
              (SELECT COUNT(*) AS c FROM ch GROUP BY chunk_hash))
             AS max_copies
    FROM ch
"""

_ORACLE5["label_outliers"] = f"""
    WITH lc AS ({_ORACLE5["label_centroids"]}),
    cv AS (SELECT label, list(centroid_val ORDER BY pos) AS cvec
           FROM lc GROUP BY label),
    s AS (
      SELECT e.vec_id, e.label,
             round(list_cosine_similarity(e.embedding::DOUBLE[], cv.cvec), 6)
               AS cos_to_centroid
      FROM embeddings e JOIN cv USING (label)
    )
    SELECT vec_id, label, cos_to_centroid,
           row_number() OVER (ORDER BY cos_to_centroid ASC, vec_id) AS rank
    FROM s ORDER BY cos_to_centroid ASC, vec_id LIMIT 20
"""


@query("span_dedup_apply", oracle=None)  # oracle attached below (composed)
def span_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 span-level dedup, the acting step: cut every detected
    duplicate span from the LATER document of its pair (first
    occurrence wins — the Lee et al. 2022 retention rule), emitting
    per-doc before/after token counts and the md5 digest of the
    surviving text for every document. The digest is what the oracle
    replays, so the cut itself — indexed in-row token filtering — is
    hash-verified end to end."""
    from ..operators import curation as cu

    docs = table(spark, sf_dir, "documents")
    spans = cu.duplicate_spans(docs, k=6, min_tokens=8, max_df=10)
    return cu.remove_duplicate_spans(docs, spans)


def _span_apply_oracle() -> str:
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS __t FROM documents),
    sp AS (SELECT * FROM ({_ORACLE5["duplicate_spans"]})),
    pos AS (
      SELECT doc_id, (u).i AS i, (u).tok AS tok FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(__t) + 1),
          j -> struct_pack(i := j - 1, tok := __t[CAST(j AS INTEGER)]))) AS u
        FROM t)
    ),
    drop_pos AS (
      SELECT DISTINCT id_b AS doc_id, b_start + unnest(range(0, n_tokens)) AS i
      FROM sp
    ),
    kept AS (
      SELECT pos.doc_id, pos.i, pos.tok
      FROM pos ANTI JOIN drop_pos
        ON pos.doc_id = drop_pos.doc_id AND pos.i = drop_pos.i
    ),
    agg AS (
      SELECT doc_id, COUNT(*)::BIGINT AS n_after,
             string_agg(tok, ' ' ORDER BY i) AS s
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, len(__t)::BIGINT AS n_tokens_before,
           coalesce(agg.n_after, 0)::BIGINT AS n_tokens_after,
           md5(coalesce(agg.s, '')) AS cleaned_hash
    FROM t LEFT JOIN agg USING (doc_id)
    """


_ORACLE5["span_dedup_apply"] = _span_apply_oracle()


def _hybrid_oracle() -> str:
    from ..operators import search as srch

    lex = srch.bm25_oracle_sql(_BM25_TERMS, _TOKS, k=20)
    return f"""
    WITH lex AS ({lex}),
    dense AS (
      SELECT doc_id, rank FROM (
        SELECT c.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY round(list_cosine_similarity(
                   q.qv, c.embedding::DOUBLE[]), 6) DESC, c.vec_id) AS rank
        FROM (SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = 0) q
        CROSS JOIN embeddings c WHERE c.vec_id != 0
      ) WHERE rank <= 20
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
             round(COALESCE(1.0 / (60.0 + CAST(lex.rank AS DOUBLE)), 0.0)
                 + COALESCE(1.0 / (60.0 + CAST(dense.rank AS DOUBLE)), 0.0),
                   9) AS rrf_score
      FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
    )
    SELECT doc_id, rrf_score,
           row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
    """


@query("hybrid_search_rrf", oracle=None)  # oracle attached below (generated)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X4 hybrid retrieval: Reciprocal Rank Fusion (Cormack et al.
    2009, k=60) of BM25 top-20 over documents and cosine top-20 around
    query vector 0 (embeddings.vec_id indexes the same corpus row as
    documents.doc_id in this star schema). Both lists are top-k frames,
    so the fusion is a k-row outer join — constant-size at any corpus
    scale."""
    from ..operators import curation as cu
    from ..operators import search as srch

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    lex = srch.bm25_topk(docs, _BM25_TERMS, k=20).select("doc_id", "rank")
    dense = sim.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=20).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return cu.rrf_fuse(lex, dense, k=10)


_ORACLE5["hybrid_search_rrf"] = _hybrid_oracle()


def _curation_oracle() -> str:
    # Composed verbatim from the registered stage oracles (the
    # negative_pairs / suite pattern): the pipeline's verdict per doc is
    # recomputed from the SAME SQL the driver already verifies stage by
    # stage, so the composition cannot drift from its parts.
    return f"""
    WITH ex AS (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      FROM documents
    ),
    cl AS (SELECT * FROM ({_ORACLE5["dedup_clusters"]})),
    rep AS (SELECT doc_id, repetitive FROM ({_ORACLE5["doc_repetition"]})),
    w AS (SELECT doc_id, dsir_logw FROM ({_ORACLE5["dsir_weights"]})),
    q AS (
      SELECT doc_id,
             CASE WHEN len(__t) > 0 THEN
               0.4 * least(CAST(len(__t) AS DOUBLE) / 100.0, 1.0)
               + 0.4 * (1.0 - CAST(len(list_filter(__t,
                   x -> list_contains(['the','a','of','and','is'], x)))
                   AS DOUBLE) / len(__t))
               + 0.2 * least((CAST(list_sum(list_transform(__t,
                   x -> length(x))) AS DOUBLE) / len(__t)) / 10.0, 1.0)
             END AS quality
      FROM (SELECT doc_id, {_TOKS} AS __t FROM documents)
    )
    SELECT doc_id, reason, reason = 'kept' AS keep FROM (
      SELECT d.doc_id,
        CASE WHEN d.doc_id != ex.keeper THEN 'exact_dup'
             WHEN coalesce(NOT cl.is_keeper, FALSE) THEN 'near_dup'
             WHEN coalesce(rep.repetitive, FALSE) THEN 'repetitive'
             WHEN coalesce(q.quality, 0.0) < 0.55 THEN 'low_quality'
             WHEN coalesce(w.dsir_logw, -999.0) < -2.0 THEN 'off_target'
             ELSE 'kept' END AS reason
      FROM documents d
      JOIN ex USING (doc_id)
      LEFT JOIN cl USING (doc_id)
      LEFT JOIN rep USING (doc_id)
      LEFT JOIN q USING (doc_id)
      LEFT JOIN w USING (doc_id)
    )
    """


@query("curation_pipeline", oracle=None)  # oracle attached below (composed)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X4 end-to-end corpus curation (the FineWeb/RefinedWeb cascade
    as ONE declarative job): per document, the first failing gate in a
    fixed priority order — exact duplicate (md5 keeper election) →
    near-duplicate (jaccard-CC cluster non-keeper) → repetitive
    (Gopher n-gram dominance) → low quality (composite score < 0.55) →
    off-target (DSIR log-weight < −2.0) — else kept. Returns the audit
    manifest (doc_id, reason, keep) a production pipeline materializes
    beside the kept corpus.

    Scale shape: every stage is a per-doc frame joined back on doc_id
    (co-partitioned hash joins); the only non-linear stage is the CC
    round loop already bounded by the dedup-cluster operator. Flags are
    computed on the full corpus and cascaded by priority, so the reason
    histogram is stable under any evaluation order."""
    from ..operators import curation as cu
    from ..operators._util import pin as _pin

    docs = table(spark, sf_dir, "documents")
    md = docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("__h")
    )
    ex = md.join(
        md.groupBy("__h").agg(F.min("doc_id").alias("__keeper")), "__h"
    ).select("doc_id", (F.col("doc_id") != F.col("__keeper")).alias("__exact_dup"))
    cl = _cluster_store(spark, sf_dir).select("doc_id", "is_keeper")
    # ONE spread + tokenize + pin shared by the three token-consuming
    # gates: each arm re-deriving the interpreted token split (and
    # re-scanning the text column) tripled the pipeline's per-row work;
    # threading the materialized array through tokens_col evaluates the
    # split once per document (the doc_profile lesson, applied across
    # the composed arms). The spread also parallelizes the quality and
    # dsir gram passes — standalone they lose the exchange A/B, but
    # here the exchange is paid once for all three arms.
    toked = _pin(
        tx.spread_small_scan(
            docs.select("doc_id", "lang", "text")
        ).select(
            "doc_id",
            (F.col("lang") == "en").alias("__is_t"),
            tx.tokens("text").alias("__t"),
        )
    )
    rep = tx.repetition_stats(toked, tokens_col="__t").select(
        "doc_id", "repetitive"
    )
    qual = tx.quality_score(toked, tokens_col="__t").select("doc_id", "quality")
    w = cu.dsir_logweights(
        toked, target=F.col("__is_t"), tokens_col="__t"
    ).select("doc_id", "dsir_logw")
    reason = (
        F.when(F.col("__exact_dup"), F.lit("exact_dup"))
        .when(F.coalesce(~F.col("is_keeper"), F.lit(False)), F.lit("near_dup"))
        .when(F.coalesce(F.col("repetitive"), F.lit(False)), F.lit("repetitive"))
        .when(F.coalesce(F.col("quality"), F.lit(0.0)) < 0.55, F.lit("low_quality"))
        .when(
            F.coalesce(F.col("dsir_logw"), F.lit(-999.0)) < -2.0,
            F.lit("off_target"),
        )
        .otherwise(F.lit("kept"))
    )
    return (
        docs.select("doc_id")
        .join(ex, "doc_id")
        .join(cl, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(qual, "doc_id", "left")
        .join(w, "doc_id", "left")
        .select("doc_id", reason.alias("reason"))
        .withColumn("keep", F.col("reason") == "kept")
    )


_ORACLE5["curation_pipeline"] = _curation_oracle()


# ---------------------------------------------------------------------------
# suite_round5 — every round-5 below-cap query verified through ONE
# in-window union hash (the suite_timeseries_stats pattern): the ten
# additions get a driver CORRECTNESS row THIS round instead of waiting
# for the round-6 rotation. Oracles are the constituents' registered
# SQL verbatim, so the suite cannot drift from the singletons.
# ---------------------------------------------------------------------------

from .registry import ORACLE as _OR5  # noqa: E402

_SUITE_R5_SQL = f"""
    SELECT 'source_cap_docs' AS sub, CAST(t.doc_id AS VARCHAR) AS k1,
           t.source AS k2, CAST(NULL AS BIGINT) AS n,
           CAST(NULL AS DOUBLE) AS value
    FROM ({_OR5["source_cap_docs"]}) t
    UNION ALL
    SELECT 'trigram_familiarity', CAST(t.doc_id AS VARCHAR), NULL,
           t.n_tri, t.familiarity
    FROM ({_OR5["trigram_familiarity"]}) t
    UNION ALL
    SELECT 'split_leakage_guard', t.split, NULL, t.n_docs,
           CAST(t.n_leaky_clusters AS DOUBLE)
    FROM ({_OR5["split_leakage_guard"]}) t
    UNION ALL
    SELECT 'embedding_pq_topk', CAST(t.query_id AS VARCHAR),
           CAST(t.neighbor_id AS VARCHAR), t.rank, t.score
    FROM ({_OR5["embedding_pq_topk"]}) t
    UNION ALL
    SELECT 'embedding_pq_rerank', CAST(t.query_id AS VARCHAR),
           CAST(t.neighbor_id AS VARCHAR), t.rank, t.cos_sim
    FROM ({_OR5["embedding_pq_rerank"]}) t
    UNION ALL
    SELECT 'window_percentiles_15m', t.event_type,
           CAST(epoch_us(t.window_start) AS VARCHAR) || '|' || m.k2,
           t.n, m.value
    FROM ({_OR5["window_percentiles_15m"]}) t,
         LATERAL (VALUES ('p50', t.p50), ('p95', t.p95)) AS m(k2, value)
    UNION ALL
    SELECT 'day_over_day_delta', t.event_type,
           CAST(epoch_us(t.bucket) AS VARCHAR) || '|' || m.k2,
           CAST(NULL AS BIGINT), m.value
    FROM ({_OR5["day_over_day_delta"]}) t,
         LATERAL (VALUES ('cur', t.avg_value), ('prev', t.avg_value_prev_day),
                         ('delta', t.dod_delta)) AS m(k2, value)
    UNION ALL
    SELECT 'dedup_apply', t.sub, NULL, t.n, CAST(NULL AS DOUBLE)
    FROM ({_OR5["dedup_apply"]}) t
    UNION ALL
    SELECT 'holt_linear_final', t.event_type, m.k2, t.n, m.value
    FROM ({_OR5["holt_linear_final"]}) t,
         LATERAL (VALUES ('level', t.level), ('trend', t.trend),
                         ('forecast_next', t.forecast_next)) AS m(k2, value)
    UNION ALL
    SELECT 'decimate_lttb', t.event_type,
           CAST(t.bucket AS VARCHAR) || '|' || CAST(epoch_us(t.ts) AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(t.value AS DOUBLE)
    FROM ({_OR5["decimate_lttb"]}) t
    UNION ALL
    SELECT 'trailing_1h_mean', t.event_type,
           CAST(epoch_us(t.ts) AS VARCHAR), CAST(NULL AS BIGINT),
           t.trailing_mean_1h
    FROM ({_OR5["trailing_1h_mean"]}) t
    UNION ALL
    SELECT 'state_duration', t.event_type, CAST(t.event_id AS VARCHAR),
           t.state_duration_s, CAST(t.high AS INTEGER)::DOUBLE
    FROM ({_OR5["state_duration"]}) t
    UNION ALL
    SELECT 'series_correlation', CAST(NULL AS VARCHAR), 'pearson_r',
           t.n, t.pearson_r
    FROM ({_OR5["series_correlation"]}) t
    UNION ALL
    SELECT 'dq_lineitem', t.constraint_name, CAST(NULL AS VARCHAR),
           t.n_violations, CAST(NULL AS DOUBLE)
    FROM ({_OR5["dq_lineitem"]}) t
    UNION ALL
    SELECT 'pack_sequences', CAST(t.doc_id AS VARCHAR),
           CAST(t.seq_first AS VARCHAR) || '|' || CAST(t.seq_last AS VARCHAR)
             || '|' || CAST(t.n_boundary_splits AS VARCHAR),
           t.token_offset, CAST(t.n_tokens AS DOUBLE)
    FROM ({_OR5["pack_sequences"]}) t
    UNION ALL
    SELECT 'negative_pairs', CAST(t.id_a AS VARCHAR),
           CAST(t.id_b AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM ({_OR5["negative_pairs"]}) t
    UNION ALL
    SELECT 'dsir_weights', CAST(t.doc_id AS VARCHAR),
           CAST(NULL AS VARCHAR), t.n_grams, t.dsir_logw
    FROM ({_OR5["dsir_weights"]}) t
    UNION ALL
    SELECT 'duplicate_spans', CAST(t.id_a AS VARCHAR),
           CAST(t.id_b AS VARCHAR) || '|' || CAST(t.a_start AS VARCHAR)
             || '|' || CAST(t.b_start AS VARCHAR),
           t.n_tokens, CAST(NULL AS DOUBLE)
    FROM ({_OR5["duplicate_spans"]}) t
    UNION ALL
    SELECT 'hybrid_search_rrf', CAST(t.doc_id AS VARCHAR),
           CAST(NULL AS VARCHAR), t.rank, t.rrf_score
    FROM ({_OR5["hybrid_search_rrf"]}) t
    UNION ALL
    SELECT 'curation_pipeline', CAST(t.doc_id AS VARCHAR), t.reason,
           CAST(CAST(t.keep AS INTEGER) AS BIGINT), CAST(NULL AS DOUBLE)
    FROM ({_OR5["curation_pipeline"]}) t
    UNION ALL
    SELECT 'span_dedup_apply', CAST(t.doc_id AS VARCHAR),
           t.cleaned_hash || '|' || CAST(t.n_tokens_before AS VARCHAR),
           t.n_tokens_after, CAST(NULL AS DOUBLE)
    FROM ({_OR5["span_dedup_apply"]}) t
    UNION ALL
    SELECT 'mixture_plan', t.lang, CAST(t.n_docs AS VARCHAR),
           t.n_tokens, t.expected_tokens
    FROM ({_OR5["mixture_plan"]}) t
    UNION ALL
    SELECT 'corpus_drift', m.k1, CAST(NULL AS VARCHAR),
           t.n_buckets_hit, m.value
    FROM ({_OR5["corpus_drift"]}) t,
         LATERAL (VALUES ('kl_target_rest', t.kl_target_rest),
                         ('kl_rest_target', t.kl_rest_target),
                         ('tvd', t.tvd)) AS m(k1, value)
    UNION ALL
    SELECT 'chunk_dedup_stats', CAST(t.n_distinct AS VARCHAR),
           CAST(t.max_copies AS VARCHAR), t.n_chunks, t.dup_chunk_fraction
    FROM ({_OR5["chunk_dedup_stats"]}) t
    UNION ALL
    SELECT 'label_outliers', CAST(t.vec_id AS VARCHAR),
           CAST(t.label AS VARCHAR), t.rank, t.cos_to_centroid
    FROM ({_OR5["label_outliers"]}) t
"""


@query("suite_round5", oracle=_SUITE_R5_SQL)
def suite_round5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 addition suite, one order-insensitive union hash: domain
    caps, trigram familiarity, leakage-safe splits, PQ/ADC + re-rank,
    windowed quantiles, day-over-day deltas, dedup apply, Holt
    smoothing, triangle decimation, time-range trailing means, state
    durations, and cross-series correlation — every new operator
    family driver-attested in one registry slot while the singletons
    rotate below the cap."""
    from .timeseries_q import (
        day_over_day_delta,
        decimate_lttb,
        holt_linear_final,
        window_percentiles_15m,
    )

    def _ns():
        return F.lit(None).cast("string")

    def _nl():
        return F.lit(None).cast("long")

    def _nd():
        return F.lit(None).cast("double")

    cap = source_cap_docs(spark, sf_dir).select(
        F.lit("source_cap_docs").alias("sub"),
        F.col("doc_id").cast("string").alias("k1"),
        F.col("source").alias("k2"),
        _nl().alias("n"),
        _nd().alias("value"),
    )
    tf = trigram_familiarity_q(spark, sf_dir).select(
        F.lit("trigram_familiarity").alias("sub"),
        F.col("doc_id").cast("string").alias("k1"),
        _ns().alias("k2"),
        F.col("n_tri").alias("n"),
        F.col("familiarity").alias("value"),
    )
    sl = split_leakage_guard(spark, sf_dir).select(
        F.lit("split_leakage_guard").alias("sub"),
        F.col("split").alias("k1"),
        _ns().alias("k2"),
        F.col("n_docs").alias("n"),
        F.col("n_leaky_clusters").cast("double").alias("value"),
    )
    pq = embedding_pq_topk(spark, sf_dir).select(
        F.lit("embedding_pq_topk").alias("sub"),
        F.col("query_id").cast("string").alias("k1"),
        F.col("neighbor_id").cast("string").alias("k2"),
        F.col("rank").alias("n"),
        F.col("score").alias("value"),
    )
    pr = embedding_pq_rerank(spark, sf_dir).select(
        F.lit("embedding_pq_rerank").alias("sub"),
        F.col("query_id").cast("string").alias("k1"),
        F.col("neighbor_id").cast("string").alias("k2"),
        F.col("rank").alias("n"),
        F.col("cos_sim").alias("value"),
    )
    wp_src = window_percentiles_15m(spark, sf_dir)
    wp = wp_src.unpivot(
        ["event_type", "window_start", "n"], ["p50", "p95"], "m", "value"
    ).select(
        F.lit("window_percentiles_15m").alias("sub"),
        F.col("event_type").alias("k1"),
        F.concat(
            F.unix_micros("window_start").cast("string"), F.lit("|"), F.col("m")
        ).alias("k2"),
        F.col("n"),
        F.col("value"),
    )
    dod_src = day_over_day_delta(spark, sf_dir).select(
        "bucket",
        "event_type",
        F.col("avg_value").alias("cur"),
        F.col("avg_value_prev_day").alias("prev"),
        F.col("dod_delta").alias("delta"),
    )
    dod = dod_src.unpivot(
        ["event_type", "bucket"], ["cur", "prev", "delta"], "m", "value"
    ).select(
        F.lit("day_over_day_delta").alias("sub"),
        F.col("event_type").alias("k1"),
        F.concat(
            F.unix_micros("bucket").cast("string"), F.lit("|"), F.col("m")
        ).alias("k2"),
        _nl().alias("n"),
        F.col("value"),
    )
    da = dedup_apply(spark, sf_dir).select(
        F.lit("dedup_apply").alias("sub"),
        F.col("sub").alias("k1"),
        _ns().alias("k2"),
        F.col("n"),
        _nd().alias("value"),
    )
    hw = holt_linear_final(spark, sf_dir).unpivot(
        ["event_type", "n"], ["level", "trend", "forecast_next"], "k2", "value"
    ).select(
        F.lit("holt_linear_final").alias("sub"),
        F.col("event_type").alias("k1"),
        F.col("k2"),
        F.col("n"),
        F.col("value"),
    )
    lt = decimate_lttb(spark, sf_dir).select(
        F.lit("decimate_lttb").alias("sub"),
        F.col("event_type").alias("k1"),
        F.concat(
            F.col("bucket").cast("string"),
            F.lit("|"),
            F.unix_micros("ts").cast("string"),
        ).alias("k2"),
        _nl().alias("n"),
        F.col("value").cast("double").alias("value"),
    )
    from .timeseries_q import (
        series_correlation,
        state_duration,
        trailing_1h_mean,
    )

    tm = trailing_1h_mean(spark, sf_dir).select(
        F.lit("trailing_1h_mean").alias("sub"),
        F.col("event_type").alias("k1"),
        F.unix_micros("ts").cast("string").alias("k2"),
        _nl().alias("n"),
        F.col("trailing_mean_1h").alias("value"),
    )
    sd = state_duration(spark, sf_dir).select(
        F.lit("state_duration").alias("sub"),
        F.col("event_type").alias("k1"),
        F.col("event_id").cast("string").alias("k2"),
        F.col("state_duration_s").alias("n"),
        F.col("high").cast("int").cast("double").alias("value"),
    )
    sc = series_correlation(spark, sf_dir).select(
        F.lit("series_correlation").alias("sub"),
        _ns().alias("k1"),
        F.lit("pearson_r").alias("k2"),
        F.col("n"),
        F.col("pearson_r").alias("value"),
    )
    dq = dq_lineitem(spark, sf_dir).select(
        F.lit("dq_lineitem").alias("sub"),
        F.col("constraint_name").alias("k1"),
        _ns().alias("k2"),
        F.col("n_violations").alias("n"),
        _nd().alias("value"),
    )
    ps = pack_sequences_q(spark, sf_dir).select(
        F.lit("pack_sequences").alias("sub"),
        F.col("doc_id").cast("string").alias("k1"),
        F.concat_ws(
            "|",
            F.col("seq_first").cast("string"),
            F.col("seq_last").cast("string"),
            F.col("n_boundary_splits").cast("string"),
        ).alias("k2"),
        F.col("token_offset").alias("n"),
        F.col("n_tokens").cast("double").alias("value"),
    )
    np_ = negative_pairs_q(spark, sf_dir).select(
        F.lit("negative_pairs").alias("sub"),
        F.col("id_a").cast("string").alias("k1"),
        F.col("id_b").cast("string").alias("k2"),
        _nl().alias("n"),
        _nd().alias("value"),
    )
    dw = dsir_weights(spark, sf_dir).select(
        F.lit("dsir_weights").alias("sub"),
        F.col("doc_id").cast("string").alias("k1"),
        _ns().alias("k2"),
        F.col("n_grams").alias("n"),
        F.col("dsir_logw").alias("value"),
    )
    sp = duplicate_spans_q(spark, sf_dir).select(
        F.lit("duplicate_spans").alias("sub"),
        F.col("id_a").cast("string").alias("k1"),
        F.concat_ws(
            "|",
            F.col("id_b").cast("string"),
            F.col("a_start").cast("string"),
            F.col("b_start").cast("string"),
        ).alias("k2"),
        F.col("n_tokens").alias("n"),
        _nd().alias("value"),
    )
    hy = hybrid_search_rrf(spark, sf_dir).select(
        F.lit("hybrid_search_rrf").alias("sub"),
        F.col("doc_id").cast("string").alias("k1"),
        _ns().alias("k2"),
        F.col("rank").alias("n"),
        F.col("rrf_score").alias("value"),
    )
    cp = curation_pipeline(spark, sf_dir).select(
        F.lit("curation_pipeline").alias("sub"),
        F.col("doc_id").cast("string").alias("k1"),
        F.col("reason").alias("k2"),
        F.col("keep").cast("int").cast("long").alias("n"),
        _nd().alias("value"),
    )
    sa = span_dedup_apply(spark, sf_dir).select(
        F.lit("span_dedup_apply").alias("sub"),
        F.col("doc_id").cast("string").alias("k1"),
        F.concat_ws(
            "|", F.col("cleaned_hash"), F.col("n_tokens_before").cast("string")
        ).alias("k2"),
        F.col("n_tokens_after").alias("n"),
        _nd().alias("value"),
    )
    # weight/sample_rate stay out of the suite key: double→string
    # rendering is engine-specific (the singleton's typed parity check
    # covers them; expected_tokens pins the same arithmetic here)
    mx = mixture_plan_q(spark, sf_dir).select(
        F.lit("mixture_plan").alias("sub"),
        F.col("lang").alias("k1"),
        F.col("n_docs").cast("string").alias("k2"),
        F.col("n_tokens").alias("n"),
        F.col("expected_tokens").alias("value"),
    )
    cd = corpus_drift(spark, sf_dir).unpivot(
        ["n_buckets_hit"],
        ["kl_target_rest", "kl_rest_target", "tvd"],
        "k1",
        "value",
    ).select(
        F.lit("corpus_drift").alias("sub"),
        F.col("k1"),
        _ns().alias("k2"),
        F.col("n_buckets_hit").alias("n"),
        F.col("value"),
    )
    cs = chunk_dedup_stats(spark, sf_dir).select(
        F.lit("chunk_dedup_stats").alias("sub"),
        F.col("n_distinct").cast("string").alias("k1"),
        F.col("max_copies").cast("string").alias("k2"),
        F.col("n_chunks").alias("n"),
        F.col("dup_chunk_fraction").alias("value"),
    )
    lo = label_outliers(spark, sf_dir).select(
        F.lit("label_outliers").alias("sub"),
        F.col("vec_id").cast("string").alias("k1"),
        F.col("label").cast("string").alias("k2"),
        F.col("rank").alias("n"),
        F.col("cos_to_centroid").alias("value"),
    )
    out = cap
    for part in (
        tf, sl, pq, pr, wp, dod, da, hw, lt, tm, sd, sc, dq, ps, np_,
        dw, sp, hy, cp, sa, mx, cd, cs, lo,
    ):
        out = out.unionByName(part)
    return out
