"""Deduplication operators (SURVEY.md §2.9 X1/X2): exact, content-hash,
n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:
- Exact dedup groups on a 256-bit content hash, never on the raw text —
  the shuffle moves 32-byte keys, not documents.
- Jaccard pair generation uses an inverted index (explode shingles →
  self equi-join on shingle) — work is Σ df(shingle)², never n². Hot
  shingles (stopword runs) are the skew risk; `max_df` drops shingles
  whose document frequency exceeds a cap, the standard bound.
- MinHash compresses each doc's shingle set to k 64-bit mins; LSH bands
  turn near-dup search into an equi-join on (band, banded-signature).
- All hashing is xxhash64 (JVM built-in) except where an oracle needs
  cross-engine md5.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._util import pin as _pin
from .text import shingle_hashes, shingles, tokens


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: keeper = min id, n_copies, md5 id.

    Grouping key is the md5 of the content (32-byte shuffle key) — at
    100 TB the raw text never moves, only (hash, id) pairs.
    """
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_keep_first(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The deduplicated corpus: deterministic dropDuplicates — keeps the
    min-id row per content hash (dropDuplicates() itself keeps an
    arbitrary row; row_number makes the choice reproducible)."""
    w = Window.partitionBy(F.sha2(F.col(text_col).cast("binary"), 256)).orderBy(F.col(id_col))
    return (
        df.withColumn("content_sha256", F.sha2(F.col(text_col).cast("binary"), 256))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def build_shingle_store(
    df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Materialize (id, shingle-hash set, set size) once per corpus
    version. Every dedup query re-derives the shingle pipeline from raw
    text — its dominant cold cost; a corpus processed by jaccard +
    minhash + simhash + repeated runs pays it once via this store
    (the moral equivalent of an inverted-index build)."""
    from .text import spread_small_scan

    (
        spread_small_scan(df)
        .select(
            F.col(id_col), shingle_hashes(tokens(text_col)).alias("__sh")
        )
        .withColumn("n_sh", F.size("__sh"))
        .write.mode("overwrite")
        .parquet(path)
    )


def load_shingle_store(spark, path: str) -> DataFrame:
    # published stores are immutable → relation reuse is sound
    from ._util import load_store

    return load_store(spark, path)


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram (3-shingle) Jaccard pairs >= threshold via
    prefix-filtered candidate generation (AllPairs/PPJoin family):

    1. Rank each doc's shingles by (global doc-frequency asc, shingle) —
       a global total order putting RARE shingles first.
    2. Probing prefix = first |X| - ceil(t·|X|) + 1 shingles: any pair
       with jaccard >= t must share a prefix shingle (pigeonhole on the
       ≥ ceil(t·|X|) overlapping elements), so candidate generation
       equi-joins only on prefix postings — hot/stop shingles land in
       suffixes and never generate pairs.
    3. Length filter: jaccard >= t ⇒ min(|A|,|B|) >= t·max(|A|,|B|).
    4. Positional filter (PPJoin): for a shared shingle at ranks (i, j),
       overlap <= min(i,j)-1 + 1 + min(|A|-i, |B|-j); a true pair needs
       overlap >= ceil(t/(1+t)·(|A|+|B|)), and every shared prefix row
       of a true pair satisfies the bound, so per-row filtering is
       lossless while pruning incidental single-shingle collisions.
    5. Verify candidates exactly: |A∩B| via array_intersect on the two
       shingle sets; jaccard = inter / (|A|+|B|-inter).

    Result is EXACT (filters are lossless); at 100 TB the cost is the
    prefix-postings self-join — Σ prefix-df², orders of magnitude below
    the naive Σ df² inverted-index blowup on skewed shingles.
    """
    sh = (
        shingle_sets
        if shingle_sets is not None
        else _pin(
            df.select(
                F.col(id_col), shingle_hashes(tokens(text_col)).alias("__sh")
            ).withColumn("n_sh", F.size("__sh"))
        )
    )
    post = sh.select(id_col, "n_sh", F.explode("__sh").alias("s"))
    dfreq = post.groupBy("s").agg(F.count(F.lit(1)).alias("s_df"))

    w = Window.partitionBy(id_col).orderBy("s_df", "s")
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    prefix = _pin(
        # No broadcast hint on dfreq: |distinct shingles| grows with
        # corpus size, so hard-forcing would break at scale — AQE picks
        # broadcast at runtime whenever dfreq is actually small. Pinned
        # because BOTH sides of the candidate self-join read it; without
        # the pin the dfreq agg + window run twice.
        post.join(dfreq, "s")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= prefix_len)
        .select(id_col, "n_sh", "__rk", "s")
    )

    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_sh_a"),
        F.col("__rk").alias("rk_a"), "s",
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_sh_b"),
        F.col("__rk").alias("rk_b"), "s",
    )
    min_overlap = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("n_sh_a") + F.col("n_sh_b"))
    )
    positional_ub = (
        F.least("rk_a", "rk_b")
        + F.least(F.col("n_sh_a") - F.col("rk_a"), F.col("n_sh_b") - F.col("rk_b"))
    )
    cand = (
        a.join(b, "s")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.least("n_sh_a", "n_sh_b")
                >= F.ceil(F.lit(threshold) * F.greatest("n_sh_a", "n_sh_b"))
            )
            & (positional_ub >= min_overlap)
        )
        .select("id_a", "id_b")
        .distinct()
    )

    sa = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("__sh_a", "__sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("__sh_a") + F.size("__sh_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """k-permutation MinHash over 3-shingles: h_i(doc) = min over
    shingles of xxhash64(i-salt ++ shingle). Returns (id, mh array<long>).

    Shape: fully NARROW — ONE aggregate fold over the materialized
    shingle-hash array, carrying a k-long running-min accumulator: per
    shingle, the k salted hashes are built once and zipped into the
    accumulator with least(). Zero shuffle (the explode +
    groupBy-of-k-MINs alternative shuffles one posting row per
    (doc, shingle) — measured 10× slower at bench scale, and at 100 TB
    it moves billions of rows the narrow form never materializes).
    The previous form ran k separate array_min(transform(...)) passes —
    higher-order expressions are interpreted, so the k per-pass array
    allocations + scans cost ~40% more for the same k·|sh| hashes
    (measured 0.95 s → 0.60 s at sf0.1); the fold's values are
    bit-identical (same hashes, same mins; least() ignores the NULL
    init exactly like array_min over the same set).
    """
    sh = (
        shingle_sets.select(F.col(id_col), F.col("__sh"))
        if shingle_sets is not None
        else df.select(F.col(id_col), shingle_hashes(tokens(text_col)).alias("__sh"))
    )
    init = F.array(*[F.lit(None).cast("long") for _ in range(n_hashes)])

    def _step(acc, s):
        hs = F.array(*[F.xxhash64(F.lit(i), s) for i in range(n_hashes)])
        return F.zip_with(acc, hs, lambda a, h: F.least(a, h))

    mins = F.aggregate("__sh", init, _step)
    # shingle-free docs (< n tokens) carry no signal: their all-NULL
    # signatures would all share the same LSH band keys and generate
    # O(m²) doomed candidate pairs for m empty docs — a real hazard on
    # crawl corpora. Dedup is defined over docs with >= 1 shingle.
    return sh.filter(F.size("__sh") > 0).select(F.col(id_col), mins.alias("mh"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 64,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_sets: DataFrame | None = None,
    exact_verify: bool = False,
) -> DataFrame:
    """MinHash LSH near-dup: band the signature (rows = n_hashes/bands),
    bucket-join on (band, banded rows), then either estimate jaccard
    from signature agreement (default) or — with ``exact_verify`` and a
    shingle store — compute the TRUE jaccard of each candidate pair.

    With r=2, b=32 the candidate-recall at j=0.5 is 1-(1-j²)^32 ≈ 0.9999.
    The estimator form reports the unbiased MinHash estimate; the
    exact-verify form is the standard production shape (cheap banded
    candidate generation + exact set verification) and makes the output
    oracle-comparable against a brute-force jaccard — modulo the
    (per-pair ~1e-4 at j=0.5) LSH miss probability, which is
    deterministic for a fixed corpus and checked in tests.
    """
    rows = n_hashes // bands
    # pinned: the banding sides and the signature join-back all read it
    sig = _pin(minhash_signatures(df, n_hashes, text_col, id_col, shingle_sets))
    # band key = one xxhash64 long over (band id, the band's rows) — an
    # 8-byte join key instead of a concat string, and the bucket
    # self-join carries ONLY (key, id): signatures are attached after
    # candidate dedup, so the shuffle payload stays minimal.
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b), *[F.col("mh")[b * rows + r] for r in range(rows)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("key"),
    )
    a = banded.select(F.col("key"), F.col(id_col).alias("id_a"))
    b = banded.select(F.col("key"), F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, "key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if exact_verify:
        if shingle_sets is None:
            raise ValueError("exact_verify requires shingle_sets")
        xa = shingle_sets.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a"))
        xb = shingle_sets.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b"))
        return (
            cand.join(xa, "id_a")
            .join(xb, "id_b")
            .withColumn("n_inter", F.size(F.array_intersect("__sh_a", "__sh_b")))
            .withColumn(
                "jaccard",
                F.col("n_inter").cast("double")
                / (F.size("__sh_a") + F.size("__sh_b") - F.col("n_inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("mh").alias("mh_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("mh").alias("mh_b"))
    agree = F.size(
        F.filter(
            F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    est = agree.cast("double") / F.lit(float(n_hashes))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash over tokens: bit b of the print is the sign of
    Σ_tokens (±1 depending on bit b of hash(token)).

    Implemented as explode → 64 conditional sums → one hash aggregation
    (single shuffle of (id, 64 ints)); bit packing is a JVM-side fold.

    ``hash_fn``: ``xxhash64`` (production: fastest JVM hash) or ``md5``
    (60-bit prefix via conv — ~3x slower but replayable by any engine,
    the oracle-verification form; bits 60-63 are then constant 0 on
    every document, which is identical on both engines and harmless to
    banding).
    """
    if hash_fn == "xxhash64":
        h = F.xxhash64("t")
    elif hash_fn == "md5":
        h = F.conv(F.substring(F.md5(F.col("t").cast("binary")), 1, 15), 16, 10).cast(
            "long"
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    from .text import spread_small_scan

    # spread first: the explode + per-token hash + 64-way partial
    # aggregation all run BEFORE the groupBy exchange, i.e. inside the
    # scan stage — a one-split corpus serializes them on one core.
    # Output is partition-proof (exact integer sums per doc).
    tok = spread_small_scan(df).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("t")
    ).withColumn("h", h)
    sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(64)
        ]
    )
    packed = functools.reduce(
        operator.add,
        [
            F.when(F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
            for b in range(64)
        ],
    )
    return sums.select(F.col(id_col), packed.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup: candidates share ≥1 of `bands` 16-bit bands
    (pigeonhole guarantees recall for hamming < bands), verified by
    exact popcount of the XOR."""
    width = 64 // bands
    # reused by both join sides
    sh = _pin(simhash64(df, text_col, id_col, hash_fn))
    banded = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.key")
    a = banded.select("band", "key", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = banded.select("band", "key", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_overlap_pairs(
    probe: DataFrame,
    corpus: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Benchmark-decontamination overlap: for every (probe doc, corpus
    doc) pair sharing at least one word ``n``-gram, the count of shared
    DISTINCT n-grams — the standard test-set-contamination check run
    before LLM training (exact n-gram overlap, the GPT-3 appendix-C /
    PaLM methodology, restated as an inverted-index join).

    Shape: explode each side's distinct n-grams, equi-join on the gram
    HASH (never the raw gram text — at 100 TB the shuffle moves 16-byte
    keys, not 50-char strings), then one (probe, corpus) group-count.
    Work is Σ df_probe(g)·df_corpus(g) over shared grams — the probe
    side (a benchmark set) is tiny, so postings stay skew-free; a probe
    gram appearing in half the corpus is itself the contamination signal
    being measured. ``hash_fn='md5'`` (16-hex-char prefix) is
    cross-engine replayable for the oracle; 'xxhash64' is the scale form
    (8-byte longs, same join shape).
    """
    from .text import ngrams, spread_small_scan, tokens

    if hash_fn == "md5":
        def h(c: Column) -> Column:
            return F.substring(F.md5(c), 1, 16)
    elif hash_fn == "xxhash64":
        h = F.xxhash64  # type: ignore[assignment]
    else:
        raise ValueError(f"hash_fn must be md5 or xxhash64, got {hash_fn!r}")

    def grams(df: DataFrame, out_id: str) -> DataFrame:
        g = F.array_distinct(ngrams(tokens(text_col), n))
        return spread_small_scan(df).select(
            F.col(id_col).alias(out_id), F.explode(g).alias("__g")
        ).select(out_id, h(F.col("__g")).alias("__gh"))

    p = grams(probe, "probe_id")
    c = grams(corpus, "corpus_id")
    return (
        p.join(c, "__gh")
        .groupBy("probe_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
