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

from .text import shingles, tokens


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


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram (3-shingle) Jaccard pairs >= threshold via inverted
    index. jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct shingle sets.

    `block_col` restricts pairs to equal blocking-key (e.g. language).
    `max_df` drops shingles appearing in more than max_df docs — the
    skew/stop-shingle bound; with it unset the result is exact.
    """
    block = [block_col] if block_col else []
    sh = df.select(
        F.col(id_col), *block, shingles(tokens(text_col)).alias("__sh")
    ).withColumn("n_sh", F.size("__sh"))

    inv = sh.select(id_col, *block, "n_sh", F.explode("__sh").alias("s"))
    if max_df is not None:
        keep = inv.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") <= max_df
        )
        inv = inv.join(F.broadcast(keep.select("s")), "s")

    a = inv.select(
        *[F.col(c).alias(f"{c}_a") for c in (id_col, "n_sh")],
        *[F.col(c) for c in block],
        "s",
    )
    b = inv.select(
        *[F.col(c).alias(f"{c}_b") for c in (id_col, "n_sh")],
        *[F.col(c) for c in block],
        "s",
    )
    inter = (
        a.join(b, on=["s", *block])
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .groupBy(f"{id_col}_a", f"{id_col}_b", "n_sh_a", "n_sh_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_inter")
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col(f"{id_col}_a").alias("id_a"),
            F.col(f"{id_col}_b").alias("id_b"),
            "jaccard",
        )
    )


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """k-permutation MinHash over 3-shingles: h_i(doc) = min over
    shingles of xxhash64(i-salt ++ shingle). Adds `mh` array<long>."""
    sh = shingles(tokens(text_col))
    mins = F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(F.lit(i), s)))
            for i in range(n_hashes)
        ]
    )
    return df.select(F.col(id_col), mins.alias("mh"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 64,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash LSH near-dup: band the signature (rows = n_hashes/bands),
    bucket-join on (band, banded rows), estimate jaccard from signature
    agreement, keep pairs >= threshold.

    With r=2, b=32 the candidate-recall at j=0.5 is 1-(1-j²)^32 ≈ 0.9999.
    Estimated jaccard (fraction of agreeing hashes) is reported — the
    unbiased MinHash estimator; exact verification belongs to
    `jaccard_pairs` (kept separate so the oracle comparison stays exact).
    """
    rows = n_hashes // bands
    sig = minhash_signatures(df, n_hashes, text_col, id_col)
    banded = sig.select(
        id_col,
        "mh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_", *[F.col("mh")[b * rows + r].cast("string") for r in range(rows)]
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "mh", "bk.band", "bk.key")

    a = banded.select(
        "band", "key", F.col(id_col).alias("id_a"), F.col("mh").alias("mh_a")
    )
    b = banded.select(
        "band", "key", F.col(id_col).alias("id_b"), F.col("mh").alias("mh_b")
    )
    cand = (
        a.join(b, on=["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    est = agree.cast("double") / F.lit(float(n_hashes))
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over tokens: bit b of the print is the sign of
    Σ_tokens (±1 depending on bit b of xxhash64(token)).

    Implemented as explode → 64 conditional sums → one hash aggregation
    (single shuffle of (id, 64 ints)); bit packing is a JVM-side fold.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("t")).withColumn(
        "h", F.xxhash64("t")
    )
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
) -> DataFrame:
    """SimHash near-dup: candidates share ≥1 of `bands` 16-bit bands
    (pigeonhole guarantees recall for hamming < bands), verified by
    exact popcount of the XOR."""
    width = 64 // bands
    sh = simhash64(df, text_col, id_col)
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
