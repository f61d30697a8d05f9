"""Deterministic sampling & splitting — training-data pipeline staples.

Everything here is HASH-based, not PRNG-based: membership of a row
depends only on (key, salt), so samples are reproducible across runs,
engines, cluster sizes, and partitionings — the property a training
pipeline needs for auditable dataset construction (a seeded
``df.sample`` changes with partitioning; a hash never does). md5 is
used (not xxhash64) so any engine can replay the exact selection.

Scale: all operators are narrow (a filter / a projected assignment) —
zero shuffle; the hash costs ~100 ns/row inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Buckets per key: md5's first 15 hex chars (60 bits) mod 1e6 — fine
#: granularity (1e-6 fractions) with negligible modulo bias.
BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, 1e6) from the key's salted md5."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % BUCKETS


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — same keys kept
    on every run and every engine."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(fraction * BUCKETS))


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float], salt: str = ""
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones). Strata absent from ``fractions``
    are dropped."""
    # Integer cutoffs are precomputed in Python (like deterministic_sample)
    # rather than as (frac * BUCKETS).cast('long') in the plan: the cast
    # TRUNCATES while other engines' CAST rounds, so an inexact double
    # product (0.15 * 1e6 = 149999.99999999997) would disagree by one
    # bucket across engines. Half-AWAY-FROM-ZERO (+0.5 then truncate),
    # not Python round()'s half-to-even: the documented oracle CAST
    # semantics round .5 up, and the two differ at exact-.5 products.
    cutoff = F.create_map(
        *[
            F.lit(x)
            for stratum, frac in fractions.items()
            for x in (stratum, int(frac * BUCKETS + 0.5))
        ]
    )[F.col(strata_col)]
    return df.filter(
        cutoff.isNotNull() & (hash_bucket(F.col(key_col), salt) < cutoff)
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.05,
    test_fraction: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ∈ {train, val, test} by key hash —
    disjoint, exhaustive, and stable under data growth: a key's split
    never changes when other rows are added (no leakage across
    retrains)."""
    b = hash_bucket(F.col(key_col), salt)
    val_hi = int(val_fraction * BUCKETS)
    test_hi = val_hi + int(test_fraction * BUCKETS)
    split = (
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group cap — the "domain cap" of web-corpus
    pipelines (RefinedWeb/C4 keep at most N pages per domain so one
    giant site cannot dominate the training mixture): keep the ``cap``
    rows per group with the smallest salted-md5 rank (ties by key), a
    stable uniform-without-replacement draw per group.

    Skew-safe two-phase shape: phase 1 shuffles on (group, input
    partition id) and pre-caps each fragment — a billion-row domain is
    spread over many reducers and at most ``cap × n_partitions`` of its
    rows survive; phase 2 ranks only the survivors per group. The kept
    SET is independent of the partitioning (the global top-``cap`` by
    hash order is a subset of every fragment union), so results are
    reproducible anywhere even though partition ids are not."""
    from pyspark.sql import Window

    b = hash_bucket(F.col(key_col), salt)
    pre_w = Window.partitionBy(group_col, "__pid").orderBy(
        b.asc(), F.col(key_col).asc()
    )
    survivors = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__pr", F.row_number().over(pre_w))
        .filter(F.col("__pr") <= cap)
        .drop("__pid", "__pr")
    )
    w = Window.partitionBy(group_col).orderBy(b.asc(), F.col(key_col).asc())
    return (
        survivors.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= cap)
        .drop("__r")
    )


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
    round_to: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES, public algorithm): each row gets priority
    ``ln(u) / w`` — the log-space equivalent of ``u^(1/w)`` — with the
    uniform ``u`` derived from the key's salted md5 instead of a PRNG,
    so the SAME k rows are selected on every run, engine, and
    partitioning (auditable training-data mixtures). Heavier rows draw
    systematically higher priorities; the selection is a single global
    top-k (per-partition heaps, no sort).

    Priorities are rounded before ranking so the k-boundary resolves
    identically across engines (libm ln drift ~1 ulp ≪ the rounding
    quantum); ties break by key."""
    u = (hash_bucket(F.col(key_col), salt).cast("double") + F.lit(0.5)) / F.lit(
        float(BUCKETS)
    )
    priority = F.round(
        F.log(u) / F.col(weight_col).cast("double"), round_to
    )
    out = (
        df.withColumn("priority", priority)
        .filter(F.col(weight_col) > 0)
        .orderBy(F.col("priority").desc(), F.col(key_col))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("priority").desc(), F.col(key_col))
    return out.withColumn("rank", F.row_number().over(w).cast("long"))


def negative_pairs(
    df: DataFrame,
    positives: DataFrame,
    n: int,
    id_col: str = "doc_id",
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative-pair sampling — the counterpart of a
    near-dup pair list for contrastive/embedding training: ``n``
    pseudo-random document pairs that are NOT in the positive
    (near-dup) list. Two independently salted md5 rankings are zipped
    by rank (a reproducible random pairing with no cross join), pairs
    are canonicalized (low id first), and known positives are removed
    with an anti-join. Self-pairs and the removed positives make the
    output ≤ n — by design (callers oversample ``n`` slightly rather
    than pay an iterative top-up).

    Shapes: two global top-n rankings (TakeOrderedAndProject heaps), a
    rank equi-join, and a broadcast-able anti-join against the pair
    list — no shuffle touches the corpus body."""
    from pyspark.sql import Window

    def ranked(tag: str, out: str) -> DataFrame:
        w = Window.orderBy(
            hash_bucket(F.col(id_col), salt + tag).asc(), F.col(id_col).asc()
        )
        return (
            df.select(F.col(id_col))
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n)
            .select("__r", F.col(id_col).alias(out))
        )

    cand = (
        ranked("a", "__a")
        .join(ranked("b", "__b"), "__r")
        .filter(F.col("__a") != F.col("__b"))
        .select(
            F.least("__a", "__b").alias("id_a"),
            F.greatest("__a", "__b").alias("id_b"),
        )
        .distinct()
    )
    pos = positives.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    ).distinct()
    return cand.join(pos, ["id_a", "id_b"], "left_anti")
