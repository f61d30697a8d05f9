"""Skew-handling operators — the 100 TB patterns for hot keys.

AQE (enabled in session.py) already splits skewed JOIN partitions at
runtime; these operators cover the cases AQE cannot:

- ``salted_join``: explicit salting for a skewed equi-join where the
  build side is too big to broadcast and the runtime can't re-plan
  (e.g. inside foreachBatch, or a deliberately pinned plan shape).
- ``two_phase_count_distinct``: COUNT(DISTINCT) under key skew. A
  single-pass distinct-agg concentrates each hot key's whole value set
  on one task; phase 1 here de-dups on (key, value) — spread over the
  full cluster by the hash of BOTH columns — and phase 2 counts tiny
  (key, partial) rows. This is the classic two-job MapReduce distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted into ``n_salts`` sub-keys and
    the small side replicated once per salt, so a hot key's rows land on
    ``n_salts`` tasks instead of one.

    The salt is a row-spreader and MUST be deterministic: it feeds the
    shuffle key, and on a stage retry (fetch failure) a recomputed row
    must land in the same salt bucket or join rows are dropped or
    duplicated. We hash the big side's own columns (xxhash64 is a pure
    function of the row), never ``monotonically_increasing_id()`` or
    ``rand()``. Cost model: small side shuffles n_salts times its size;
    use only when small is too big to broadcast AND the key distribution
    is hot enough that one task would otherwise run the whole join tail.

    Only ``inner`` and ``left`` joins are supported: a right/full join
    would emit each unmatched small-side row once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only, got {how!r}: the small side "
            "is replicated per salt, so right/full would duplicate unmatched rows"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).cast("int")
    )
    salted_small = (
        small.withColumn("__s", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
        .withColumn("__salt", F.col("__s").cast("int"))
        .drop("__s")
    )
    return salted_big.join(salted_small, [*on, "__salt"], how).drop("__salt")


def two_phase_count_distinct(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key group, skew-proof.

    Phase 1 (shuffle on keys+value): drop duplicate (key, value) pairs —
    a hot key's values spread across all partitions because the hash
    includes the value. Phase 2 (shuffle on keys): plain COUNT of the
    deduplicated rows, with map-side partial counting.

    NULL values are excluded, matching SQL ``COUNT(DISTINCT value)``
    semantics (a bare ``distinct()`` would keep one NULL row per key).
    """
    return (
        df.select(*keys, value_col)
        .filter(F.col(value_col).isNotNull())
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(f"n_distinct_{value_col}"))
    )
