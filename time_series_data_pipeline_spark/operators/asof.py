"""As-of join (SURVEY.md §2.9 X6): for each left row, the most recent
right row with right.ts <= left.ts within the same partition key.

Spark-first design — the classic "union + last(ignorenulls) window"
rewrite rather than a per-key loop or a pandas merge_asof:

  1. Tag both inputs and union them (left side=1, right side=0).
  2. One window per key ordered by (ts, side): `last(right_col,
     ignorenulls=True)` over rows UNBOUNDED PRECEDING..CURRENT carries
     the latest right value forward. side=0 sorts before side=1 at
     equal ts, so a right row at exactly left.ts is visible (>= match).
  3. Keep only left rows.

Scale (100 TB): this is ONE shuffle on the key (same cost as any
groupBy) followed by a within-partition sort — no range explosion, no
cross product, skew bounded by per-key row counts. A pandas
``merge_asof`` per group would ship every group through Python; this
stays entirely in Tungsten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: adds ``{prefix}{ts_col}`` and ``{prefix}{v}`` for
    each right value column; NULL when no right row precedes."""
    value_cols = value_cols or [c for c in right.columns if c not in (*by, ts_col)]

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias(f"{prefix}{ts_col}"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )
    rhs = right.select(
        *[
            F.col(c) if c in (*by, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__side"),
        F.col(ts_col).alias(f"{prefix}{ts_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
    )

    unioned = lhs.unionByName(rhs)
    # Tiebreak order: right rows (side=0) before left rows at equal ts so
    # ts >= semantics hold; among duplicate right timestamps the greatest
    # value wins deterministically (value cols appended to the sort).
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col(ts_col),
            F.col("__side"),
            *[F.col(f"{prefix}{c}") for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{prefix}{ts_col}"] + [f"{prefix}{c}" for c in value_cols]
    for c in carried:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.filter(F.col("__side") == 1).drop("__side")
