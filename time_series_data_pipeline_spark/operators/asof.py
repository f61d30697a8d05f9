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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: adds ``{prefix}{ts_col}`` and ``{prefix}{v}`` for
    each right value column; NULL when no right row matches.

    ``direction`` (the pandas ``merge_asof`` surface):
    - ``backward`` (default): latest right row with right.ts <= left.ts;
    - ``forward``: earliest right row with right.ts >= left.ts
      (the mirror-image window: first(ignorenulls) over
      CURRENT..UNBOUNDED FOLLOWING, right rows ordered after left at
      equal ts so >= still matches);
    - ``nearest``: whichever of the two is closer in time, ties to the
      backward match. All three are the SAME single shuffle; nearest
      adds a second within-partition sort, never a second exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    value_cols = value_cols or [c for c in right.columns if c not in (*by, ts_col)]

    # the carried payload is ONE struct so the matched right row is
    # atomic — carrying columns independently would let rows with
    # interleaved NULL values blend fields from different right rows
    payload = F.struct(
        F.col(ts_col).alias(ts_col), *[F.col(c).alias(c) for c in value_cols]
    )
    payload_type = right.select(payload.alias("p")).schema["p"].dataType

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__asof"),
    )
    rhs = right.select(
        *[
            F.col(c) if c in (*by, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__side"),
        payload.alias("__asof"),
    )

    unioned = lhs.unionByName(rhs)
    # Backward tiebreak order: right rows (side=0) before left rows at
    # equal ts so ts >= semantics hold; among duplicate right timestamps
    # the greatest payload wins deterministically (struct ordering is
    # lexicographic). Forward mirrors it: side DESC puts right rows
    # after left at equal ts (inside the FOLLOWING frame), payload DESC
    # keeps the same greatest-payload tie rule.
    if direction in ("backward", "nearest"):
        wb = (
            Window.partitionBy(*by)
            .orderBy(F.col(ts_col), F.col("__side"), F.col("__asof"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        unioned = unioned.withColumn(
            "__bwd", F.last("__asof", ignorenulls=True).over(wb)
        )
    if direction in ("forward", "nearest"):
        # REVERSED order + RUNNING frame instead of first(...) over
        # [current, unboundedFollowing]: the following-frame evaluator
        # re-scans to the partition end for every row (O(n²) per
        # partition); last(...) over the exact reverse sort — each key's
        # direction flipped, so the frame holds the identical row set —
        # is incremental. Rows tied on the full sort key carry equal
        # __asof (it IS a sort key), so tie order cannot change the
        # picked value.
        wf = (
            Window.partitionBy(*by)
            .orderBy(
                F.col(ts_col).desc(), F.col("__side"), F.col("__asof")
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        unioned = unioned.withColumn(
            "__fwd", F.last("__asof", ignorenulls=True).over(wf)
        )
    if direction == "backward":
        picked = F.col("__bwd")
    elif direction == "forward":
        picked = F.col("__fwd")
    else:
        bwd, fwd = F.col("__bwd"), F.col("__fwd")
        lts = F.unix_micros(F.col(ts_col))
        picked = (
            F.when(bwd.isNull(), fwd)
            .when(fwd.isNull(), bwd)
            .when(
                F.unix_micros(fwd[ts_col]) - lts < lts - F.unix_micros(bwd[ts_col]),
                fwd,
            )
            .otherwise(bwd)  # ties -> backward (pandas nearest rule)
        )
    return (
        unioned.withColumn("__pick", picked)
        .filter(F.col("__side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            F.col(f"__pick.{ts_col}").alias(f"{prefix}{ts_col}"),
            *[F.col(f"__pick.{c}").alias(f"{prefix}{c}") for c in value_cols],
        )
    )
