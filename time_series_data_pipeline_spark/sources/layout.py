"""Z-order (Morton) data layout for multi-dimensional row-group
pruning.

The bucket contract (`sources/bucket.py`) prunes on ONE dimension per
level: directories by (measurement, date), row groups by the in-file
(_field, _time) sort. A query that is selective on TWO independent
columns — "this user, this hour" — gets pruning on whichever column
leads the sort and a full scan across the other. Z-ordering interleaves
the bits of both columns into one sort key, so rows close in the
2-D (user, time) box land in the same row groups and BOTH predicates
prune: the technique Delta/Iceberg expose as `OPTIMIZE ZORDER BY` /
`sort_order(z)` (public Morton-curve layout, e.g. Morton 1966).

Everything here is plain Catalyst arithmetic — min/max scaling to
2^bits buckets (the histogram binning), then bit interleaving as a
fixed sum of shifts — so the z-value computation is codegen'd,
shuffle-free, and the layout write is one repartitionByRange(z) +
sortWithinPartitions(z), exactly the cost of any global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column to an integer bucket in [0, 2^bits)."""
    n = 1 << bits
    return (
        F.when(hi == lo, F.lit(0))
        .otherwise(
            F.least(
                F.lit(n - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (col.cast("double") - lo) / (hi - lo) * F.lit(n)
                    ).cast("int"),
                ),
            )
        )
        .cast("long")
    )


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two bucket ids into one
    Morton code (x in even positions, y in odd): a fixed sum of
    2*bits shift/mask terms, fully inside whole-stage codegen."""
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b))
        terms.append(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_layout(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 16,
    n_files: int = 8,
) -> DataFrame:
    """Return ``df`` re-arranged on the Morton curve of (col_x, col_y):
    repartitionByRange + sortWithinPartitions on the z-value, ready for
    a parquet write whose row-group (min, max) stats are tight on BOTH
    columns. Timestamp columns are handled via unix_micros.

    The min/max scaling bounds come from one 1-row aggregate over the
    input (broadcast back) — the same two-pass shape as `histogram`.
    """

    def numeric(c: str) -> Column:
        dt = dict(df.dtypes)[c]
        if dt.startswith("timestamp"):
            return F.unix_micros(F.col(c))
        return F.col(c)

    xs, ys = numeric(col_x), numeric(col_y)
    stats = df.agg(
        F.min(xs.cast("double")).alias("__xlo"),
        F.max(xs.cast("double")).alias("__xhi"),
        F.min(ys.cast("double")).alias("__ylo"),
        F.max(ys.cast("double")).alias("__yhi"),
    )
    z = zvalue(
        _scaled(xs, F.col("__xlo"), F.col("__xhi"), bits),
        _scaled(ys, F.col("__ylo"), F.col("__yhi"), bits),
        bits,
    )
    # __z is dropped too: the row order established by
    # sortWithinPartitions survives the drop projection, and the caller
    # gets back exactly the input schema — writing the frame must not
    # leak a synthetic column into the table.
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__xlo", "__xhi", "__ylo", "__yhi", "__z")
    )
