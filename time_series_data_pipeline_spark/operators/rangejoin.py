"""Range (interval) join — the time-series enrichment op the reference
lacks (SURVEY.md §2.9 X6; Flux has no join at all, so this is extension
tier alongside the as-of join).

A naive conditional join `l.ts - delta <= r.ts < l.ts` compiles to a
broadcast-nested-loop (O(|L|·|R|) per key) — unusable at scale. The
scalable shape is the classic BINNED range join: quantize time into
bins of width >= the range span, equi-join on (keys..., bin), then
apply the exact predicate. Each left row probes at most
ceil(span/bin)+1 bins, so the join is a hash shuffle on
(keys, bin) with bounded fan-out — the same plan Spark's own
storage-partitioned range-join optimizations target, expressed with
built-ins only.

Scale: shuffle volume is |L|·(n_bins_probed) + |R| skinny rows; skewed
keys are handled by AQE skew-join splitting since this is an ordinary
hash join after binning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = 600,
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join rows of ``right`` whose timestamp falls in the
    half-open window ``[left.ts - lower_seconds, left.ts)`` for the same
    ``by`` keys. Right's non-key columns come back ``right_prefix``-ed.

    Bin width = ``lower_seconds`` so each left row probes exactly two
    bins (window start's and end's); a right row lands in one bin.
    """
    span = lower_seconds
    l_bin_lo = F.floor((F.unix_micros(F.col(left_ts)) / 1_000_000 - span) / span)
    l_bin_hi = F.floor(F.unix_micros(F.col(left_ts)) / 1_000_000 / span)

    l = left.withColumn(
        "__bin", F.explode(F.array_distinct(F.array(l_bin_lo, l_bin_hi)))
    )
    r_cols = [
        F.col(c).alias(c if c in by else f"{right_prefix}{c}")
        for c in right.columns
    ]
    r = right.select(*r_cols).withColumn(
        "__bin",
        F.floor(
            F.unix_micros(F.col(f"{right_prefix}{right_ts}")) / 1_000_000 / span
        ),
    )
    rts = F.col(f"{right_prefix}{right_ts}")
    exact = (rts >= F.col(left_ts) - F.expr(f"INTERVAL {span} SECONDS")) & (
        rts < F.col(left_ts)
    )
    return l.join(r, on=[*by, "__bin"]).filter(exact).drop("__bin")
