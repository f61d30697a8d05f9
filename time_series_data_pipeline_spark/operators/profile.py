"""Table profiling: per-column null counts / distinct counts / min / max
in one pass.

A curation pipeline's first query against a new 100 TB drop is always a
profile — how many nulls, what ranges, how many distinct keys — and the
naive way (one query per column) scans the table C times. This operator
computes every column's stats in ONE scan: a single aggregate row
carrying (count, count-distinct, min, max) per column, then `inline`
pivots that row into long form (one output row per column). The multi
count-distinct plans through Spark's Expand (each row replicated once
per distinct-aggregate) — a single shuffle whose width is the column
count, which is the standard engine strategy and stays linear at scale.

Determinism: counts are exact integers; min/max are rendered as strings
through type-pinned casts (numeric → DECIMAL(18,2) → VARCHAR, temporal
→ DATE → VARCHAR) so both engines format identically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fmt(c: Column, kind: str) -> Column:
    """Render an already-aggregated min/max on its native type as a
    deterministic string (the aggregate itself runs on the native type —
    formatting first would turn min/max lexicographic)."""
    if kind == "numeric":
        return c.cast("decimal(18,2)").cast("string")
    if kind == "temporal":
        return c.cast("date").cast("string")
    return c.cast("string")


def _fmt_sql(expr: str, kind: str) -> str:
    if kind == "numeric":
        return f"CAST(CAST({expr} AS DECIMAL(18,2)) AS VARCHAR)"
    if kind == "temporal":
        return f"CAST(CAST({expr} AS DATE) AS VARCHAR)"
    return f"CAST({expr} AS VARCHAR)"


def profile_columns(
    df: DataFrame,
    numeric: Sequence[str] = (),
    string: Sequence[str] = (),
    temporal: Sequence[str] = (),
) -> DataFrame:
    """One-scan column profile → (col_name, n_nulls, n_distinct, min_v,
    max_v), one row per profiled column."""
    cols = [(c, "numeric") for c in numeric]
    cols += [(c, "string") for c in string]
    cols += [(c, "temporal") for c in temporal]
    aggs = [F.count("*").alias("__total")]
    for c, kind in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            _fmt(F.min(F.col(c)), kind).alias(f"__min_{c}"),
            _fmt(F.max(F.col(c)), kind).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                (F.col("__total") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_v"),
                F.col(f"__max_{c}").alias("max_v"),
            )
            for c, _ in cols
        ]
    )
    return row.select(F.inline(entries))


def profile_oracle_sql(
    table: str,
    numeric: Sequence[str] = (),
    string: Sequence[str] = (),
    temporal: Sequence[str] = (),
) -> str:
    cols = [(c, "numeric") for c in numeric]
    cols += [(c, "string") for c in string]
    cols += [(c, "temporal") for c in temporal]
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               {_fmt_sql(f"MIN({c})", kind)} AS min_v,
               {_fmt_sql(f"MAX({c})", kind)} AS max_v
        FROM {table}"""
        for c, kind in cols
    ]
    return " UNION ALL ".join(parts)
