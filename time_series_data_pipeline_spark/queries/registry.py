"""Query registry: the driver-facing surface of the engine.

Each query is registered with a name, a callable ``(spark, sf_dir) ->
DataFrame``, and (when SQL-expressible) an equivalent ANSI-SQL oracle
string for DuckDB. ``__spark_entry__.py`` re-exports these.

Numeric-determinism policy (critical for the driver's value-hash gate):
double-precision SUM/AVG are order-dependent, and Spark/DuckDB will not
sum partitions in the same order. Every aggregate over a double column
therefore casts to DECIMAL first — decimal addition is exact and
associative, so both engines produce bit-identical results — and casts
the final aggregate back to DOUBLE (exact, correctly-rounded in both).
AVG is computed as ``CAST(SUM(decimal) AS DOUBLE) / COUNT`` for the same
reason. The testdata money columns carry ≤2 decimal digits, so a
DECIMAL(18,2) cast loses nothing.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL over the pre-registered
    views (region nation customer supplier part orders lineitem events
    documents embeddings). Omit for non-SQL-expressible ops (driver then
    runs the weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _dec(col: Any, scale: int = 2):
    """Cast a double column to exact decimal for associative aggregation."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def as_double(aggregated):
    from pyspark.sql import functions as F  # noqa: F401

    return aggregated.cast("double")
