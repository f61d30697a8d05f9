"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``time_series_data_pipeline_spark``; this module
only adapts it to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from time_series_data_pipeline_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3.3 / §7): 5-minute tumbling-window
    mean per series over the events table at sf0.001 — the Flux
    ``aggregateWindow(every, mean)`` restated as a Catalyst plan."""
    return QUERIES["window_5m_mean"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query. Omitted (rows-only) only where no
    second engine can replay the computation: xxhash64-dependent LSH
    candidate sets (minhash/simhash/hyperplane), the partition-stateful
    Misra-Gries sketch, and the iterative BPE trainer — each is paired
    with a driver-attested `*_verify` oracle query or golden-trace
    tests (see queries.ROWS_ONLY_ATTESTATION)."""
    return dict(ORACLE)
