"""Custom stateful streaming operator (SURVEY.md §2.7 ST5).

The reference's only state is its processed-file set (ETL.py:50); Spark
gives arbitrary keyed state via ``applyInPandasWithState`` — Arrow
batches in, explicit per-key state, exactly-once through the
checkpoint. The operator here maintains running (count, sum, min, max)
per key across micro-batches and emits the updated totals every batch —
the "continuous aggregate" a dashboard reads without rescanning
history.

Scale: state is O(#distinct keys) × 32 bytes, partitioned by key across
executors by the state store; each micro-batch shuffles only the new
rows. This is the pattern for any custom accumulator Spark's built-in
windows can't express (EWMA, per-entity CUSUM drift, dedup sets with
TTL, ...).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n long, total double, vmin double, vmax double"
STATE_SCHEMA = "n long, total double, vmin double, vmax double"


def _update_running_stats(
    key: tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for `key` into the persisted (n, total,
    min, max) and emit the new totals once per batch."""
    n, total, vmin, vmax = (
        state.get if state.exists else (0, 0.0, float("inf"), float("-inf"))
    )
    for pdf in pdfs:
        v = pdf["value"]
        if len(v):
            n += int(len(v))
            total += float(v.sum())
            vmin = min(vmin, float(v.min()))
            vmax = max(vmax, float(v.max()))
    state.update((n, total, vmin, vmax))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n": [n],
            "total": [total],
            "vmin": [vmin],
            "vmax": [vmax],
        }
    )


def running_stats(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running stats over a stream. ``stream`` must be a
    streaming DataFrame; output mode must be ``update``."""
    rows = stream.selectExpr(f"{key_col} AS key", f"CAST({value_col} AS DOUBLE) AS value")
    return rows.groupBy("key").applyInPandasWithState(
        _update_running_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
