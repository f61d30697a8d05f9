"""Distributed Misra-Gries heavy-hitter sketch.

The exact `top_tokens` aggregation shuffles one row per DISTINCT token;
on a 100 TB corpus with a long-tail vocabulary that shuffle is the
bottleneck. Misra-Gries summarizes each PARTITION with k counters (one
pass, O(k) memory), and the summaries merge soundly:

    true_count - n/k  <=  merged_count  <=  true_count

so every item with frequency > n/k is guaranteed to survive (no false
negatives above the threshold); counts may undercount by at most n/k.
The shuffle moves only (#partitions x k) rows — independent of
vocabulary size.

Python here is the sanctioned Arrow boundary: the counter loop is
per-partition stateful (mapInPandas generator accumulates ACROSS the
partition's batches, emitting one summary at the end) — exactly the
shape Spark's built-ins can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(k: int):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf["item"]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters), "cnt": list(counters.values())}
        )

    return summarize


def heavy_hitters(
    df: DataFrame, item_col: str, k: int = 64, top: int = 20
) -> DataFrame:
    """Approximate top-``top`` items via per-partition Misra-Gries(k)
    summaries merged by sum. Guarantee: any item with true frequency
    > n_total/k appears; estimates lower-bound true counts."""
    items = df.select(F.col(item_col).cast("string").alias("item"))
    summaries = items.mapInPandas(_mg_partition(k), schema="item string, cnt long")
    return (
        summaries.groupBy("item")
        .agg(F.sum("cnt").alias("est_count"))
        .orderBy(F.col("est_count").desc(), "item")
        .limit(top)
    )
