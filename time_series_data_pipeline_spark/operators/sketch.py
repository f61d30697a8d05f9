"""Distributed Misra-Gries heavy-hitter sketch.

The exact `top_tokens` aggregation shuffles one row per DISTINCT token;
on a 100 TB corpus with a long-tail vocabulary that shuffle is the
bottleneck. Misra-Gries summarizes each PARTITION with k counters (one
pass, O(k) memory), and the summaries merge soundly:

    true_count - n/(k+1)  <=  merged_count  <=  true_count

so every item with frequency > n/k is guaranteed to survive (no false
negatives above the threshold); counts may undercount by at most
n/(k+1). The shuffle moves only (#partitions x k) rows — independent of
vocabulary size.

Python here is the sanctioned Arrow boundary: the counter loop is
per-partition stateful (mapInPandas generator accumulates ACROSS the
partition's batches, emitting one summary at the end) — exactly the
shape Spark's built-ins can't express. The per-batch work is
vectorized: pandas ``value_counts`` collapses each Arrow batch to
(unique item, weight) pairs first, so the Python loop runs once per
DISTINCT item per batch, not once per token instance, and the sketch
update is the weighted Misra-Gries step (decrement by the min counter,
amortized O(1) decrement events per item).
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
            # vectorized pre-aggregation: one (item, weight) pair per
            # DISTINCT item in the batch — pandas does the instance loop
            for item, w in pdf["item"].value_counts().items():
                w = int(w)
                if item in counters:
                    counters[item] += w
                    continue
                # weighted MG insert: decrement everything by the min
                # counter (or the remaining weight, whichever is
                # smaller) until the item fits or its weight is spent.
                # Each decrement event removes d*(k+1) total weight, so
                # sum(d) <= n/(k+1) — the classic MG error bound.
                while True:
                    if len(counters) < k:
                        counters[item] = w
                        break
                    mn = min(counters.values())
                    d = mn if mn < w else w
                    counters = {
                        key: c - d for key, c in counters.items() if c > d
                    }
                    w -= d
                    if w == 0:
                        break
        yield pd.DataFrame(
            {"item": list(counters), "cnt": list(counters.values())}
        )

    return summarize


def heavy_hitters(
    df: DataFrame, item_col: str, k: int = 64, top: int | None = 20
) -> DataFrame:
    """Approximate top-``top`` items via per-partition Misra-Gries(k)
    summaries merged by sum. Guarantee: any item with true frequency
    > n_total/k appears; estimates lower-bound true counts.

    ``top=None`` returns every merged tracked item with no global sort —
    the form the invariant attestation (tests) consumes.

    NULL items are excluded up front (documented choice): pandas
    ``value_counts`` drops NaN/None, so nulls would otherwise vanish
    from the sketch silently; a null token is not a meaningful heavy
    hitter, and the explicit filter keeps the sketch's n (and therefore
    its n/k guarantee threshold) defined over the same non-null multiset
    the exact-count verification uses.
    """
    items = df.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    summaries = items.mapInPandas(_mg_partition(k), schema="item string, cnt long")
    merged = summaries.groupBy("item").agg(F.sum("cnt").alias("est_count"))
    if top is None:
        return merged
    return merged.orderBy(F.col("est_count").desc(), "item").limit(top)
