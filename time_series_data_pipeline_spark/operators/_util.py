"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def pin(df: DataFrame) -> DataFrame:
    """Persist an intermediate that multiple plan branches reuse.

    Spark has no cross-branch common-subexpression reuse: every branch
    of a self-join (or a projection feeding several joins) recomputes
    its lineage from the scan. Pinning also stops Catalyst's
    CollapseProject from inlining an expensive projected expression
    (e.g. a normalized vector) into every downstream consumer.
    MEMORY_AND_DISK keeps the 100 TB stance honest: spills instead of
    OOM — the moral equivalent of materializing a temp table between
    passes of a multi-pass MapReduce job."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)
