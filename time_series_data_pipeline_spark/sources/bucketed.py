"""Bucketed tables — co-located joins without a shuffle.

At 100 TB the repeated cost in a star/fact-to-fact workload is
re-shuffling the same fact table on the same key for every join.
Hive-style bucketing (``bucketBy(n, key)`` + ``sortBy``) bakes the
hash-partitioning into the TABLE: both sides of an equi-join on the
bucket key arrive pre-partitioned (and pre-sorted), so the planner
emits a SortMergeJoin with NO Exchange on either side — the join cost
collapses to a per-bucket merge. The invariant is pinned in
tests/test_plans.py.

Pick n_buckets so a bucket ≈ 128-256 MB at the target scale (e.g.
~400k buckets for a 100 TB fact on a 256 MB target); bucket counts must
match across tables meant to co-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) managed table."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crash between metastore drop and data delete can orphan the
    # location; clear it so overwrite never trips LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table_name}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
