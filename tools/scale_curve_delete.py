"""SCALE.md §26 measurement: is ``bucket.delete_rows``'s cost flat in
STORE SIZE for a fixed predicate window?

The claim (sources/bucket.py delete_rows): a predicate delete reads
and rewrites ONLY the ``_date`` partitions intersecting [start, stop),
so at 100 TB a targeted delete costs the touched days, not the corpus.
This tool builds three synthetic stores of growing day-extent (same
rows-per-day), deletes the SAME one-day field slice from each, and
times the call.

Expectation: ~flat wall time across store sizes (the touched-day
rewrite dominates; the only store-size term is the partition-directory
listing, cheap metadata), with rows_deleted identical everywhere.

Run:

    python tools/scale_curve_delete.py
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from time_series_data_pipeline_spark.sources import bucket as bkt  # noqa: E402


def build_store(spark, root: str, days: int, rows_per_day: int) -> str:
    path = os.path.join(root, f"store_{days}d")
    # UTC-anchored: _date partitioning is UTC, so a machine-local
    # naive timestamp would shift the day boundaries on non-UTC hosts
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    step_s = 86400 / rows_per_day
    rows = spark.range(days * rows_per_day).select(
        F.timestamp_micros(
            F.lit(int(base.timestamp() * 1e6))
            + (F.col("id") * int(step_s * 1e6)).cast("long")
        ).alias("_time"),
        F.lit("events").alias("_measurement"),
        F.concat(F.lit("f"), (F.col("id") % 4).cast("string")).alias("_field"),
        (F.col("id") % 97).cast("double").alias("_value"),
        F.create_map().cast("map<string,string>").alias("tags"),
    )
    bkt.write_bucket(rows, path, mode="overwrite", cluster="field")
    bkt.refresh_bucket_manifest(spark, path)
    return path


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="delete_curve_")
    rows_per_day = 20_000
    try:
        print(f"{'days':>6} {'build_rows':>12} {'deleted':>9} {'secs':>7}")
        for days in (10, 30, 90):
            path = build_store(spark, root, days, rows_per_day)
            # the fixed predicate window: ONE mid-store day, one field
            t0 = time.perf_counter()
            res = bkt.delete_rows(
                spark,
                path,
                "2024-01-05 00:00:00",
                "2024-01-06 00:00:00",
                measurement="events",
                field="f1",
                cluster="field",
            )
            secs = time.perf_counter() - t0
            print(
                f"{days:>6} {days * rows_per_day:>12} "
                f"{res['rows_deleted']:>9} {secs:>7.2f}   "
                f"rewritten={len(res['partitions_rewritten'])} "
                f"removed={len(res['partitions_removed'])}"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
