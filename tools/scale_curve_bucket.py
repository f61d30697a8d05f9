"""SCALE.md §18 measurement: does the manifest's file-skipping WIN
GROW with store size?  Two synthetic bucket stores of different
(days × fields) extent, same per-(day, field) density, same query
(one field, 7-day range, 5-minute window mean).  For each store we
time the partition-pruned-only path (`scan` over the native read —
directory pruning + row-group stats, no manifest) against the full
three-tier path (`scan_bucket` — manifest file skipping on top), and
count the files each touches.

Expectation at 100 TB: partition pruning alone keeps days_in_range ×
files_per_day ∝ |fields| files, so its cost grows with field count;
the manifest path keeps ~days_in_range × 1 and stays flat.  Run:

    python tools/scale_curve_bucket.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_data_pipeline_spark.session import get_spark
from time_series_data_pipeline_spark.sources import bucket as bkt
from time_series_data_pipeline_spark.sources import manifest as mf

ROWS_PER_DAY_FIELD = 20_000
START = "2024-01-01"


def build_store(spark, path: str, days: int, fields: int) -> None:
    n = days * fields * ROWS_PER_DAY_FIELD
    df = (
        spark.range(n)
        .select(
            "id",
            (F.col("id") % days).alias("d"),
            ((F.col("id") / days).cast("long") % fields).alias("f"),
            (F.col("id") % ROWS_PER_DAY_FIELD).alias("i"),
        )
        .select(
            (
                F.to_timestamp(F.lit(f"{START} 00:00:00"))
                + F.make_interval(
                    secs=F.col("d") * 86400
                    + F.col("i") * (86400.0 / ROWS_PER_DAY_FIELD)
                )
            ).alias("_time"),
            F.lit("events").alias("_measurement"),
            F.concat(F.lit("f"), F.col("f")).alias("_field"),
            (F.xxhash64("id") % 1000 / 10.0).alias("_value"),
            F.create_map().cast("map<string,string>").alias("tags"),
        )
    )
    bkt.write_bucket(df, path, mode="overwrite", cluster="field")
    bkt.refresh_bucket_manifest(spark, path)


def timed(fn, warmups: int = 1, reps: int = 2) -> float:
    for _ in range(warmups):
        fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def measure(spark, path: str, field: str, start: str, stop: str):
    total_files = len(mf._list_data_files(path))

    def run_partition_only():
        df = bkt.scan(
            bkt.read_bucket(spark, path),
            measurement="events",
            field=field,
            start=start,
            stop=stop,
        )
        bkt.window_mean(df, "5 minutes").write.format("noop").mode(
            "overwrite"
        ).save()

    def run_manifest():
        df = bkt.scan_bucket(
            spark, path, measurement="events", field=field, start=start, stop=stop
        )
        bkt.window_mean(df, "5 minutes").write.format("noop").mode(
            "overwrite"
        ).save()

    def prune_only():
        return mf.prune_files(
            spark,
            path,
            f"{path}/{bkt.MANIFEST_SUBDIR}",
            constraints={
                "_field": (field, field),
                "_time": (f"{start}", f"{stop}"),
            },
        )

    kept = len(prune_only())
    t_prune = timed(prune_only)
    t_part = timed(run_partition_only)
    t_man = timed(run_manifest)
    return total_files, kept, t_part, t_man, t_prune


def main() -> None:
    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    for days, fields in ((30, 5), (120, 20), (300, 40)):
        root = tempfile.mkdtemp(prefix=f"tsdp_curve_{days}x{fields}_")
        path = f"{root}/bucket"
        t0 = time.perf_counter()
        build_store(spark, path, days, fields)
        build_s = time.perf_counter() - t0
        total, kept, t_part, t_man, t_prune = measure(
            spark, path, "f3", "2024-01-08 00:00:00", "2024-01-15 00:00:00"
        )
        print(
            f"store {days}d x {fields}f ({days*fields*ROWS_PER_DAY_FIELD:,} rows, "
            f"{total} files, built {build_s:.1f}s): "
            f"partition-pruned {t_part:.3f}s | manifest {t_man:.3f}s "
            f"(prune job {t_prune:.3f}s, {kept}/{total} files kept)"
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
