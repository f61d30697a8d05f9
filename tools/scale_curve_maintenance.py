"""SCALE.md §20 measurement (VERDICT r7 item 6): is the STREAMING
MAINTENANCE tick's cost flat in store size at a fixed arrival rate?

SCALE §18 proved the query side (manifest file-skipping wins grow with
store width). This tool proves the maintenance side: three synthetic
bucket stores of different (days × fields) extent are drained once by
``start_rollup_maintenance(maintain_manifest=True)`` (the untimed
backfill tick), then a FIXED one-day arrival (same rows, same file
count for every store) lands and ONE maintenance tick is timed.

Expectation at 100 TB: the tick reads footers of the new files only
and refreshes only the touched ``_date``'s rollup partition, so its
cost tracks ARRIVAL, not history — the curve should be ~flat, with
only the manifest's store-wide file LISTING (cheap metadata) growing.

Run:

    python tools/scale_curve_maintenance.py
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
from time_series_data_pipeline_spark.streaming import ingest as sti

ROWS_PER_DAY_FIELD = 2_000
START = "2024-01-01"


def day_frame(spark, day0_offset: int, days: int, fields: int):
    n = days * fields * ROWS_PER_DAY_FIELD
    return (
        spark.range(n)
        .select(
            "id",
            (F.col("id") % days + day0_offset).alias("d"),
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


def run_tick(spark, bucket, rollup, ckpt, watch=None) -> float:
    t0 = time.perf_counter()
    q = sti.start_rollup_maintenance(
        spark, bucket, rollup, ckpt, maintain_manifest=True,
        watch_recent_days=watch,
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("scale-curve-maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    for days, fields in ((20, 5), (60, 10), (180, 15)):
        root = tempfile.mkdtemp(prefix=f"tsdp_maint_{days}x{fields}_")
        bucket, rollup = f"{root}/bucket", f"{root}/rollup"
        ckpt = f"{root}/ckpt"
        bkt.write_bucket(
            day_frame(spark, 0, days, fields), bucket, mode="overwrite"
        )
        bkt.refresh_bucket_manifest(spark, bucket)
        # tick 0: the backfill drain over the whole store — untimed
        # (it IS proportional to history; steady state is what matters)
        t_backfill = run_tick(spark, bucket, rollup, ckpt)
        n_store = len(mf._list_data_files(bucket))
        # fixed arrival: ONE new day, same density for every store size
        bkt.write_bucket(
            day_frame(spark, days, 1, fields), bucket, mode="append"
        )
        n_new = len(mf._list_data_files(bucket)) - n_store
        # the steady-state tick: new files only — this is the number
        t_tick = run_tick(spark, bucket, rollup, ckpt)
        # empty tick: scheduler + listing floor with nothing to do
        t_empty = run_tick(spark, bucket, rollup, ckpt)
        # the same two ticks with watch_recent_days=3 (round 10): the
        # source lists only the newest 3 _date partitions, so the
        # floor is bounded by the horizon while the marginal arrival
        # cost is unchanged — a second fixed arrival + a watched
        # empty tick expose both
        bkt.write_bucket(
            day_frame(spark, days + 1, 1, fields), bucket, mode="append"
        )
        t_tick_w = run_tick(spark, bucket, rollup, ckpt, watch=3)
        t_empty_w = run_tick(spark, bucket, rollup, ckpt, watch=3)
        print(
            f"store {days}d x {fields}f ({n_store} files, backfill "
            f"{t_backfill:.1f}s): arrival {n_new} files -> tick "
            f"{t_tick:.2f}s | empty tick {t_empty:.2f}s | watched(3d) "
            f"tick {t_tick_w:.2f}s | watched empty {t_empty_w:.2f}s"
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
