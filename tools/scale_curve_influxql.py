"""SCALE.md §30 measurement: does the InfluxQL multi-aggregate SELECT
really save the N-pipelines-plus-recombination cost the Flux grammar
forces, and does the saving grow with data?

Two ways to answer the same five-stat dashboard question (mean, max,
min, count, sum of one field, 6h buckets over the queried week):

* ``influxql`` — ONE statement: five conditional aggregates share a
  single windowed groupBy (one exchange);
* ``flux_panels`` — the Flux-grammar reality: five separate
  ``aggregateWindow`` pipelines (one per fn), executed per panel
  refresh the way a five-stat dashboard row refreshes them.

For each sf the script reports wall time (min of 3) and the number of
shuffle exchanges in the executed plan(s) — the structural number that
survives any box: 1 for the InfluxQL statement vs 5 one-per-pipeline
(plus five scans vs one).  Run on an idle box:

    python tools/scale_curve_influxql.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_data_pipeline_spark.session import get_spark

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

IQL = (
    'SELECT mean("click") AS m, max("click") AS mx, min("click") AS mn, '
    'count("click") AS n, sum("click") AS s FROM events '
    "WHERE time >= '2024-01-08T00:00:00Z' AND time < '2024-01-15T00:00:00Z' "
    "GROUP BY time(6h) fill(none)"
)

FLUX_ONE = """
from(bucket: "b")
  |> range(start: "2024-01-08 00:00:00", stop: "2024-01-15 00:00:00")
  |> filter(fn: (r) => r["_measurement"] == "events")
  |> filter(fn: (r) => r["_field"] == "click")
  |> aggregateWindow(every: 6h, fn: {fn}, createEmpty: false)
"""

FNS = ["mean", "max", "min", "count", "sum"]


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith(("Exchange", "+- Exchange"))
        or " Exchange " in f" {ln.strip().split('(')[0]} "
    )


def main() -> None:
    from time_series_data_pipeline_spark.flux import compile_flux
    from time_series_data_pipeline_spark.influxql import compile_influxql
    from time_series_data_pipeline_spark.queries.timeseries_q import (
        _tagged_bucket_path,
    )

    spark = get_spark("scale-curve-influxql")
    spark.sparkContext.setLogLevel("ERROR")
    print("sf,rows,iql_sec,flux5_sec,iql_exchanges,flux5_exchanges")
    for sf in SFS:
        sf_dir = os.path.join(ROOT, sf)
        if not os.path.isdir(sf_dir):
            continue
        path = _tagged_bucket_path(spark, sf_dir)
        rows = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).count()

        def run_iql() -> None:
            compile_influxql(spark, IQL, path).write.format("noop").mode(
                "overwrite"
            ).save()

        def run_flux_panels() -> None:
            for fn in FNS:
                compile_flux(
                    spark, FLUX_ONE.format(fn=fn), {"b": path}
                ).write.format("noop").mode("overwrite").save()

        # exchange counts (structural — box-independent)
        iql_df = compile_influxql(spark, IQL, path)
        iql_df.write.format("noop").mode("overwrite").save()
        iql_ex = _exchanges(iql_df)
        flux_ex = 0
        for fn in FNS:
            fdf = compile_flux(spark, FLUX_ONE.format(fn=fn), {"b": path})
            fdf.write.format("noop").mode("overwrite").save()
            flux_ex += _exchanges(fdf)

        iql_t = min(
            (lambda: (lambda t0: (run_iql(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            ))()
            for _ in range(3)
        )
        flux_t = min(
            (lambda: (lambda t0: (
                run_flux_panels(), time.perf_counter() - t0
            )[1])(time.perf_counter()))()
            for _ in range(3)
        )
        print(
            f"{sf},{rows},{iql_t:.3f},{flux_t:.3f},{iql_ex},{flux_ex}"
        )


if __name__ == "__main__":
    main()
