"""SCALE.md §29 measurement: is streaming state O(1) IN THE STREAM
LENGTH, as the round-14/15 boundary claims?  Drain the two live-panel
state families over the events bucket at three scale factors (input
rows grow 100×) and read the state store's row count from the drained
query's final progress:

* keyed-state kernel (``movingAverage(n: 6)`` over ALL five event
  series — applyInPandasWithState): state rows must equal #series
  (5) at every sf, independent of input rows;
* append-mode windowed aggregate (6h mean over one series, watermark
  0s): state rows must equal the OPEN windows left at drain end
  (the final window per series), independent of input rows.

Expectation at 100 TB: the same panels hold #series·n·8 B /
#series·1 window of state while input grows unbounded.  Run:

    python tools/scale_curve_stream.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_data_pipeline_spark.session import get_spark

SFS = ["sf0.001", "sf0.01", "sf0.1"]

KEYED = """
from(bucket: "b")
  |> filter(fn: (r) => r["_measurement"] == "events")
  |> movingAverage(n: 6)
"""

WINDOWED = """
from(bucket: "b")
  |> filter(fn: (r) => r["_measurement"] == "events")
  |> filter(fn: (r) => r["_field"] == "click")
  |> aggregateWindow(every: 6h, fn: mean)
"""


def drain(spark, flux_text: str, store: str, watermark: str | None):
    from time_series_data_pipeline_spark.flux import compile_flux_stream

    kwargs = {} if watermark is None else {"watermark": watermark}
    live = compile_flux_stream(spark, flux_text, {"b": store}, **kwargs)
    ck = tempfile.mkdtemp(prefix="tsdp_curve_stream_")
    t0 = time.perf_counter()
    q = (
        live.writeStream.format("noop")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    elapsed = time.perf_counter() - t0
    # the FINAL batch's progress carries the state store totals; input
    # rows are summed across all batches of the drain
    progresses = q.recentProgress
    in_rows = sum(int(p["numInputRows"]) for p in progresses)
    per_batch = [
        int(op["numRowsTotal"])
        for p in progresses
        for op in p.get("stateOperators") or []
    ]
    # peak = what a whole-history backfill drain holds before the
    # watermark's first eviction (every window of the range, for the
    # windowed form); final = the steady state a continuous stream
    # carries (the open tail)
    state_peak = max(per_batch, default=0)
    state_final = per_batch[-1] if per_batch else 0
    shutil.rmtree(ck, ignore_errors=True)
    return in_rows, state_peak, state_final, elapsed


def main() -> None:
    spark = get_spark(
        "tsdp-scale-curve-stream",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from time_series_data_pipeline_spark.queries.timeseries_q import (
        _event_bucket_path,
    )

    print(f"{'sf':>8} {'form':>9} {'input_rows':>11} "
          f"{'state_peak':>11} {'state_final':>12} {'sec':>6}")
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            print(f"{sf:>8}  (missing — skipped)")
            continue
        store = _event_bucket_path(spark, sf_dir)
        for form, text, wm in (
            ("keyed", KEYED, None),
            ("windowed", WINDOWED, "0 seconds"),
        ):
            in_rows, peak, final, sec = drain(spark, text, store, wm)
            print(f"{sf:>8} {form:>9} {in_rows:>11} "
                  f"{peak:>11} {final:>12} {sec:>6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
