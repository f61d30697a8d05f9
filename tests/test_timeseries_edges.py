"""Goldens for the sequential time-series operators (EWMA) and rolling
stats — checked against hand-rolled Python recurrences."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_data_pipeline_spark.operators import timeseries as ts_ops


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("a", 100, 1.0), ("a", 200, 2.0), ("a", 300, 6.0), ("a", 400, 2.0),
        ("b", 100, 10.0),
    ]
    return spark.createDataFrame(rows, "k string, sec long, v double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "v"
    )


def test_ewma_matches_recurrence(spark, series):
    alpha = 0.3
    got = {
        (r["k"], int(r["ts"].timestamp())): r["ewma"]
        for r in ts_ops.ewma(series, "ts", "v", ["k"], alpha).collect()
    }
    # hand recurrence: y0 = x0; y_t = a*x_t + (1-a)*y_{t-1}
    expect = {}
    for k, xs in {"a": [(100, 1.0), (200, 2.0), (300, 6.0), (400, 2.0)],
                  "b": [(100, 10.0)]}.items():
        y = None
        for sec, x in xs:
            y = x if y is None else alpha * x + (1 - alpha) * y
            expect[(k, sec)] = y
    assert set(got) == set(expect)
    for key, v in expect.items():
        assert abs(got[key] - v) < 1e-12


def test_rolling_stats_values(spark, series):
    got = {
        (r["k"], int(r["ts"].timestamp())): (r["roll_mean"], r["roll_std"], r["is_anomaly"])
        for r in ts_ops.rolling_stats(series, "ts", "v", ["k"], n_rows=3).collect()
    }
    # a@300: mean(1,2,6)=3, sample std = sqrt(((1-3)^2+(2-3)^2+(6-3)^2)/2)
    m, s, flag = got[("a", 300)]
    assert abs(m - 3.0) < 1e-12
    assert abs(s - (14 / 2) ** 0.5) < 1e-12
    assert flag is False
    # single-observation window: std undefined -> NULL zscore, no flag
    m1, s1, flag1 = got[("b", 100)]
    assert m1 == 10.0 and s1 is None and flag1 is None


def test_time_weighted_avg_constant_and_step(spark):
    """A constant series has TWA == the constant regardless of sampling
    density (plain AVG shares that only by luck); the ramp+plateau
    series pins the trapezoid rule itself: linear rise 0->10 over half
    the span (mean 5), plateau 10 over the other half -> TWA 7.5."""
    import datetime as dt

    from pyspark.sql import Row
    from time_series_data_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )

    base = dt.datetime(2024, 1, 1)
    mk = lambda s: base + dt.timedelta(seconds=s)
    # constant 5.0 sampled unevenly: TWA must still be exactly 5
    const = [
        Row(ts=mk(s), value=5.0, event_type="c", event_id=i)
        for i, s in enumerate([0, 1, 2, 50, 100])
    ]
    # linear rise to 10 by mid-span, then a plateau sampled densely
    step = [
        Row(ts=mk(s), value=v, event_type="s", event_id=10 + i)
        for i, (s, v) in enumerate(
            [(0, 0.0), (50, 10.0), (75, 10.0), (100, 10.0)]
        )
    ]
    out = {
        r.event_type: r
        for r in time_weighted_avg(
            spark.createDataFrame(const + step)
        ).collect()
    }
    assert abs(out["c"].time_weighted_avg - 5.0) < 1e-9
    # trapezoid: segment (0->50) mean 5 over half the span, then 10
    assert abs(out["s"].time_weighted_avg - 7.5) < 1e-9


def test_counter_increase_handles_resets(spark):
    import datetime as dt

    from pyspark.sql import Row
    from time_series_data_pipeline_spark.operators.timeseries import (
        counter_increase,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(ts=base + dt.timedelta(seconds=i), value=v, event_type="x", event_id=i)
        # 1 -> 4 (+3), reset to 2 (+2), -> 7 (+5): total 10
        for i, v in enumerate([1.0, 4.0, 2.0, 7.0])
    ]
    out = counter_increase(spark.createDataFrame(rows)).collect()[0]
    assert out.n == 4 and out.total_increase == 10.0


def test_event_transitions_probs_sum_to_one(spark):
    from time_series_data_pipeline_spark.queries.registry import QUERIES

    out = QUERIES["event_transitions"](spark, "/root/testdata/sf0.001")
    from pyspark.sql import functions as F

    sums = (
        out.groupBy("from_type").agg(F.sum("prob").alias("p")).collect()
    )
    assert all(abs(r.p - 1.0) < 1e-9 for r in sums)


def test_ewma_final_matches_arrow_ewma_last_row(spark):
    """The JVM-fold attestation (ewma_final) and the Arrow applyInPandas
    per-row EWMA agree bit-for-bit on every series' final value: both
    run y = (1-α)·y + α·x in float64 in the same order (pandas'
    old_wt = 1 - alpha is the same double as our (1.0 - 0.3) fold)."""
    from pyspark.sql import Window
    from time_series_data_pipeline_spark.queries.registry import QUERIES
    from time_series_data_pipeline_spark.queries.timeseries_q import ewma_value

    sf = "/root/testdata/sf0.001"
    final = {
        r.event_type: r.ewma_final
        for r in QUERIES["ewma_final"](spark, sf).collect()
    }
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("value").desc()
    )
    last_rows = (
        ewma_value(spark, sf)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert len(last_rows) == len(final)
    for r in last_rows:
        assert round(r.ewma, 9) == final[r.event_type], r.event_type
