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
