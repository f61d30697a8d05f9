"""Property-based tests (hypothesis) for the custom join operators:
the Spark implementations must agree with a brute-force Python
reference on arbitrary small inputs — keys missing from one side,
duplicate timestamps, empty sides, boundary-exact matches.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from time_series_data_pipeline_spark.operators.asof import asof_join
from time_series_data_pipeline_spark.operators.rangejoin import range_join

# (key, epoch_second, value) triples; seconds span two bins of the
# 600 s range join so bin-boundary cases are generated
ROWS = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 1800),
        st.integers(-5, 5),
    ),
    max_size=12,
)

CFG = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows, ts_as_timestamp=True):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(k, s, float(v)) for k, s, v in rows] or [(0, 0, 0.0)],
        "k int, sec int, v double",
    )
    if not rows:
        df = df.filter("1=0")
    return df.select("k", F.timestamp_seconds("sec").alias("ts"), "v")


@given(left=ROWS, right=ROWS)
@settings(**CFG)
def test_asof_join_matches_bruteforce(spark, left, right):
    out = asof_join(
        _df(spark, left), _df(spark, right), by=["k"], ts_col="ts", value_cols=["v"]
    ).collect()
    got = sorted(
        (r["k"], r["ts"].timestamp(), r["v"],
         r["asof_ts"].timestamp() if r["asof_ts"] else None,
         r["asof_v"])
        for r in out
    )
    expect = []
    for k, s, v in left:
        cands = [(rs, rv) for rk, rs, rv in right if rk == k and rs <= s]
        best = max(cands) if cands else None  # ties: greatest (ts, value)
        expect.append(
            (k, float(s), float(v),
             float(best[0]) if best else None,
             float(best[1]) if best else None)
        )
    assert got == sorted(expect)


@given(left=ROWS, right=ROWS, span=st.sampled_from([60, 600, 1800, 7200]))
@settings(**CFG)
def test_range_join_matches_bruteforce(spark, left, right, span):
    """Span varies across bin-boundary regimes: spans smaller than,
    equal to, and larger than the data's time extent."""
    out = range_join(
        _df(spark, left), _df(spark, right), by=["k"],
        left_ts="ts", right_ts="ts", lower_seconds=span,
    ).collect()
    got = sorted(
        (r["k"], r["ts"].timestamp(), r["v"], r["r_ts"].timestamp(), r["r_v"])
        for r in out
    )
    expect = sorted(
        (lk, float(ls), float(lv), float(rs), float(rv))
        for lk, ls, lv in left
        for rk, rs, rv in right
        if rk == lk and ls - span <= rs < ls
    )
    assert got == expect


def test_asof_directions_fixture(spark):
    """backward/forward/nearest on a hand-built timeline, including the
    equal-distance tie (-> backward) and one-sided edges."""
    import datetime as dt

    from time_series_data_pipeline_spark.operators.asof import asof_join
    from pyspark.sql import Row

    base = dt.datetime(2024, 1, 1)
    mk = lambda s: base + dt.timedelta(seconds=s)
    left = spark.createDataFrame(
        [Row(k="u", ts=mk(s), lid=i) for i, s in enumerate([5, 20, 100])]
    )
    right = spark.createDataFrame(
        [Row(k="u", ts=mk(s), rv=float(s)) for s in [10, 30, 90]]
    )

    def run(direction):
        out = asof_join(
            left, right, by=["k"], ts_col="ts",
            value_cols=["rv"], direction=direction,
        )
        return {r.lid: r.asof_rv for r in out.collect()}

    # left@5: nothing before; left@20: 10 before / 30 after (tie at 10s
    # distance -> backward); left@100: 90 before, nothing after
    assert run("backward") == {0: None, 1: 10.0, 2: 90.0}
    assert run("forward") == {0: 10.0, 1: 30.0, 2: None}
    assert run("nearest") == {0: 10.0, 1: 10.0, 2: 90.0}


def test_asof_nearest_single_exchange(spark):
    """nearest adds a second window sort but must reuse the single
    hash-partitioning exchange."""
    import datetime as dt

    from time_series_data_pipeline_spark.operators.asof import asof_join
    from pyspark.sql import Row

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([Row(k="u", ts=base, lid=1)])
    right = spark.createDataFrame([Row(k="u", ts=base, rv=1.0)])
    plan = (
        asof_join(left, right, by=["k"], value_cols=["rv"], direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 1, plan


# (key, start_second, duration_seconds) interval triples — durations of
# 0 and boundary-touching cases are generated
IVALS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 120), st.integers(0, 40)),
    min_size=1,
    max_size=14,
)


@given(rows=IVALS)
@settings(**CFG)
def test_merge_intervals_matches_bruteforce(spark, rows):
    """merge_intervals must equal the classic sweep-line interval union
    computed in plain Python, per key, for arbitrary interval sets."""
    import datetime as dt

    from pyspark.sql import functions as F
    from time_series_data_pipeline_spark.operators.timeseries import (
        merge_intervals,
    )

    base = dt.datetime(2024, 1, 1)
    data = [
        (k, i, base + dt.timedelta(seconds=s), d * 1_000_000)
        for i, (k, s, d) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "k long, event_id long, ts timestamp, dur long"
    )
    got = {
        (r.k, r.interval_start, r.interval_end, r.n_events)
        for r in merge_intervals(
            df, "ts", F.col("dur"), ["k"], "event_id"
        ).collect()
    }

    # brute force: sort by (start, id), sweep, merge on overlap/touch
    expect = set()
    by_key: dict = {}
    for k, i, ts, dur in data:
        by_key.setdefault(k, []).append((ts, i, ts + dt.timedelta(microseconds=dur)))
    for k, ivs in by_key.items():
        ivs.sort(key=lambda t: (t[0], t[1]))
        cur_s, cur_e, n = ivs[0][0], ivs[0][2], 1
        for s, _, e in ivs[1:]:
            if s <= cur_e:
                cur_e = max(cur_e, e)
                n += 1
            else:
                expect.add((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        expect.add((k, cur_s, cur_e, n))

    # island numbering is an implementation detail; compare the spans
    assert got == expect
