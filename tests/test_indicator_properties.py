"""Property-based tests (hypothesis) for the round-10c recurrence
kernels and trailing-frame indicators: the Spark implementations must
agree with a pure-Python reference fold on arbitrary small series —
duplicate timestamps, constant runs, sign flips, too-short series.

The kernels (flux_ema_chain, flux_rsi) promise BIT-identical outputs
to the documented expression order, so the comparison is exact
equality, not approximate. The Catalyst indicators (CMO, kaufmansER)
compute over exact decimals with one final double division — also
exact, because the Python reference replays the same quantized values
and division.
"""

from __future__ import annotations

import datetime

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

from time_series_data_pipeline_spark.operators.timeseries import (
    flux_ema_chain,
    flux_rsi,
)

# cent-quantized values (the store's domain) over minute stamps with
# possible DUPLICATE timestamps (minute // 2): the kernels' table order
# is (ts, value), so ties exercise the sort tiebreak
SERIES = st.lists(
    st.integers(-10_000, 10_000), min_size=0, max_size=24
)

CFG = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

T0 = datetime.datetime(2024, 1, 1)


def _series_df(spark, cents, dup_ts):
    rows = [
        (
            T0 + datetime.timedelta(minutes=(i // 2 if dup_ts else i)),
            "events",
            "click",
            c / 100.0,
        )
        for i, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows or [(T0, "events", "click", 0.0)],
        "t timestamp, m string, f string, v double",
    )
    if not rows:
        df = df.filter("1=0")
    return df.select(
        F.col("m").alias("_measurement"),
        F.col("f").alias("_field"),
        F.col("t").alias("_time"),
        F.col("v").alias("_value"),
    )


def _table_order(cents, dup_ts):
    """The compiler's (ts, value) table order over the generated rows."""
    rows = [
        ((i // 2 if dup_ts else i), c / 100.0) for i, c in enumerate(cents)
    ]
    return [v for _, v in sorted(rows)]


def _fold(xs, n):
    if len(xs) < n:
        return None
    acc = xs[0]
    for x in xs[1:n]:
        acc = acc + x
    acc = acc / n
    out = [acc]
    k = 2.0 / (n + 1.0)
    omk = 1.0 - k
    for x in xs[n:]:
        acc = omk * acc + k * x
        out.append(acc)
    return out


@given(cents=SERIES, n=st.sampled_from([2, 3, 5]), dup_ts=st.booleans())
@settings(**CFG)
def test_dema_matches_python_fold(spark, cents, n, dup_ts):
    xs = _table_order(cents, dup_ts)
    e1 = _fold(xs, n)
    e2 = _fold(e1, n) if e1 is not None else None
    expected = (
        [] if e2 is None else [2.0 * a - b for a, b in zip(e1[n - 1 :], e2)]
    )
    got = [
        r["_value"]
        for r in sorted(
            flux_ema_chain(
                _series_df(spark, cents, dup_ts),
                "_time", "_value", ["_measurement", "_field"], n, level=2,
            ).collect(),
            key=lambda r: r["__seq"],
        )
    ]
    assert got == expected


@given(cents=SERIES, n=st.sampled_from([2, 3]), dup_ts=st.booleans())
@settings(**CFG)
def test_tema_matches_python_fold(spark, cents, n, dup_ts):
    xs = _table_order(cents, dup_ts)
    e1 = _fold(xs, n)
    e2 = _fold(e1, n) if e1 is not None else None
    e3 = _fold(e2, n) if e2 is not None else None
    expected = (
        []
        if e3 is None
        else [
            3.0 * a - 3.0 * b + c
            for a, b, c in zip(e1[2 * (n - 1) :], e2[n - 1 :], e3)
        ]
    )
    got = [
        r["_value"]
        for r in sorted(
            flux_ema_chain(
                _series_df(spark, cents, dup_ts),
                "_time", "_value", ["_measurement", "_field"], n, level=3,
            ).collect(),
            key=lambda r: r["__seq"],
        )
    ]
    assert got == expected


@given(cents=SERIES, n=st.sampled_from([2, 4]), dup_ts=st.booleans())
@settings(**CFG)
def test_rsi_matches_python_recurrence(spark, cents, n, dup_ts):
    xs = _table_order(cents, dup_ts)

    def rsi(u, v):
        return 100.0 if v == 0.0 else 100.0 - 100.0 / (1.0 + u / v)

    expected = []
    if len(xs) >= n + 1:
        au = ad = 0.0
        for i in range(1, n + 1):
            d = xs[i] - xs[i - 1]
            if d > 0.0:
                au = au + d
            elif d < 0.0:
                ad = ad + (-d)
        au /= n
        ad /= n
        expected = [rsi(au, ad)]
        for i in range(n + 1, len(xs)):
            d = xs[i] - xs[i - 1]
            au = (au * (n - 1.0) + (d if d > 0.0 else 0.0)) / n
            ad = (ad * (n - 1.0) + (-d if d < 0.0 else 0.0)) / n
            expected.append(rsi(au, ad))
    got = [
        r["_value"]
        for r in sorted(
            flux_rsi(
                _series_df(spark, cents, dup_ts),
                "_time", "_value", ["_measurement", "_field"], n,
            ).collect(),
            key=lambda r: r["__seq"],
        )
    ]
    assert got == expected


@given(cents=SERIES, n=st.sampled_from([2, 3]), dup_ts=st.booleans())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cmo_matches_python_reference(spark, cents, n, dup_ts, tmp_path_factory):
    """The pure-Catalyst CMO over exact decimals equals a Python
    reference computing cent-integer up/down sums with one final
    float division — including the flat-window 0 convention."""
    from hypothesis import assume

    from time_series_data_pipeline_spark import flux
    from time_series_data_pipeline_spark.sources import bucket as bkt

    # an EMPTY store has no schema to read — not a compile-path case
    assume(cents)
    xs = _table_order(cents, dup_ts)
    expected = []
    deltas = [
        round((b - a) * 100) for a, b in zip(xs, xs[1:])
    ]  # exact cent integers
    for i in range(n, len(deltas) + 1):
        win = deltas[i - n : i]
        up = sum(d for d in win if d > 0)
        dn = sum(-d for d in win if d < 0)
        # the engine's exact IEEE operands: numerator (up−dn)·100 in
        # dollar-decimals has integer numeric value (up_c − dn_c);
        # denominator is the correctly-rounded double of cents/100 —
        # python's int/int division produces the same nearest double
        expected.append(
            0.0 if up + dn == 0 else float(up - dn) / ((up + dn) / 100)
        )
    df = _series_df(spark, cents, dup_ts).select(
        "_time", "_measurement", "_field", "_value",
        F.create_map().cast("map<string,string>").alias("tags"),
    )
    path = str(tmp_path_factory.mktemp("cmoprop") / "bucket")
    bkt.write_bucket(df, path, mode="overwrite")
    out = flux.compile_flux(
        spark,
        f'from(bucket: "b") |> chandeMomentumOscillator(n: {n})',
        {"b": path},
    ).collect()
    got = [
        r["_value"]
        for r in sorted(out, key=lambda r: (r["_time"], r["_value"]))
    ]
    assert sorted(got) == sorted(expected)


@given(cents=SERIES, n=st.sampled_from([2, 3]), dup_ts=st.booleans())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kaufmans_er_matches_python_reference(
    spark, cents, n, dup_ts, tmp_path_factory
):
    """kaufmansER over exact decimals equals the cent-integer Python
    reference with the engine's IEEE operand shapes — |net| / Σ|step|
    with the flat-window 0 convention."""
    from hypothesis import assume

    from time_series_data_pipeline_spark import flux
    from time_series_data_pipeline_spark.sources import bucket as bkt

    assume(cents)
    xs = _table_order(cents, dup_ts)
    deltas = [round((b - a) * 100) for a, b in zip(xs, xs[1:])]
    expected = []
    for i in range(n, len(deltas) + 1):
        win = deltas[i - n : i]
        den = sum(abs(d) for d in win)
        num = abs(sum(win))  # telescoping |v_i − v_{i−n}| in cents
        # engine: CAST(num_dollars AS DOUBLE) / CAST(den_dollars AS
        # DOUBLE) — both correctly-rounded doubles of cents/100
        expected.append(0.0 if den == 0 else (num / 100) / (den / 100))
    df = _series_df(spark, cents, dup_ts).select(
        "_time", "_measurement", "_field", "_value",
        F.create_map().cast("map<string,string>").alias("tags"),
    )
    path = str(tmp_path_factory.mktemp("kerprop") / "bucket")
    bkt.write_bucket(df, path, mode="overwrite")
    out = flux.compile_flux(
        spark,
        f'from(bucket: "b") |> kaufmansER(n: {n})',
        {"b": path},
    ).collect()
    got = [r["_value"] for r in out]
    assert sorted(got) == sorted(expected)


@given(cents=SERIES, n=st.sampled_from([2, 3]), dup_ts=st.booleans())
@settings(**CFG)
def test_trix_matches_python_fold(spark, cents, n, dup_ts):
    """flux_trix ≡ the triple chained fold's one-lag percent
    derivative; a zero previous e3 is a pinned NULL (round 11b)."""
    from time_series_data_pipeline_spark.operators.timeseries import flux_trix

    xs = _table_order(cents, dup_ts)
    e1 = _fold(xs, n)
    e2 = _fold(e1, n) if e1 is not None else None
    e3 = _fold(e2, n) if e2 is not None else None
    expected = (
        []
        if e3 is None or len(e3) < 2
        else [
            None if b == 0.0 else (a - b) / b * 100.0
            for b, a in zip(e3, e3[1:])
        ]
    )
    got = [
        r["_value"]
        for r in sorted(
            flux_trix(
                _series_df(spark, cents, dup_ts),
                "_time", "_value", ["_measurement", "_field"], n,
            ).collect(),
            key=lambda r: r["__seq"],
        )
    ]
    assert got == expected


@given(cents=SERIES, n=st.sampled_from([2, 4]), dup_ts=st.booleans())
@settings(**CFG)
def test_kama_matches_python_recurrence(spark, cents, n, dup_ts):
    """flux_kama ≡ the pinned identity-seed KAMA recurrence (ER from
    left-to-right |Δ| folds, sc = m·m, (x−prev)·sc + prev), exactly —
    including the flat-window ER=0 branch."""
    from time_series_data_pipeline_spark.operators.timeseries import flux_kama

    xs = _table_order(cents, dup_ts)
    if len(xs) < n + 1:
        expected = []
    else:
        c1, c2 = 2.0 / 3.0 - 2.0 / 31.0, 2.0 / 31.0
        prev = xs[n - 1]
        expected = []
        for t in range(n, len(xs)):
            dsum = 0.0
            for i in range(t - n + 1, t + 1):
                dsum = dsum + abs(xs[i] - xs[i - 1])
            num = abs(xs[t] - xs[t - n])
            er = 0.0 if dsum == 0.0 else num / dsum
            m = er * c1 + c2
            prev = (xs[t] - prev) * (m * m) + prev
            expected.append(prev)
    got = [
        r["_value"]
        for r in sorted(
            flux_kama(
                _series_df(spark, cents, dup_ts),
                "_time", "_value", ["_measurement", "_field"], n,
            ).collect(),
            key=lambda r: r["__seq"],
        )
    ]
    assert got == expected


@given(cents=SERIES, dup_ts=st.booleans())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_reduce_fold_matches_python_fold(spark, cents, dup_ts, tmp_path_factory):
    """The round-12 reduce() cross-field fold equals an INDEPENDENT
    pure-Python fold (hand-written per idiom, not the compiler's own
    evaluator) in table order — bit-exact: the kernel promises the
    same IEEE op sequence as the expression text. Three shapes: the
    incremental mean (add + divide), a multiplicative self-fold, and
    the old-accumulator swap."""
    from hypothesis import assume

    from time_series_data_pipeline_spark import flux
    from time_series_data_pipeline_spark.sources import bucket as bkt

    assume(cents)
    xs = _table_order(cents, dup_ts)

    # reference folds, written directly from the Flux record semantics
    cnt, total, avg = 0.0, 0.0, 0.0
    for v in xs:
        cnt, total, avg = cnt + 1.0, total + v, (total + v) / (cnt + 1.0)
    prod = 1.0
    for v in xs:
        prod = prod * v
    a_f, b_f = 0.0, 1.0
    for v in xs:
        a_f, b_f = b_f + v, a_f

    df = _series_df(spark, cents, dup_ts).select(
        "_time", "_measurement", "_field", "_value",
        F.create_map().cast("map<string,string>").alias("tags"),
    )
    path = str(tmp_path_factory.mktemp("rfoldprop") / "bucket")
    bkt.write_bucket(df, path, mode="overwrite")

    out = flux.compile_flux(
        spark,
        'from(bucket: "b") |> reduce(fn: (r, accumulator) => ({'
        " cnt: accumulator.cnt + 1.0,"
        " total: accumulator.total + r._value,"
        " avg: (accumulator.total + r._value) / (accumulator.cnt + 1.0),"
        " prod: accumulator.prod * r._value,"
        " a: accumulator.b + r._value,"
        " b: accumulator.a"
        " }), identity: {cnt: 0.0, total: 0.0, avg: 0.0, prod: 1.0,"
        " a: 0.0, b: 1.0})",
        {"b": path},
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["cnt"], r["total"], r["avg"], r["prod"], r["a"], r["b"]) == (
        cnt, total, avg, prod, a_f, b_f,
    )


# -- round 13: the streaming fold step ≡ the batch fold ----------------


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=0, max_size=64,
    ),
    st.integers(1, 12),
)
@settings(max_examples=300, deadline=None)
def test_incremental_fold_step_equals_batch_fold(xs, n):
    """The streaming smoothing kernel's incremental step
    (streaming/stateful._ema_fold_step) replayed over a whole series
    must reproduce operators.timeseries._flux_ema_fold BIT-FOR-BIT —
    the property the six streaming==batch equalities rest on, pinned
    here on arbitrary floats without spinning a streaming query. Also
    pinned: splitting the series at EVERY point (the micro-batch
    boundary) changes nothing, because the step carries (acc, warm,
    cnt) — the warm-up-spans-the-boundary guarantee."""
    from time_series_data_pipeline_spark.operators.timeseries import (
        _flux_ema_fold,
    )
    from time_series_data_pipeline_spark.streaming.stateful import (
        _ema_fold_step,
    )

    k = 2.0 / (n + 1.0)
    omk = 1.0 - k
    batch = _flux_ema_fold(xs, n, k, omk)
    slot = [0.0, 0.0, 0]
    incr = [
        out for x in xs
        if (out := _ema_fold_step(slot, x, n, k, omk)) is not None
    ]
    if batch is None:
        assert incr == []
    else:
        assert incr == batch  # exact, not approximate
    # state round-trip through int/float (the Spark state store's
    # typed tuple) preserves the fold exactly
    slot2 = [0.0, 0.0, 0]
    incr2 = []
    for x in xs:
        out = _ema_fold_step(slot2, x, n, k, omk)
        if out is not None:
            incr2.append(out)
        slot2 = [float(slot2[0]), float(slot2[1]), int(slot2[2])]
    assert incr2 == incr
