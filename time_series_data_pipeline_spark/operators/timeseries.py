"""Time-series operators: tumbling/sliding/session windows, gap-fill,
last-value, resample.

Reference parity (SURVEY.md §2.5, §2.7): the Flux ``aggregateWindow``
family (photo/use-variable.png line 5 of the reference) plus the
extensions a Spark-native engine gets for free. All operators are
tz-independent compositions of built-ins — they produce identical
results under any session time zone because ``F.window``/``F.date_trunc``
on (NTZ) timestamps are wall-clock arithmetic.

Scale notes (100 TB): every operator here is a single hash-aggregation
over its grouping keys — one shuffle, map-side partial aggregation
included. Gap-fill joins a tiny generated spine (rows = time-range /
step, independent of data volume) against the already-aggregated
buckets, so the join is broadcast-able by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._util import pin as _pin


def _dec(col: str | Column, scale: int = 2) -> Column:
    """Exact-decimal cast so SUM/AVG are associative → deterministic
    across partition orders (see queries/registry.py docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    window: str = "5 minutes",
) -> DataFrame:
    """Flux ``aggregateWindow(every: w, fn: mean, createEmpty: false)``.

    Empty windows are naturally absent (groupBy emits only observed
    groups). AVG is SUM(decimal)/COUNT for cross-engine determinism.
    """
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(
            (F.sum(_dec(value_col)).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "avg_value", "n")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    window: str = "15 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """Sliding (hopping) window mean — each row lands in window/slide
    overlapping windows; Spark expands them JVM-side (no Python)."""
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
        .agg(
            (F.sum(_dec(value_col)).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "avg_value", "n")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    gap: str = "5 minutes",
) -> DataFrame:
    """Session windows: a session is a maximal run of events where each
    consecutive pair is < gap apart; the window is [first, last+gap)."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str = "5 minutes",
    window_seconds: int = 300,
    keys: list[str] | None = None,
) -> DataFrame:
    """Flux ``aggregateWindow(..., createEmpty: true)``: every bucket in
    [min, max] appears, empty ones with n_events=0 / avg NULL.

    ``keys`` makes the fill PER SERIES — the Flux semantics, where
    ``createEmpty`` operates per table (= per ``_field``/tag series), so
    every series gets the full bucket spine of the queried range. With
    no keys the single pre-filtered series form is preserved.

    The spine is `sequence(min_bucket, max_bucket, step)` exploded from a
    single aggregated row — its size is time-range/step, independent of
    input volume. The per-series grid is spine × distinct(keys): series
    count is bounded (fields × tags, not rows).

    The spine⋈agg join strategy is deliberately LEFT TO THE PLANNER
    (no broadcast hint — VERDICT r5 item 3): the aggregated side is
    (buckets × series)-sized, i.e. the same order as the operator's
    OUTPUT, so force-broadcasting it caps the operator at executor
    memory — a year-long 5-min spine × 10⁵ series is ~10¹⁰ rows that
    no broadcast survives. With statistics (and AQE at runtime) Spark
    broadcasts the post-aggregation side when it is genuinely small
    and falls back to a shuffled join on (bucket, keys) when it is
    not; a plan test pins that the logical plan carries no forced
    broadcast hint.
    """
    keys = list(keys or [])
    agg = (
        df.groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_dec(value_col)).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        )
        .select(F.col("w.start").alias("bucket"), *keys, "n_events", "avg_value")
    )
    agg = _pin(agg) if keys else agg
    spine = agg.agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx")).select(
        F.explode(
            F.sequence("mn", "mx", F.expr(f"INTERVAL {window_seconds} SECONDS"))
        ).alias("bucket")
    )
    if keys:
        # global [min, max] spine crossed with every observed series:
        # each series is filled over the same queried range (Flux range()
        # applies to the whole query, not per series)
        spine = spine.crossJoin(agg.select(*keys).distinct())
    return spine.join(agg, ["bucket", *keys], "left").select(
        "bucket",
        *keys,
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
    )


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    fine: str = "hour",
    coarse: str = "day",
) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: the coarse rollup
    is RE-AGGREGATED from the fine rollup's partials (count/sum/min/max
    are associative), never from raw rows.

    At 100 TB this is the whole point of a rollup hierarchy: the daily
    query aggregates |days×keys×24| tiny rows instead of rescanning the
    raw table; materialize the fine level once (write it as a bucket
    table) and every coarser resolution derives from it.
    """
    fine_agg = df.groupBy(
        F.date_trunc(fine, F.col(ts_col)).alias("__fine"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(value_col)).alias("__sum"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    return (
        fine_agg.groupBy(F.date_trunc(coarse, F.col("__fine")).alias("bucket"), *keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("__sum").alias("__sum"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(
            "bucket",
            *keys,
            "n",
            (F.col("__sum").cast("double") / F.col("n")).alias("avg_value"),
            "min_value",
            "max_value",
        )
    )


def gap_fill_interpolated(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str = "5 minutes",
    window_seconds: int = 300,
    keys: list[str] | None = None,
) -> DataFrame:
    """Gap-fill with LINEAR INTERPOLATION: empty buckets get a value on
    the straight line between the nearest observed buckets (NULL at the
    edges where only one side exists) — Flux's ``interpolate.linear``
    counterpart to `gap_fill`'s createEmpty. ``keys`` interpolates each
    series independently (per-``_field``, the Flux per-table semantics).

    Shape: the spine join from `gap_fill`, then two window passes over
    the (tiny) bucket series: carry the previous/next observed (bucket,
    value) as atomic structs and weight by bucket distance. The windows
    are PARTITIONED BY the series keys, so state per task is one series'
    spine — rows = time-range/step per series, independent of raw
    volume, and the single-partition window of the keyless form never
    appears at scale."""
    keys = list(keys or [])
    filled = gap_fill(df, ts_col, value_col, window, window_seconds, keys)
    obs = F.when(
        F.col("n_events") > 0, F.struct(F.col("bucket"), F.col("avg_value"))
    )
    w_prev = (
        Window.partitionBy(*keys).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the forward carry runs on the REVERSED order with a RUNNING frame:
    # first(... ignorenulls) over [current, unboundedFollowing] makes
    # Spark re-scan to the partition end for EVERY row
    # (UnboundedFollowingWindowFunctionFrame is O(n²) per partition —
    # measured 40 s for a 43 k-row spine); last(...) over the reversed
    # running frame is the same row set evaluated incrementally, O(n).
    # Buckets are unique per series, so the reversal is exact.
    w_next = (
        Window.partitionBy(*keys).orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.last(obs, ignorenulls=True).over(w_next)
    span = F.unix_micros(nxt["bucket"]) - F.unix_micros(prev["bucket"])
    pos = F.unix_micros(F.col("bucket")) - F.unix_micros(prev["bucket"])
    interp = prev["avg_value"] + F.try_divide(
        (nxt["avg_value"] - prev["avg_value"]) * pos, span
    )
    return filled.select(
        "bucket",
        *keys,
        "n_events",
        "avg_value",
        F.when(F.col("n_events") > 0, F.col("avg_value"))
        .otherwise(interp)
        .alias("interp_value"),
    )


def rate(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
) -> DataFrame:
    """Per-sample rate of change of a (possibly resetting) counter —
    the PromQL ``rate()`` semantics restated per consecutive pair:
    delta = v - lag(v), except on a counter RESET (negative delta) the
    raw value is the increase since the reset. First sample per series
    has no predecessor → NULL rate.

    One shuffle (window partition); lag is O(1) state per row.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(value_col))
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    delta = F.when(F.col(value_col) >= prev_v, F.col(value_col) - prev_v).otherwise(
        F.col(value_col)  # reset: counter restarted from ~0
    )
    secs = (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_t)) / 1_000_000.0
    return df.select(
        *keys,
        F.col(ts_col),
        F.col(value_col),
        F.try_divide(delta, secs).alias("rate_per_s"),
    )


def decimate_minmax(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    window: str = "15 minutes",
) -> DataFrame:
    """Rendering decimation: per series per bucket keep only the min
    and max samples — what a dashboard needs to draw an envelope
    without shipping every point (the reference's Grafana panels cap at
    ~1.4k points per panel, BASELINE.md 'rendered points'). Output is
    ≤ 2 rows per (series, bucket) regardless of input density.
    """
    agg = df.groupBy(F.window(ts_col, window).alias("w"), *keys).agg(
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    return agg.select(
        F.col("w.start").alias("bucket"), *keys, "min_value", "max_value", "n_raw"
    )


def rolling_stats(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    n_rows: int = 5,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-series rolling mean / sample stddev over the trailing
    ``n_rows`` observations, plus the z-score anomaly flag — the sensor
    drift / spike detector the reference's Grafana panels eyeball
    manually.

    One shuffle (the window partition); the frame is row-bounded so
    state per row is O(n_rows) regardless of series length.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col(value_col))
        .rowsBetween(-(n_rows - 1), 0)
    )
    mean = F.avg(F.col(value_col)).over(w)
    sd = F.stddev_samp(F.col(value_col)).over(w)
    z = F.try_divide(F.col(value_col) - mean, sd)
    return df.select(
        *keys,
        F.col(ts_col),
        F.col(value_col),
        mean.alias("roll_mean"),
        sd.alias("roll_std"),
        z.alias("zscore"),
        (F.abs(z) > z_threshold).alias("is_anomaly"),
    )


def ewma(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    alpha: float = 0.3,
) -> DataFrame:
    """Exponentially weighted moving average per series.

    EWMA is inherently sequential (each value depends on the full
    prefix), and the closed-form rewrite over a cumulative sum needs
    (1-α)^(-rank) factors that overflow doubles on long series — so
    this is the sanctioned Arrow escape hatch: ``applyInPandas`` per
    key, ``pandas.Series.ewm`` inside (vectorized C, one pass).

    Scale: one shuffle on the series key; each task holds one series'
    Arrow batches. Matches ``ewm(adjust=False)`` semantics:
    y_0 = x_0; y_t = α·x_t + (1-α)·y_{t-1}.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    cols = [*keys, ts_col, value_col]
    narrowed = df.select(*cols)
    # Output schema derives from the INPUT dtypes (key/ts/value columns
    # pass through unchanged) — a hardcoded `string`/`double` schema
    # would silently cast non-string keys.
    out_schema = StructType(
        [narrowed.schema[c] for c in cols] + [StructField("ewma", DoubleType())]
    )

    def _ewm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col])
        pdf["ewma"] = pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return narrowed.groupBy(*keys).applyInPandas(_ewm, schema=out_schema)


def flux_ema(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    n: int,
) -> DataFrame:
    """Flux ``exponentialMovingAverage(n:)`` semantics: the first
    emitted point (at row n of each series, (ts, value) order) is the
    algebraic mean of the first n values; every later point is
    y = (1−k)·y_prev + k·x with k = 2/(n+1); the first n−1 rows are
    dropped and series shorter than n emit nothing.

    Sequential recurrence → the same sanctioned Arrow escape hatch as
    ``ewma`` above (one shuffle on the series key, one pass per
    series), but with an explicit left-fold loop instead of
    ``pandas.ewm``: the seed mean is a left-to-right double sum ÷ n and
    each step evaluates exactly ``(1.0 − k)·acc + k·x`` — the same
    expression order DuckDB's ``list_reduce`` replay uses, so every
    output value is bit-identical to the SQL oracle (pandas' ewm
    divides by (old_wt + new_wt), which need not be exactly 1.0).

    ``__seq`` is the per-series sequence number in table order: a
    downstream last() selects max_by(__seq) — the fold's true final
    element, which a (ts, value) max_by could miss on a tied final
    timestamp.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cols = [*keys, ts_col]
    narrowed = df.select(*cols, F.col(value_col).cast("double").alias(value_col))
    out_schema = StructType(
        [narrowed.schema[c] for c in cols]
        + [StructField(value_col, DoubleType()), StructField("__seq", LongType())]
    )
    k = 2.0 / (n + 1.0)
    omk = 1.0 - k

    def _ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col])
        xs = pdf[value_col].to_numpy(dtype="float64")
        if len(xs) < n:
            return pdf.iloc[0:0].assign(__seq=pd.Series(dtype="int64"))
        acc = xs[0]
        for x in xs[1:n]:
            acc = acc + x
        acc = acc / n
        out = [acc]
        for x in xs[n:]:
            acc = omk * acc + k * x
            out.append(acc)
        kept = pdf.iloc[n - 1 :].copy()
        kept[value_col] = out
        kept["__seq"] = range(len(out))
        return kept

    return narrowed.groupBy(*keys).applyInPandas(_ema, schema=out_schema)


def flux_etma(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    n_us: int,
) -> DataFrame:
    """Flux ``exponentialTimeMovingAverage(n:)`` — the time-decayed
    EMA for irregularly-sampled series (the last upstream
    ``movingAverage``-family member, round 13): per series in
    (ts, value) order, the first point seeds y₁ = v₁ and IS emitted
    (``n`` is a duration, not a warm-up count — no rows drop, unlike
    ``exponentialMovingAverage``); every later point emits
    ``y = w·y_prev + (1−w)·v`` with ``w = n_us / (n_us + Δt_us)``,
    Δt the integer-µs gap to the previous point.

    ONE pinned deviation (MIGRATION.md divergence list): upstream
    weights the previous average by ``exp(−Δt/n)``; libm ``exp`` is
    not bit-replayable across engines, so this engine pins the
    rational first-order Padé form ``n/(n + Δt)`` — the same
    pinned-replayable-constant precedent as holtWinters' dyadic
    smoothing constants. Both decay monotonically from 1 at Δt = 0
    (a tied timestamp contributes zero weight in either convention)
    and agree to O((Δt/n)²) for gaps short against n.

    Replay contract: ``w`` is one exact-operand double division
    (n_us and the summed denominator are integers < 2⁵³, so Python's
    correctly-rounded int÷int equals IEEE double division) and the
    step is exactly ``w·acc + (1.0−w)·x`` — the same expression tree
    the DuckDB recursive-CTE oracle walks, so every output value is
    bit-identical to the SQL replay. Sequential recurrence → the
    sanctioned Arrow escape hatch (one shuffle on the series key, one
    pass per series, one (acc, prev_t) pair of running state).
    ``__seq`` serves a downstream last() exactly as in ``flux_ema``.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cols = [*keys, ts_col]
    narrowed = df.select(*cols, F.col(value_col).cast("double").alias(value_col))
    out_schema = StructType(
        [narrowed.schema[c] for c in cols]
        + [StructField(value_col, DoubleType()), StructField("__seq", LongType())]
    )
    n_us = int(n_us)

    def _etma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col])
        t_us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        xs = pdf[value_col].to_numpy(dtype="float64")
        out = []
        acc = 0.0
        prev_t = 0
        for i in range(len(xs)):
            x = float(xs[i])
            t = int(t_us[i])
            if i == 0:
                acc = x
            else:
                w = n_us / (n_us + (t - prev_t))
                acc = w * acc + (1.0 - w) * x
            out.append(acc)
            prev_t = t
        kept = pdf.copy()
        kept[value_col] = out
        kept["__seq"] = range(len(out))
        return kept

    return narrowed.groupBy(*keys).applyInPandas(_etma, schema=out_schema)


def _flux_ema_fold(xs, n: int, k: float, omk: float):
    """The shared EMA fold every chained-EMA kernel composes from
    (flux_ema_chain, flux_trix): seed = left-to-right sum of the first
    n values ÷ n, then acc = omk·acc + k·x — the exact expression
    order the DuckDB recursive-CTE oracles replay. None when the
    series is shorter than n. ONE implementation: a seed/step change
    here reaches every kernel in the family at once (review r11b)."""
    if xs is None or len(xs) < n:
        return None
    acc = xs[0]
    for x in xs[1:n]:
        acc = acc + x
    acc = acc / n
    out = [acc]
    for x in xs[n:]:
        acc = omk * acc + k * x
        out.append(acc)
    return out


def flux_ema_chain(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    n: int,
    level: int,
) -> DataFrame:
    """Flux ``doubleEMA(n:)`` / ``tripleEMA(n:)``: DEMA = 2·e1 − e2 and
    TEMA = 3·e1 − 3·e2 + e3, where e1 = EMA_n(x), e2 = EMA_n(e1),
    e3 = EMA_n(e2) — exactly the chained-EMA composition upstream Flux
    builds them from, so each chaining level drops a further n−1 rows
    (DEMA emits from row 2(n−1), TEMA from 3(n−1); shorter series emit
    nothing).

    Same sanctioned Arrow escape hatch and the same bit-parity
    discipline as ``flux_ema``: every fold seeds with a left-to-right
    double sum ÷ n and steps ``(1−k)·acc + k·x``, and the combination
    is evaluated ``2.0·a − b`` / ``3.0·a − 3.0·b + c`` — the exact
    expression order the DuckDB oracle replays (recursive CTE +
    list_reduce), so outputs are bit-identical. ``__seq`` serves the
    downstream last() exactly as in ``flux_ema``.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if level not in (2, 3):
        raise ValueError(f"flux_ema_chain level must be 2 or 3, got {level}")
    cols = [*keys, ts_col]
    narrowed = df.select(*cols, F.col(value_col).cast("double").alias(value_col))
    out_schema = StructType(
        [narrowed.schema[c] for c in cols]
        + [StructField(value_col, DoubleType()), StructField("__seq", LongType())]
    )
    k = 2.0 / (n + 1.0)
    omk = 1.0 - k

    def _fold(xs):
        return _flux_ema_fold(xs, n, k, omk)

    def _chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col])
        xs = [float(x) for x in pdf[value_col].to_numpy(dtype="float64")]
        e1 = _fold(xs)
        e2 = _fold(e1) if e1 is not None else None
        if e2 is None:
            return pdf.iloc[0:0].assign(__seq=pd.Series(dtype="int64"))
        if level == 2:
            vals = [2.0 * a - b for a, b in zip(e1[n - 1 :], e2)]
            drop = 2 * (n - 1)
        else:
            e3 = _fold(e2)
            if e3 is None:
                return pdf.iloc[0:0].assign(__seq=pd.Series(dtype="int64"))
            vals = [
                3.0 * a - 3.0 * b + c
                for a, b, c in zip(e1[2 * (n - 1) :], e2[n - 1 :], e3)
            ]
            drop = 3 * (n - 1)
        kept = pdf.iloc[drop:].copy()
        kept[value_col] = vals
        kept["__seq"] = range(len(vals))
        return kept

    return narrowed.groupBy(*keys).applyInPandas(_chain, schema=out_schema)


def flux_rsi(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    n: int,
) -> DataFrame:
    """Flux ``relativeStrengthIndex(n:)`` — Wilder's RSI, the
    definition upstream's technical-indicator family uses: the average
    gain/loss over the first n deltas seeds the recurrence, each later
    step smooths ``avg = (avg·(n−1) + move)/n``, and
    ``RSI = 100 − 100/(1 + avgGain/avgLoss)`` (100 where avgLoss is 0
    — a pure up-trend). Emission starts once n deltas exist: the first
    n rows of each table are dropped; shorter series emit nothing.

    Sequential recurrence → the sanctioned Arrow per-series kernel.
    Bit-parity discipline as ``flux_ema``: the seed is a left-to-right
    sum of ``max(Δ, 0)`` / ``max(−Δ, 0)`` divided by n, and every step
    is evaluated in exactly the expression order the DuckDB recursive
    CTE replays, so outputs are bit-identical.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cols = [*keys, ts_col]
    narrowed = df.select(*cols, F.col(value_col).cast("double").alias(value_col))
    out_schema = StructType(
        [narrowed.schema[c] for c in cols]
        + [StructField(value_col, DoubleType()), StructField("__seq", LongType())]
    )

    def _rsi(au: float, ad: float) -> float:
        if ad == 0.0:
            return 100.0
        return 100.0 - 100.0 / (1.0 + au / ad)

    def _f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col])
        xs = [float(x) for x in pdf[value_col].to_numpy(dtype="float64")]
        if len(xs) < n + 1:
            return pdf.iloc[0:0].assign(__seq=pd.Series(dtype="int64"))
        au = 0.0
        ad = 0.0
        for i in range(1, n + 1):
            d = xs[i] - xs[i - 1]
            if d > 0.0:
                au = au + d
            elif d < 0.0:
                ad = ad + (-d)
        au = au / n
        ad = ad / n
        out = [_rsi(au, ad)]
        for i in range(n + 1, len(xs)):
            d = xs[i] - xs[i - 1]
            u = d if d > 0.0 else 0.0
            v = -d if d < 0.0 else 0.0
            au = (au * (n - 1.0) + u) / n
            ad = (ad * (n - 1.0) + v) / n
            out.append(_rsi(au, ad))
        kept = pdf.iloc[n:].copy()
        kept[value_col] = out
        kept["__seq"] = range(len(out))
        return kept

    return narrowed.groupBy(*keys).applyInPandas(_f, schema=out_schema)


def flux_trix(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    n: int,
) -> DataFrame:
    """Flux ``tripleExponentialDerivative(n:)`` — TRIX: the one-lag
    percent derivative of the thrice-smoothed EMA chain. e3 =
    EMA_n(EMA_n(EMA_n(x))) with ``flux_ema``'s seed/drop rule at each
    level (e3 emits from row 3(n−1), 0-based), and
    TRIX_t = (e3_t − e3_{t−1}) / e3_{t−1} · 100 — the derivative needs
    a previous e3, so emission starts at row 3(n−1)+1 = 3n−2; series
    shorter than 3n−1 points emit nothing. The emission offset follows
    mechanically from the chained-EMA composition upstream builds the
    indicator from (tripleEMA's 3(n−1) plus one lag).

    Same sanctioned Arrow escape hatch and bit-parity discipline as
    ``flux_ema_chain``: every fold is the SHARED ``_flux_ema_fold``
    (left-to-right double seed sum ÷ n, ``(1−k)·acc + k·x`` steps);
    the derivative is evaluated ``(a − b) / b · 100.0`` — the exact
    expression order the DuckDB oracle replays, so outputs are
    bit-identical. A zero previous e3 (e.g. an all-zero idle series)
    yields NULL — pinned explicitly on both sides because float x/0
    is engine-dependent (Go +Inf/NaN, DuckDB NULL, Python raises;
    the cmo zero-denominator precedent). ``__seq`` serves a
    downstream last() exactly as in ``flux_ema``.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cols = [*keys, ts_col]
    narrowed = df.select(*cols, F.col(value_col).cast("double").alias(value_col))
    out_schema = StructType(
        [narrowed.schema[c] for c in cols]
        + [StructField(value_col, DoubleType()), StructField("__seq", LongType())]
    )
    k = 2.0 / (n + 1.0)
    omk = 1.0 - k

    def _f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col])
        xs = [float(x) for x in pdf[value_col].to_numpy(dtype="float64")]
        e3 = _flux_ema_fold(
            _flux_ema_fold(_flux_ema_fold(xs, n, k, omk), n, k, omk),
            n, k, omk,
        )
        if e3 is None or len(e3) < 2:
            return pdf.iloc[0:0].assign(__seq=pd.Series(dtype="int64"))
        vals = [
            None if b == 0.0 else (a - b) / b * 100.0
            for b, a in zip(e3, e3[1:])
        ]
        kept = pdf.iloc[3 * (n - 1) + 1 :].copy()
        # nullable Float64 extension array: a None stays a true NULL
        # through Arrow (a float64 ndarray would coerce it to NaN)
        kept[value_col] = pd.array(vals, dtype="Float64")
        kept["__seq"] = range(len(vals))
        return kept

    return narrowed.groupBy(*keys).applyInPandas(_f, schema=out_schema)


def flux_kama(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    n: int,
) -> DataFrame:
    """Flux ``kaufmansAMA(n:)`` — Kaufman's Adaptive Moving Average:
    the published KAMA recurrence with the fixed fast/slow smoothing
    periods (2, 30) upstream hard-codes. Per step t:

        ER  = |x_t − x_{t−n}| / Σ_{i=t−n+1..t} |x_i − x_{i−1}|
              (0 when the denominator is 0 — a flat window; the output
              is prev either way, so the pin is unobservable there)
        sc  = (ER·(2/(2+1) − 2/(30+1)) + 2/(30+1))²
        AMA = (x_t − AMA_prev)·sc + AMA_prev

    SEED CONVENTION (pinned + documented, the holtWinters-constants
    precedent): AMA seeds with the IDENTITY value at the row before
    first emission (AMA_{n−1} = x_{n−1}) and emits from row n
    (0-based) — the first row with a full n-delta window, the same
    emission offset as relativeStrengthIndex. Published KAMA
    implementations differ only in this seed; the difference decays
    geometrically (every step multiplies it by 1−sc) and the pinned
    form replays exactly in the DuckDB recursive-CTE oracle. Series
    shorter than n+1 points emit nothing.

    Bit-parity discipline as ``flux_ema``: the ER numerator/denominator
    are left-to-right double folds over the trailing window
    (recomputed per step — n is a dashboard constant, and a running
    add/subtract sum would drift from the oracle's fresh fold), sc is
    an explicit ``m·m``, and the step is ``(x − prev)·sc + prev``.
    ``__seq`` serves a downstream last() exactly as in ``flux_ema``.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cols = [*keys, ts_col]
    narrowed = df.select(*cols, F.col(value_col).cast("double").alias(value_col))
    out_schema = StructType(
        [narrowed.schema[c] for c in cols]
        + [StructField(value_col, DoubleType()), StructField("__seq", LongType())]
    )
    c_fast_slow = 2.0 / 3.0 - 2.0 / 31.0
    c_slow = 2.0 / 31.0

    def _f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col])
        xs = [float(x) for x in pdf[value_col].to_numpy(dtype="float64")]
        if len(xs) < n + 1:
            return pdf.iloc[0:0].assign(__seq=pd.Series(dtype="int64"))
        prev = xs[n - 1]
        out = []
        for t in range(n, len(xs)):
            dsum = 0.0
            for i in range(t - n + 1, t + 1):
                dsum = dsum + abs(xs[i] - xs[i - 1])
            num = abs(xs[t] - xs[t - n])
            er = 0.0 if dsum == 0.0 else num / dsum
            m = er * c_fast_slow + c_slow
            prev = (xs[t] - prev) * (m * m) + prev
            out.append(prev)
        kept = pdf.iloc[n:].copy()
        kept[value_col] = out
        kept["__seq"] = range(len(out))
        return kept

    return narrowed.groupBy(*keys).applyInPandas(_f, schema=out_schema)


def last_value_per_group(
    df: DataFrame, ts_col: str, value_col: str, keys: list[str]
) -> DataFrame:
    """Latest reading per group (the reference's Grafana gauge panels,
    SURVEY.md §2.5 A4). Deterministic under ts ties via value tiebreak."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc(), F.col(value_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*keys, F.col(ts_col).alias("last_ts"), F.col(value_col).alias("last_value"))
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Robust per-series outlier detection via the median absolute
    deviation: a point is an outlier when |v - median| > k · 1.4826 ·
    MAD (1.4826 scales MAD to σ under normality — Hampel's rule).
    Unlike the rolling z-score, median/MAD do not move when the
    outliers themselves are extreme, so a single huge spike can't mask
    its neighbors.

    Returns one row per series: n_points, median_value, mad,
    n_outliers, outlier_frac.

    Shape: two grouped exact-median aggregations over the same
    shuffle key plus two broadcast joins of per-key scalars back onto
    the stream — the fact table shuffles on the series key (it must:
    exact medians are holistic), never on anything wider, and the
    second pass reuses the same partitioning. Null values are excluded
    up front (a null would poison abs-dev comparisons). The
    median/MAD scalars are rounded to 6 dp BEFORE the comparison so
    the classification is replayable bit-for-bit by the SQL oracle
    (both engines compare against the identical rounded cutoff).
    """
    v = df.filter(F.col(value_col).isNotNull()).select(*keys, value_col)
    med = v.groupBy(*keys).agg(
        F.round(F.median(value_col), 6).alias("median_value")
    )
    dev = v.join(F.broadcast(med), keys).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("median_value"))
    )
    mad = dev.groupBy(*keys).agg(
        F.round(F.median("__adev"), 6).alias("mad"),
    )
    cutoff = F.round(F.lit(k) * F.lit(1.4826) * F.col("mad"), 6)
    return (
        dev.join(F.broadcast(mad), keys)
        .groupBy(*keys, "median_value", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum((F.col("__adev") > cutoff).cast("long")).alias("n_outliers"),
        )
        .select(
            *keys,
            "n_points",
            "median_value",
            "mad",
            "n_outliers",
            (F.col("n_outliers").cast("double") / F.col("n_points")).alias(
                "outlier_frac"
            ),
        )
    )


def resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    unit: str = "hour",
) -> DataFrame:
    """Calendar-unit downsample via date_trunc (vs window(): anchored to
    calendar boundaries, supports month/quarter units too)."""
    return (
        df.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("bucket"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_dec(value_col)).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def histogram(
    df: DataFrame,
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    bins: int = 20,
) -> DataFrame:
    """Equi-width histogram per key group over a shared global [min,max]
    domain (shared bins make the per-group distributions comparable —
    the Grafana histogram-panel semantics).

    Two linear passes: a 1-row min/max aggregate broadcast back onto the
    scan, then one hash-agg on (keys, bin). Bin assignment is pure
    arithmetic (floor((v-lo)/(hi-lo)*bins) clamped to [0, bins-1]) —
    exact-replayable, no UDF. ~2B+bins rows ever shuffle per group.

    NULL values are excluded up front (matching linear_trend /
    time_weighted_avg / counter_increase): without the filter,
    floor(NULL) → greatest/least collapse to bin 0 and silently inflate
    the lowest bin."""
    df = df.filter(F.col(value_col).isNotNull())
    stats = df.agg(
        F.min(F.col(value_col).cast("double")).alias("__lo"),
        F.max(F.col(value_col).cast("double")).alias("__hi"),
    )
    j = df.crossJoin(F.broadcast(stats))
    v = F.col(value_col).cast("double")
    bin_ = (
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (v - F.col("__lo"))
                        / (F.col("__hi") - F.col("__lo"))
                        * F.lit(bins)
                    ).cast("int"),
                ),
            )
        )
        .cast("long")
    )
    return (
        j.withColumn("bin", bin_)
        .groupBy(*keys, "bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("__lo"), 9).alias("domain_lo"),
            F.round(F.first("__hi"), 9).alias("domain_hi"),
        )
    )


def linear_trend(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    base_epoch_s: int = 1_704_067_200,
) -> DataFrame:
    """Per-group least-squares linear trend (slope per second +
    intercept) via the closed-form normal equations — the Flux
    `derivative`/trend-line panel as one distributed aggregate.

    Determinism policy: all five sufficient statistics (n, Σx, Σx², Σy,
    Σxy) are EXACT — x is integer seconds rebased to a fixed epoch so
    x² fits a BIGINT, y is the lossless DECIMAL(18,2) cast — and the
    closed form is evaluated on doubles in one fixed expression shape,
    so both engines emit bit-identical slopes before the final 12-dp
    rounding. One map-side-combined hash-agg; no window, no second pass.
    """
    x = F.expr(f"unix_micros({ts_col}) DIV 1000000") - F.lit(base_epoch_s)
    y = F.col(value_col).cast("decimal(18,2)")
    g = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *keys,
            x.alias("__x"),
            y.alias("__y"),
        )
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n"),
            # every Σ is decimal so none can wrap at petabyte row counts
            # (a BIGINT Σx overflows near 1e15 rows × 1e7 s offsets, and
            # raises under Spark 4 ANSI mode)
            F.sum(F.col("__x").cast("decimal(30,0)")).alias("__sx"),
            # x*x fits a BIGINT per row (rebased seconds), but the SUM is
            # decimal so it cannot wrap at petabyte row counts
            F.sum((F.col("__x") * F.col("__x")).cast("decimal(38,0)")).alias("__sxx"),
            F.sum("__y").alias("__sy"),
            F.sum(F.col("__x").cast("decimal(12,0)") * F.col("__y")).alias("__sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return g.select(
        *keys,
        "n",
        F.round(slope, 12).alias("slope_per_s"),
        F.round((sy - slope * sx) / nd, 12).alias("intercept"),
    )


def merge_intervals(
    df: DataFrame,
    ts_col: str = "ts",
    duration_us: Column | None = None,
    keys: Sequence[str] = ("user_id",),
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Temporal interval coalescing: each row projects an interval
    [ts, ts + duration); overlapping/touching intervals per key merge
    into maximal islands. With VARIABLE durations this is genuine
    interval algebra (a long interval can bridge rows a fixed-gap
    sessionization would split) — the classic gaps-and-islands
    computation, used for availability windows, incident merging, and
    effective-coverage spans.

    Shape: two window passes + one hash-agg, all partitioned by the
    keys — a single shuffle at scale. All arithmetic is exact integer
    microseconds; a new island starts where the running max of prior
    interval ends is < the current start (strictly — touching
    intervals merge).
    """
    if duration_us is None:
        duration_us = F.lit(300_000_000)
    us = F.unix_micros(F.col(ts_col))
    base = df.select(
        *keys,
        F.col(tiebreak_col).alias("__tb"),
        us.alias("__us"),
        (us + duration_us).alias("__end"),
    )
    w = Window.partitionBy(*keys).orderBy("__us", "__tb")
    prev_max_end = F.max("__end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = prev_max_end.isNull() | (F.col("__us") > prev_max_end)
    island = (
        F.sum(new_island.cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
    )
    return (
        base.withColumn("island", island)
        .groupBy(*keys, "island")
        .agg(
            F.timestamp_micros(F.min("__us")).alias("interval_start"),
            F.timestamp_micros(F.max("__end")).alias("interval_end"),
            F.count("*").alias("n_events"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Flux ``timeWeightedAvg()`` / ``integral()``: the trapezoid-rule
    time integral of each series divided by its observed span — the
    correct mean for irregularly-sampled gauges, where the plain AVG
    over-weights densely-sampled stretches.

    Determinism: the trapezoid sum Σ (y_i + y_{i+1})·Δt_i is EXACT —
    values are lossless DECIMAL(18,2), Δt is integer microseconds cast
    DECIMAL(14,0) (< 3 years), products stay inside DECIMAL(38,2) — and
    the single closing division runs on doubles in one fixed shape.
    One window pass + one hash-agg on the same partition keys = one
    shuffle.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tiebreak_col))
    us = F.unix_micros(F.col(ts_col))
    y = _dec(value_col)
    nxt_y = F.lead(y).over(w)
    nxt_us = F.lead(us).over(w)
    seg = ((y + nxt_y) * (nxt_us - us).cast("decimal(14,0)")).alias("__seg")
    g = (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, us.alias("__us"), seg)
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n"),
            F.sum("__seg").alias("__trap"),
            (F.max("__us") - F.min("__us")).alias("__span"),
        )
    )
    twa = F.when(
        F.col("__span") > 0,
        F.round(
            F.col("__trap").cast("double")
            / (F.lit(2.0) * F.col("__span").cast("double")),
            9,
        ),
    )
    return g.select(*keys, "n", twa.alias("time_weighted_avg"))


def counter_increase(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Flux ``increase()``: total monotonic increase of a counter per
    series, reset-aware — negative deltas (counter restarts) contribute
    the post-reset value, matching `rate`'s reset rule. Exact decimal
    arithmetic end to end; one window pass + one hash-agg, one shuffle."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tiebreak_col))
    y = _dec(value_col)
    prev = F.lag(y).over(w)
    delta = F.when(prev.isNull(), F.lit(0).cast("decimal(18,2)")).otherwise(
        F.when(y >= prev, y - prev).otherwise(y)
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, delta.alias("__d"))
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n"),
            F.sum("__d").cast("double").alias("total_increase"),
        )
    )


def triangle_decimate(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    n_out: int = 50,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Largest-triangle bucket downsampling with bucket-mean anchors —
    the mean-anchor variant of Steinarsson's LTTB (the Grafana
    downsampler): split each series' interior points into ``n_out − 2``
    equal-count index buckets, and keep from each bucket the point
    forming the largest triangle with the NEIGHBORING BUCKETS' mean
    points (first/last points always kept). Unlike canonical LTTB the
    anchor is the previous bucket's MEAN, not the previously SELECTED
    point — that one change removes the sequential dependency, so the
    whole operator is plain Catalyst (two windows + one aggregate + one
    co-keyed join: ONE shuffle key family, no UDF, no per-series loop)
    and is exactly SQL-replayable. Visual fidelity is equivalent for
    dashboard rendering: the triangle criterion still favors extrema
    over midpoints.

    Determinism: x = epoch µs (exact in a double), ȳ from lossless
    DECIMAL(18,2) sums, areas in one fixed double expression, argmax
    ties broken by point order. Requires every (keys) series to have
    more than ``n_out`` points (the registered corpus does; pre-filter
    short series otherwise).

    Output: the selected points (keys, bucket, ts, value) with bucket
    −1/−2 marking the always-kept first/last points.
    """
    kcols = [F.col(k) for k in keys]
    w = Window.partitionBy(*kcols).orderBy(ts_col, value_col, tiebreak_col)
    us = F.unix_micros(F.col(ts_col))
    pts = df.select(
        *kcols,
        F.col(ts_col),
        F.col(value_col),
        F.col(tiebreak_col),
        us.alias("__x"),
        F.row_number().over(w).alias("__i"),
        F.count("*").over(Window.partitionBy(*kcols)).alias("__n"),
    )
    mid = pts.filter((F.col("__i") > 1) & (F.col("__i") < F.col("__n")))
    bucket = F.floor(
        (F.col("__i") - 2) * F.lit(n_out - 2) / (F.col("__n") - 2)
    ).cast("long")
    mid = mid.withColumn("__b", bucket)
    means = mid.groupBy(*keys, "__b").agg(
        (
            F.sum(F.col("__x").cast("decimal(30,0)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__mx"),
        (
            F.sum(_dec(value_col)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__my"),
    )
    # anchors: previous/next bucket mean; the edge buckets anchor on the
    # series' first/last raw points
    wb = Window.partitionBy(*keys).orderBy("__b")
    ends = pts.filter((F.col("__i") == 1) | (F.col("__i") == F.col("__n"))).select(
        *keys,
        F.when(F.col("__i") == 1, F.lit("first")).otherwise(F.lit("last")).alias(
            "__which"
        ),
        F.col("__x").cast("double").alias("__ex"),
        F.col(value_col).cast("double").alias("__ey"),
    )
    first = ends.filter(F.col("__which") == "first").select(
        *keys, F.col("__ex").alias("__fx"), F.col("__ey").alias("__fy")
    )
    last = ends.filter(F.col("__which") == "last").select(
        *keys, F.col("__ex").alias("__lx"), F.col("__ey").alias("__ly")
    )
    anch = (
        means.withColumn("__px", F.lag("__mx").over(wb))
        .withColumn("__py", F.lag("__my").over(wb))
        .withColumn("__nx", F.lead("__mx").over(wb))
        .withColumn("__ny", F.lead("__my").over(wb))
        .join(F.broadcast(first), list(keys))
        .join(F.broadcast(last), list(keys))
        .select(
            *keys,
            "__b",
            F.coalesce("__px", "__fx").alias("__px"),
            F.coalesce("__py", "__fy").alias("__py"),
            F.coalesce("__nx", "__lx").alias("__nx"),
            F.coalesce("__ny", "__ly").alias("__ny"),
        )
    )
    x = F.col("__x").cast("double")
    y = F.col(value_col).cast("double")
    area = F.abs(
        (F.col("__px") - F.col("__nx")) * (y - F.col("__py"))
        - (F.col("__px") - x) * (F.col("__ny") - F.col("__py"))
    )
    ws = Window.partitionBy(*keys, "__b").orderBy(
        F.col("__area").desc(), "__i"
    )
    chosen = (
        mid.join(anch, [*keys, "__b"])
        .withColumn("__area", area)
        .withColumn("__r", F.row_number().over(ws))
        .filter(F.col("__r") == 1)
        .select(*keys, F.col("__b").alias("bucket"), ts_col, value_col)
    )
    kept_ends = pts.filter(
        (F.col("__i") == 1) | (F.col("__i") == F.col("__n"))
    ).select(
        *keys,
        F.when(F.col("__i") == 1, F.lit(-1)).otherwise(F.lit(-2))
        .cast("long")
        .alias("bucket"),
        F.col(ts_col),
        F.col(value_col),
    )
    return chosen.unionByName(kept_ends)


def triangle_decimate_sequential(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    n_out: int = 50,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """CANONICAL LTTB (Steinarsson 2013, public thesis algorithm): the
    triangle anchor is the previously SELECTED point, giving the exact
    published output. The previous-selection dependency makes each
    series inherently sequential, so this runs as an Arrow-batched
    applyInPandas kernel — one task per series group, numpy inside
    (the sanctioned boundary for sequential per-series recurrences,
    like the per-row EWMA). For a Catalyst-only, hash-verifiable
    shape use `triangle_decimate` (bucket-mean anchors); both share
    identical bucket boundaries. Dashboards at scale decimate AFTER a
    per-series time-range scan, so the per-task series is panel-sized,
    not corpus-sized.

    Output: (keys, bucket, ts, value); bucket −1/−2 = first/last.
    """
    import pandas as pd

    key_list = list(keys)
    sample = df.select(ts_col).schema[ts_col].dataType.simpleString()
    out_schema = ", ".join(
        [f"`{k}` string" for k in key_list]
        + ["bucket long", f"`{ts_col}` {sample}", f"`{value_col}` double"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [ts_col, value_col, tiebreak_col], kind="mergesort"
        ).reset_index(drop=True)
        n = len(pdf)
        kvals = [str(pdf[k].iloc[0]) for k in key_list]
        if n <= n_out:
            return pd.DataFrame(
                {
                    **{k: kvals[i] for i, k in enumerate(key_list)},
                    "bucket": range(n),
                    ts_col: pdf[ts_col],
                    value_col: pdf[value_col].astype(float),
                }
            )
        xs = pdf[ts_col].astype("int64").to_numpy().astype("float64")
        ys = pdf[value_col].to_numpy().astype("float64")
        nb = n_out - 2
        sel = [0]
        for i in range(nb):
            lo = (i * (n - 2)) // nb + 1
            hi = ((i + 1) * (n - 2)) // nb + 1
            if lo >= hi:
                continue
            if i + 1 < nb:
                nlo = ((i + 1) * (n - 2)) // nb + 1
                nhi = ((i + 2) * (n - 2)) // nb + 1
                ax, ay = xs[nlo:nhi].mean(), ys[nlo:nhi].mean()
            else:
                ax, ay = xs[n - 1], ys[n - 1]
            px, py = xs[sel[-1]], ys[sel[-1]]
            area = abs(
                (px - ax) * (ys[lo:hi] - py) - (px - xs[lo:hi]) * (ay - py)
            )
            sel.append(lo + int(area.argmax()))
        sel.append(n - 1)
        buckets = [-1] + list(range(len(sel) - 2)) + [-2]
        return pd.DataFrame(
            {
                **{k: kvals[i] for i, k in enumerate(key_list)},
                "bucket": buckets,
                ts_col: pdf[ts_col].iloc[sel].to_numpy(),
                value_col: ys[sel],
            }
        )

    return df.groupBy(*key_list).applyInPandas(fn, out_schema)
