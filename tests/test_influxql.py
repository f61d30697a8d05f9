"""InfluxQL front-end: parser boundaries, compile semantics, and the
cross-language pin — the same statement answered by the Flux compiler
and the InfluxQL compiler off the same tagged store must be
bit-identical (both front-ends lower onto the same scan + exact-decimal
aggregate idioms).

The registered influxql_* queries' value correctness is attested by
the DuckDB oracles (tests/test_oracle_parity.py + the driver gate);
this file covers what the oracles cannot: the refusal surface (every
out-of-subset construct raises naming itself), semantic edges (offset
alignment, fill forms, epoch-stamped bare aggregates, per-series
limits), and plan shape (pushdown reaching the scan).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from time_series_data_pipeline_spark.influxql import (
    InfluxQLError,
    compile_influxql,
)
from time_series_data_pipeline_spark.queries.timeseries_q import (
    _tagged_bucket_path,
)

from .conftest import SF_SMOKE

RANGE = "time >= '2024-01-08T00:00:00Z' AND time < '2024-01-15T00:00:00Z'"


@pytest.fixture(scope="module")
def store(spark) -> str:
    return _tagged_bucket_path(spark, SF_SMOKE)


# ---------------------------------------------------------------------------
# refusal surface — every rejection names the construct
# ---------------------------------------------------------------------------

REJECTED = [
    ("SELECT * FROM events", "SELECT \\*"),
    ("SELECT mean(\"click\") FROM events WHERE \"host\" = 'h1' OR \"host\" = 'h2'", "OR"),
    ('SELECT mean("click") FROM events WHERE "host" =~ /h1/', "regex"),
    ('SELECT mean("click") FROM events GROUP BY time(1h) fill(linear)', "linear"),
    ('SELECT integral("click") FROM events WHERE ' + RANGE + ' GROUP BY time(1h)', "attribution"),
    ('SELECT elapsed("click") FROM events WHERE ' + RANGE + ' GROUP BY time(1h)', "raw transform"),
    ('SELECT holt_winters(mean("click"), 10, 4) FROM events', "holt_winters"),
    ('SELECT mean("click") FROM "db"."rp".events', "qualified FROM"),
    ('SELECT mean("click") FROM events WHERE time >= 1704672000000000000', "epoch"),
    ('SELECT mean("click"), mean("error") FROM events GROUP BY time(1h)', "duplicate"),
    ('SELECT mean("click") FROM events GROUP BY "nosuchtag"', "not a tag"),
    ('SELECT mean("click") FROM events WHERE ' + RANGE + ' GROUP BY time(1h) fill(none) SLIMIT 2', "SLIMIT"),
    ('SELECT percentile("click", 95), mean("click") FROM events GROUP BY time(1h)', "combine"),
    ('SELECT derivative(mean("click")) FROM events WHERE ' + RANGE + ' GROUP BY time(1h) fill(0)', "fill"),
    ('SELECT derivative("click") FROM events', "aggregate"),
    ('SELECT mean("click") FROM events WHERE time = \'2024-01-08T00:00:00Z\'', "time ="),
    ("DROP MEASUREMENT events", "unsupported"),
    ('SELECT mean("click") FROM events GROUP BY time(100ms)', "sub-second"),
    ('SELECT top("click", 3) FROM events GROUP BY time(1h)', "GROUP BY time"),
    ('SELECT "click", "error" FROM events', "one raw field"),
    ('SELECT mean("click") FROM events WHERE "click" = 5', "equality"),
    ("SHOW SERIES", "outside the subset"),
    ('SELECT mean("click") FROM events WHERE time >= now() - 7d GROUP BY time(1h)', "now"),
]


@pytest.mark.parametrize("stmt,needle", REJECTED, ids=[n for _, n in REJECTED])
def test_rejections_name_the_construct(spark, store, stmt, needle):
    with pytest.raises(InfluxQLError) as ei:
        compile_influxql(spark, stmt, store)
    import re as _re

    assert _re.search(needle, str(ei.value), _re.IGNORECASE), str(ei.value)


def test_mixed_raw_and_aggregate_rejected(spark, store):
    with pytest.raises(InfluxQLError, match="mixing raw fields"):
        compile_influxql(
            spark, 'SELECT "click", mean("click") FROM events', store
        )


def test_fill_needs_both_bounds(spark, store):
    with pytest.raises(InfluxQLError, match="BOTH time bounds"):
        compile_influxql(
            spark,
            'SELECT mean("click") FROM events WHERE '
            "time >= '2024-01-08T00:00:00Z' GROUP BY time(1h) fill(0)",
            store,
        )


# ---------------------------------------------------------------------------
# the cross-language pin: InfluxQL ≡ Flux off the same store
# ---------------------------------------------------------------------------


def test_influxql_matches_flux_twin(spark, store):
    """The same dashboard question asked in both languages — a
    host-pinned windowed mean split by the remaining tag — must be
    bit-identical: both compile onto the same scan pushdown and the
    same decimal-exact mean expression."""
    from time_series_data_pipeline_spark.flux import compile_flux

    iql = compile_influxql(
        spark,
        'SELECT mean("click") FROM events WHERE "host" = \'h1\' AND '
        + RANGE
        + ' GROUP BY time(6h), "dc" fill(none)',
        store,
    )
    flux = compile_flux(
        spark,
        """
        from(bucket: "tagged")
          |> range(start: "2024-01-08 00:00:00", stop: "2024-01-15 00:00:00")
          |> filter(fn: (r) => r["_measurement"] == "events")
          |> filter(fn: (r) => r["_field"] == "click")
          |> filter(fn: (r) => r["host"] == "h1")
          |> aggregateWindow(every: 6h, fn: mean, createEmpty: false)
        """,
        {"tagged": store},
    )
    got = {
        (r["time"], r["dc"], r["mean"]) for r in iql.collect()
    }
    want = {
        (r["window_start"], r["dc"], r["mean"]) for r in flux.collect()
    }
    assert got == want and got


# ---------------------------------------------------------------------------
# semantic edges
# ---------------------------------------------------------------------------


def test_group_by_time_offset_alignment(spark, store):
    """time(1h, 15m): boundaries shift to :15 — every emitted bucket
    start lands on hh:15 (upstream's offset_interval)."""
    df = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE '
        + RANGE
        + " GROUP BY time(1h, 15m) fill(none)",
        store,
    )
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["time"].minute == 15 and r["time"].second == 0


def test_fill_zero_and_null_spine(spark, store):
    base = (
        'SELECT mean("click") FROM events WHERE "host" = \'h2\' AND '
        "time >= '2024-01-08T00:00:00Z' AND time < '2024-01-09T00:00:00Z' "
        "GROUP BY time(1h) fill({})"
    )
    zero = compile_influxql(spark, base.format("0"), store).collect()
    null = compile_influxql(spark, base.format("null"), store).collect()
    assert len(zero) == 24 and len(null) == 24  # the full day spine
    assert all(r["mean"] is not None for r in zero)
    assert any(r["mean"] is None for r in null)
    z = {r["time"]: r["mean"] for r in zero}
    for r in null:
        assert z[r["time"]] == (r["mean"] if r["mean"] is not None else 0.0)


def test_fill_empty_result_stays_empty(spark, store):
    """Upstream fills EXISTING series only: an aggregate that produced
    no rows emits no spine."""
    df = compile_influxql(
        spark,
        'SELECT mean("click") FROM events WHERE "host" = \'h1\' AND '
        "time >= '2030-01-01T00:00:00Z' AND time < '2030-01-02T00:00:00Z' "
        "GROUP BY time(1h) fill(0)",
        store,
    )
    assert df.count() == 0


def test_bare_aggregate_epoch_timestamp(spark, store):
    df = compile_influxql(
        spark,
        'SELECT mean("click") AS m, count("click") AS n FROM events '
        "WHERE " + RANGE,
        store,
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["time"] == dt.datetime(1970, 1, 1)
    assert rows[0]["n"] > 0


def test_bare_selector_carries_point_time(spark, store):
    """SELECT max(f) with no time grouping returns the max POINT —
    its own timestamp, not a bucket label."""
    df = compile_influxql(
        spark,
        'SELECT max("click") FROM events WHERE ' + RANGE,
        store,
    )
    rows = df.collect()
    assert len(rows) == 1
    t = rows[0]["time"]
    assert dt.datetime(2024, 1, 8) <= t < dt.datetime(2024, 1, 15)
    assert t.microsecond or t.second or t.minute  # a real point time


def test_count_distinct(spark, store):
    df = compile_influxql(
        spark,
        'SELECT count(distinct("click")) FROM events WHERE ' + RANGE,
        store,
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["count"] > 0


def test_limit_is_per_series_with_tags(spark, store):
    df = compile_influxql(
        spark,
        'SELECT "click" FROM events WHERE ' + RANGE
        + ' GROUP BY "host" ORDER BY time DESC LIMIT 2',
        store,
    )
    rows = df.collect()
    per = {}
    for r in rows:
        per.setdefault(r["host"], []).append(r["time"])
    assert set(per) == {"h0", "h1", "h2", "h3"}
    assert all(len(ts) <= 2 for ts in per.values())


def test_slimit_soffset_series_order(spark, store):
    df = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE ' + RANGE
        + ' GROUP BY "host" SLIMIT 2 SOFFSET 1',
        store,
    )
    hosts = {r["host"] for r in df.collect()}
    assert hosts == {"h1", "h2"}  # lexicographic series order, skip 1


def test_bottom_mirrors_top(spark, store):
    top = compile_influxql(
        spark,
        'SELECT top("click", 2) FROM events WHERE ' + RANGE,
        store,
    ).collect()
    bot = compile_influxql(
        spark,
        'SELECT bottom("click", 2) FROM events WHERE ' + RANGE,
        store,
    ).collect()
    assert len(top) == 2 and len(bot) == 2
    assert min(r["top"] for r in top) > max(r["bottom"] for r in bot)


def test_moving_average_emits_from_nth_bucket(spark, store):
    agg = compile_influxql(
        spark,
        'SELECT mean("click") FROM events WHERE ' + RANGE
        + " GROUP BY time(1d) fill(none)",
        store,
    ).collect()
    ma = compile_influxql(
        spark,
        'SELECT moving_average(mean("click"), 3) FROM events WHERE '
        + RANGE
        + " GROUP BY time(1d) fill(none)",
        store,
    ).collect()
    assert len(ma) == len(agg) - 2  # first N-1 buckets emit nothing
    by_t = {r["time"]: r["mean"] for r in agg}
    times = sorted(by_t)
    first_ma = sorted(ma, key=lambda r: r["time"])[0]
    assert first_ma["time"] == times[2]
    expect = sum(by_t[t] for t in times[:3]) / 3
    assert abs(first_ma["moving_average"] - expect) < 1e-9


def test_cumulative_sum_last_equals_total(spark, store):
    cs = compile_influxql(
        spark,
        'SELECT cumulative_sum(sum("click")) FROM events WHERE '
        + RANGE
        + " GROUP BY time(1d) fill(none)",
        store,
    ).collect()
    total = compile_influxql(
        spark,
        'SELECT sum("click") FROM events WHERE ' + RANGE,
        store,
    ).collect()[0]["sum"]
    last = max(cs, key=lambda r: r["time"])["cumulative_sum"]
    assert abs(last - total) < 1e-9


def test_non_negative_difference_filters(spark, store):
    diff = compile_influxql(
        spark,
        'SELECT difference(count("click")) FROM events WHERE ' + RANGE
        + " GROUP BY time(1d) fill(none)",
        store,
    ).collect()
    nnd = compile_influxql(
        spark,
        'SELECT non_negative_difference(count("click")) FROM events '
        "WHERE " + RANGE + " GROUP BY time(1d) fill(none)",
        store,
    ).collect()
    assert len(nnd) == sum(1 for r in diff if r["difference"] >= 0)
    assert all(r["non_negative_difference"] >= 0 for r in nnd)


def test_now_anchor_resolves_relative_range(spark, store):
    anchored = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE time >= now() - 7d '
        "AND time < now()",
        store,
        now="2024-01-15T00:00:00Z",
    ).collect()
    explicit = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE ' + RANGE,
        store,
    ).collect()
    assert anchored[0]["count"] == explicit[0]["count"] > 0


def test_field_range_predicate(spark, store):
    df = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE "click" > 50 AND ' + RANGE,
        store,
    )
    n = df.collect()[0]["count"]
    all_n = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE ' + RANGE,
        store,
    ).collect()[0]["count"]
    assert 0 < n < all_n


def test_inclusive_upper_bound(spark, store):
    """time <= t keeps the boundary point that time < t drops."""
    lt = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE '
        "time >= '2024-01-08T00:00:00Z' AND time < '2024-01-15T00:00:00Z'",
        store,
    ).collect()[0]["count"]
    le = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE '
        "time >= '2024-01-08T00:00:00Z' AND time <= '2024-01-15T00:00:00Z'",
        store,
    ).collect()[0]["count"]
    assert le >= lt


# ---------------------------------------------------------------------------
# SHOW meta-queries
# ---------------------------------------------------------------------------


def test_show_measurements_and_keys(spark, store):
    m = compile_influxql(spark, "SHOW MEASUREMENTS", store)
    assert m.columns == ["name"]
    assert {r["name"] for r in m.collect()} == {"events"}
    fk = compile_influxql(spark, "SHOW FIELD KEYS FROM events", store)
    assert fk.columns == ["fieldKey", "fieldType"]
    assert {r["fieldType"] for r in fk.collect()} == {"float"}
    tk = compile_influxql(spark, "SHOW TAG KEYS FROM events", store)
    assert [r["tagKey"] for r in tk.collect()] == ["dc", "host"]


def test_show_tag_values_unknown_key(spark, store):
    with pytest.raises(InfluxQLError, match="not a tag"):
        compile_influxql(
            spark, 'SHOW TAG VALUES WITH KEY = "nope"', store
        )


# ---------------------------------------------------------------------------
# plan shape: predicates reach the scan
# ---------------------------------------------------------------------------


def test_raw_query_pushdown_reaches_parquet(spark, store):
    """The raw-points query is pure pushdown: field, promoted-tag, and
    time predicates all appear as PushedFilters on the parquet scan —
    no post-scan Python, no aggregation."""
    df = compile_influxql(
        spark,
        'SELECT "click" FROM events WHERE "host" = \'h1\' AND ' + RANGE,
        store,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    line = pushed[0]
    assert "_field" in line and "host" in line and "_time" in line, line


# ---------------------------------------------------------------------------
# Grafana multi-select WHERE shapes (round 15b second batch)
# ---------------------------------------------------------------------------


def _duck_events(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    return con


def _compare(df, con, sql):
    import math

    def norm(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else v
        return v

    scols = df.columns
    rel = con.sql(sql)
    assert sorted(scols) == sorted(rel.columns)
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    oo = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    srows = sorted(
        [tuple(norm(r[i]) for i in so) for r in df.collect()], key=repr
    )
    orows = sorted(
        [tuple(norm(r[i]) for i in oo) for r in rel.fetchall()], key=repr
    )
    assert srows == orows and srows


def test_or_group_multiselect(spark, store):
    """The Grafana variable with two values selected: a parenthesized
    same-tag OR group compiles to isin — DuckDB-parity-checked."""
    df = compile_influxql(
        spark,
        "SELECT count(\"click\") FROM events WHERE "
        "(\"host\" = 'h1' OR \"host\" = 'h3') AND " + RANGE
        + ' GROUP BY time(1d), "host" fill(none)',
        store,
    )
    _compare(
        df,
        _duck_events(SF_SMOKE),
        """
        SELECT make_timestamp((epoch_us(ts)//86400000000)*86400000000) AS "time",
               'h' || CAST(user_id % 4 AS VARCHAR) AS host,
               CAST(COUNT(*) AS BIGINT) AS count
        FROM events
        WHERE event_type='click' AND user_id % 4 IN (1, 3)
          AND ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts < TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY 1, 2
        """,
    )


def test_regex_multiselect_and_negation(spark, store):
    """=~ /^(h0|h2)$/ is the literal-alternation multi-select Grafana
    emits; !~ is its negation — both enumerate to isin (general regex
    raises: engine-dependent semantics)."""
    pos = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE "host" =~ /^(h0|h2)$/ '
        "AND " + RANGE,
        store,
    ).collect()[0]["count"]
    neg = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE "host" !~ /^(h0|h2)$/ '
        "AND " + RANGE,
        store,
    ).collect()[0]["count"]
    total = compile_influxql(
        spark,
        'SELECT count("click") FROM events WHERE ' + RANGE,
        store,
    ).collect()[0]["count"]
    assert pos + neg == total and pos > 0 and neg > 0


def test_general_regex_raises(spark, store):
    with pytest.raises(InfluxQLError, match="multi-select form"):
        compile_influxql(
            spark,
            'SELECT count("click") FROM events WHERE "host" =~ /h.*/',
            store,
        )


def test_cross_tag_or_raises(spark, store):
    with pytest.raises(InfluxQLError, match="mixes tags"):
        compile_influxql(
            spark,
            "SELECT count(\"click\") FROM events WHERE "
            "(\"host\" = 'h1' OR \"dc\" = 'd1')",
            store,
        )


def test_single_value_multiselect_collapses_to_pushdown(spark, store):
    """A one-value OR group folds into the equality pushdown tier —
    the plan carries the same pushed host filter as plain equality."""
    df = compile_influxql(
        spark,
        "SELECT \"click\" FROM events WHERE (\"host\" = 'h1') AND " + RANGE,
        store,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "host" in pushed[0]


def test_multi_field_aggregates_one_pass(spark, store):
    """mean of TWO different fields in one SELECT — the conditional-
    aggregation path: one shuffle, each item guarded by its _field.
    DuckDB-parity-checked (FILTER clauses are the SQL twin)."""
    df = compile_influxql(
        spark,
        'SELECT mean("click") AS click_mean, mean("error") AS error_mean, '
        'count("click") AS click_n FROM events WHERE ' + RANGE
        + " GROUP BY time(1d) fill(none)",
        store,
    )
    _compare(
        df,
        _duck_events(SF_SMOKE),
        """
        SELECT make_timestamp((epoch_us(ts)//86400000000)*86400000000) AS "time",
               CAST(SUM(CAST(value AS DECIMAL(18,2)))
                    FILTER (WHERE event_type='click') AS DOUBLE)
                 / COUNT(*) FILTER (WHERE event_type='click') AS click_mean,
               CAST(SUM(CAST(value AS DECIMAL(18,2)))
                    FILTER (WHERE event_type='error') AS DOUBLE)
                 / COUNT(*) FILTER (WHERE event_type='error') AS error_mean,
               CAST(COUNT(*) FILTER (WHERE event_type='click') AS BIGINT)
                 AS click_n
        FROM events
        WHERE event_type IN ('click', 'error')
          AND ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts < TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY 1
        """,
    )


# ---------------------------------------------------------------------------
# subqueries (round 15b third batch): FROM (SELECT ...)
# ---------------------------------------------------------------------------


def test_subquery_downsample_then_mean_parity(spark, store):
    """The canonical InfluxQL subquery idiom — max per hour, then mean
    of those maxima per day, per host. DuckDB-parity-checked with the
    subquery determinism rule (DECIMAL(18,10) cast of the inner
    doubles on both engines)."""
    df = compile_influxql(
        spark,
        'SELECT mean("max") FROM (SELECT max("click") FROM events '
        "WHERE " + RANGE + ' GROUP BY time(1h), "host" fill(none)) '
        'GROUP BY time(1d), "host" fill(none)',
        store,
    )
    _compare(
        df,
        _duck_events(SF_SMOKE),
        """
        WITH inner_q AS (
          SELECT make_timestamp((epoch_us(ts)//3600000000)*3600000000) AS t,
                 'h' || CAST(user_id % 4 AS VARCHAR) AS host,
                 MAX(value) AS mx
          FROM events WHERE event_type = 'click'
            AND ts >= TIMESTAMP '2024-01-08 00:00:00'
            AND ts < TIMESTAMP '2024-01-15 00:00:00'
          GROUP BY 1, 2)
        SELECT make_timestamp((epoch_us(t)//86400000000)*86400000000)
                 AS "time",
               host,
               CAST(SUM(CAST(mx AS DECIMAL(18,10))) AS DOUBLE)/COUNT(*)
                 AS mean
        FROM inner_q GROUP BY 1, 2
        """,
    )


def test_subquery_outer_where_refilters(spark, store):
    """The outer WHERE narrows the inner result — re-filter semantics,
    not a second scan: outer time bounds drop inner buckets, outer tag
    equality drops inner series."""
    full = compile_influxql(
        spark,
        'SELECT count("max") FROM (SELECT max("click") FROM events '
        "WHERE " + RANGE + ' GROUP BY time(1d), "host" fill(none))',
        store,
    ).collect()[0]["count"]
    narrowed = compile_influxql(
        spark,
        'SELECT count("max") FROM (SELECT max("click") FROM events '
        "WHERE " + RANGE + ' GROUP BY time(1d), "host" fill(none)) '
        "WHERE time >= '2024-01-10T00:00:00Z' AND \"host\" = 'h1'",
        store,
    ).collect()[0]["count"]
    assert 0 < narrowed < full


def test_subquery_selector_carries_inner_time(spark, store):
    """max over a subquery selects the inner ROW — its bucket
    timestamp, not an outer window label."""
    rows = compile_influxql(
        spark,
        'SELECT max("mean") FROM (SELECT mean("click") FROM events '
        "WHERE " + RANGE + " GROUP BY time(6h) fill(none))",
        store,
    ).collect()
    assert len(rows) == 1
    assert rows[0]["time"].hour in (0, 6, 12, 18)  # a 6h bucket label


def test_subquery_raw_projection(spark, store):
    rows = compile_influxql(
        spark,
        'SELECT "max" FROM (SELECT max("click") FROM events WHERE '
        + RANGE
        + " GROUP BY time(1d) fill(none)) ORDER BY time DESC LIMIT 3",
        store,
    ).collect()
    assert len(rows) == 3
    assert rows[0]["max"] is not None


def test_subquery_unknown_column_raises(spark, store):
    with pytest.raises(InfluxQLError, match="subquery emits columns"):
        compile_influxql(
            spark,
            'SELECT mean("nope") FROM (SELECT max("click") FROM events '
            "WHERE " + RANGE + " GROUP BY time(1h) fill(none))",
            store,
        )


def test_subquery_two_levels_raise(spark, store):
    with pytest.raises(InfluxQLError, match="ONE level"):
        compile_influxql(
            spark,
            'SELECT mean("max") FROM (SELECT max("mean") FROM '
            '(SELECT mean("click") FROM events GROUP BY time(5m)) '
            "GROUP BY time(1h))",
            store,
        )


def test_subquery_outer_unknown_tag_raises(spark, store):
    with pytest.raises(InfluxQLError, match="carries tags"):
        compile_influxql(
            spark,
            'SELECT mean("max") FROM (SELECT max("click") FROM events '
            "WHERE " + RANGE + ' GROUP BY time(1h) fill(none)) '
            "WHERE \"host\" = 'h1'",
            store,
        )


# ---------------------------------------------------------------------------
# mode / integral / elapsed (round 15b fourth batch): the remaining
# public function-reference rows
# ---------------------------------------------------------------------------


def test_mode_parity_and_tie_rule(spark, store):
    """mode(f) per day: most frequent value, smallest wins ties (the
    pinned rule — public docs leave ties unspecified). DuckDB mirrors
    via ROW_NUMBER (count desc, value asc)."""
    df = compile_influxql(
        spark,
        'SELECT mode("click") FROM events WHERE ' + RANGE
        + " GROUP BY time(1d)",
        store,
    )
    _compare(
        df,
        _duck_events(SF_SMOKE),
        """
        WITH c AS (
          SELECT make_timestamp((epoch_us(ts)//86400000000)*86400000000)
                   AS t, value, COUNT(*) AS c
          FROM events WHERE event_type = 'click'
            AND ts >= TIMESTAMP '2024-01-08 00:00:00'
            AND ts < TIMESTAMP '2024-01-15 00:00:00'
          GROUP BY 1, 2),
        r AS (
          SELECT t, value,
                 ROW_NUMBER() OVER (PARTITION BY t
                                    ORDER BY c DESC, value ASC) AS rn
          FROM c)
        SELECT t AS "time", value AS mode FROM r WHERE rn = 1
        """,
    )


def test_integral_matches_flux_twin(spark, store):
    """integral(f, 1m) in both languages off the same store —
    bit-identical (the shared exact-decimal trapezoid expression)."""
    from time_series_data_pipeline_spark.flux import compile_flux

    iql = compile_influxql(
        spark,
        'SELECT integral("click", 1m) FROM events WHERE ' + RANGE
        + ' GROUP BY "host", "dc"',
        store,
    ).collect()
    flux = compile_flux(
        spark,
        """
        from(bucket: "tagged")
          |> range(start: "2024-01-08 00:00:00", stop: "2024-01-15 00:00:00")
          |> filter(fn: (r) => r["_measurement"] == "events")
          |> filter(fn: (r) => r["_field"] == "click")
          |> integral(unit: 1m)
        """,
        {"tagged": store},
    ).collect()
    # Flux tables split on the FULL tag key; the InfluxQL series only
    # split where GROUP BY says — grouped by both tags the two series
    # sets coincide and every area must be bit-identical
    got = {(r["host"], r["dc"]): r["integral"] for r in iql}
    want = {(r["host"], r["dc"]): r["integral"] for r in flux}
    assert got == want and len(got) == 12
    assert all(r["time"] == dt.datetime(1970, 1, 1) for r in iql)


def test_elapsed_parity(spark, store):
    """elapsed(f, 1m): integer minute gaps between subsequent points,
    stamped with the later point's time."""
    df = compile_influxql(
        spark,
        'SELECT elapsed("click", 1m) FROM events WHERE ' + RANGE,
        store,
    )
    _compare(
        df,
        _duck_events(SF_SMOKE),
        """
        SELECT ts AS "time",
               CAST((epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 60000000
                    AS BIGINT) AS elapsed
        FROM events
        WHERE event_type = 'click' AND value IS NOT NULL
          AND ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts < TIMESTAMP '2024-01-15 00:00:00'
        WINDOW w AS (ORDER BY ts, value)
        QUALIFY elapsed IS NOT NULL
        """,
    )


def test_mode_per_host_bare(spark, store):
    rows = compile_influxql(
        spark,
        'SELECT mode("click") FROM events WHERE ' + RANGE
        + ' GROUP BY "host"',
        store,
    ).collect()
    assert {r["host"] for r in rows} == {"h0", "h1", "h2", "h3"}
    assert all(r["time"] == dt.datetime(1970, 1, 1) for r in rows)


# ---------------------------------------------------------------------------
# aggregate arithmetic + tz (round 15b fifth batch)
# ---------------------------------------------------------------------------


def test_aggregate_arithmetic_parity(spark, store):
    """The Grafana unit-conversion tail: mean("f") * 8 / 1000 AS kbits
    — scalar ops applied left-to-right to the aggregate output, the
    identical double-op order in DuckDB."""
    df = compile_influxql(
        spark,
        'SELECT mean("click") * 8 / 1000 AS kbits, count("click") + 0.5 '
        "AS nn FROM events WHERE " + RANGE + " GROUP BY time(1d) fill(none)",
        store,
    )
    _compare(
        df,
        _duck_events(SF_SMOKE),
        """
        SELECT make_timestamp((epoch_us(ts)//86400000000)*86400000000)
                 AS "time",
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) * 8 / 1000 AS kbits,
               CAST(COUNT(*) AS BIGINT) + 0.5 AS nn
        FROM events WHERE event_type = 'click'
          AND ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts < TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY 1
        """,
    )


def test_arithmetic_on_selector_raises(spark, store):
    with pytest.raises(InfluxQLError, match="actual point"):
        compile_influxql(
            spark,
            'SELECT top("click", 3) * 2 FROM events WHERE ' + RANGE,
            store,
        )


def test_cross_item_arithmetic_raises(spark, store):
    with pytest.raises(InfluxQLError, match="cross-item"):
        compile_influxql(
            spark,
            'SELECT mean("click") / mean("error") FROM events',
            store,
        )


def test_tz_raises_named(spark, store):
    with pytest.raises(InfluxQLError, match="tz\\(\\) is outside"):
        compile_influxql(
            spark,
            'SELECT mean("click") FROM events WHERE ' + RANGE
            + " GROUP BY time(1h) fill(none) tz('America/Chicago')",
            store,
        )


# ---------------------------------------------------------------------------
# INTO (round 15b sixth batch): the continuous-query body
# ---------------------------------------------------------------------------


def test_into_roundtrip_idempotent(spark, store, tmp_path):
    """SELECT ... INTO writes the multi-field rollup through the
    idempotent bucket writer; the rollup reads back through InfluxQL
    itself, and a rerun rewrites the same partitions (count stable)."""
    from time_series_data_pipeline_spark.sources import bucket as bkt

    tgt = str(tmp_path / "rollup_store")
    q = (
        'SELECT mean("click") AS click_mean, max("click") AS click_max '
        "INTO rollup_2h FROM events WHERE " + RANGE
        + ' GROUP BY time(2h), "host" fill(none)'
    )
    written = compile_influxql(spark, q, store, into_path=tgt)
    n = written.count()
    assert n > 0
    assert written.columns == [
        "_time", "_measurement", "_field", "_value", "host", "tags",
    ]
    back = bkt.read_bucket(spark, tgt)
    assert back.count() == n
    assert {
        r["_field"] for r in back.select("_field").distinct().collect()
    } == {"click_mean", "click_max"}
    compile_influxql(spark, q, store, into_path=tgt)  # rerun
    assert bkt.read_bucket(spark, tgt).count() == n
    sel = compile_influxql(
        spark,
        'SELECT "click_mean" FROM rollup_2h WHERE '
        "time >= '2024-01-08T00:00:00Z' ORDER BY time DESC LIMIT 3",
        tgt,
    ).collect()
    assert len(sel) == 3


@pytest.mark.parametrize(
    "stmt,kwargs,needle",
    [
        (
            'SELECT mean("click") INTO r FROM events WHERE '
            + RANGE + " GROUP BY time(1h) fill(none)",
            {},
            "into_path",
        ),
        (
            'SELECT mean("click") INTO r FROM events WHERE '
            + RANGE,
            {"into_path": "/tmp/x"},
            "GROUP BY time",
        ),
        (
            'SELECT mean("click") INTO r FROM events WHERE '
            + RANGE + " GROUP BY time(1h) fill(0)",
            {"into_path": "/tmp/x"},
            "fill\\(none\\)",
        ),
        (
            'SELECT mean("click") INTO r FROM events WHERE '
            + RANGE + " GROUP BY time(1h) fill(none) LIMIT 5",
            {"into_path": "/tmp/x"},
            "idempotent",
        ),
        (
            'SELECT percentile("click", 95) INTO r FROM events WHERE '
            + RANGE + " GROUP BY time(1h) fill(none)",
            {"into_path": "/tmp/x"},
            "plain aggregates",
        ),
    ],
    ids=["no-path", "no-window", "fill", "limit", "selector"],
)
def test_into_shape_rules(spark, store, stmt, kwargs, needle):
    with pytest.raises(InfluxQLError, match=needle):
        compile_influxql(spark, stmt, store, **kwargs)


def test_into_self_write_refused(spark, store):
    with pytest.raises(InfluxQLError, match="itself"):
        compile_influxql(
            spark,
            'SELECT mean("click") INTO r FROM events WHERE ' + RANGE
            + " GROUP BY time(1h) fill(none)",
            store,
            into_path=store,
        )


# ---------------------------------------------------------------------------
# CREATE CONTINUOUS QUERY (round 15b seventh batch): the CQ scheduler
# ---------------------------------------------------------------------------


def test_continuous_query_tick_writes_rollup(spark, store, tmp_path):
    """One availableNow tick of the CQ scheduler executes the BEGIN
    body and lands the rollup through the idempotent writer — the
    written store matches the one-shot INTO compile bit-for-bit, and a
    second tick (fresh checkpoint) leaves the store unchanged."""
    from time_series_data_pipeline_spark.influxql import start_influxql_cq
    from time_series_data_pipeline_spark.sources import bucket as bkt

    tgt = str(tmp_path / "cq_store")
    ref = str(tmp_path / "ref_store")
    body = (
        'SELECT mean("click") AS m INTO cq_1h FROM events WHERE '
        + RANGE + " GROUP BY time(1h) fill(none)"
    )
    cq = (
        'CREATE CONTINUOUS QUERY "cq_test" ON "db" RESAMPLE EVERY 30m '
        "BEGIN " + body + " END"
    )
    q = start_influxql_cq(
        spark, cq, store, tgt, str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)
    compile_influxql(spark, body, store, into_path=ref)
    got = {
        (r["_time"], r["_field"], r["_value"])
        for r in bkt.read_bucket(spark, tgt).collect()
    }
    want = {
        (r["_time"], r["_field"], r["_value"])
        for r in bkt.read_bucket(spark, ref).collect()
    }
    assert got == want and got
    q2 = start_influxql_cq(
        spark, body, store, tgt, str(tmp_path / "ckpt2"),
    )  # bare body, second tick: idempotent rewrite
    q2.awaitTermination(120)
    assert {
        (r["_time"], r["_field"], r["_value"])
        for r in bkt.read_bucket(spark, tgt).collect()
    } == want


def test_continuous_query_rejections(spark, store, tmp_path):
    from time_series_data_pipeline_spark.influxql import start_influxql_cq

    with pytest.raises(InfluxQLError, match="RESAMPLE FOR"):
        start_influxql_cq(
            spark,
            'CREATE CONTINUOUS QUERY c ON d RESAMPLE FOR 2h BEGIN '
            'SELECT mean("click") INTO r FROM events WHERE ' + RANGE
            + " GROUP BY time(1h) fill(none) END",
            store, str(tmp_path / "t"), str(tmp_path / "c"),
        )
    with pytest.raises(InfluxQLError, match="needs INTO"):
        start_influxql_cq(
            spark,
            'SELECT mean("click") FROM events WHERE ' + RANGE
            + " GROUP BY time(1h) fill(none)",
            store, str(tmp_path / "t"), str(tmp_path / "c"),
        )
    with pytest.raises(InfluxQLError, match="malformed CREATE"):
        start_influxql_cq(
            spark, "CREATE CONTINUOUS QUERY oops", store,
            str(tmp_path / "t"), str(tmp_path / "c"),
        )
    with pytest.raises(InfluxQLError, match="now"):
        # now()-relative body with no anchor: fails at START, not tick 1
        start_influxql_cq(
            spark,
            'SELECT mean("click") INTO r FROM events WHERE '
            "time >= now() - 2h GROUP BY time(1h) fill(none)",
            store, str(tmp_path / "t"), str(tmp_path / "c"),
        )


# ---------------------------------------------------------------------------
# review-15b regression pins (the second-sweep findings, each fixed)
# ---------------------------------------------------------------------------


def test_same_tag_and_predicates_intersect(spark, store):
    """AND-ed multi-selects on one tag INTERSECT (the union form
    silently widened the filter); contradictory equalities yield the
    EMPTY set, not last-wins."""
    inter = compile_influxql(
        spark,
        "SELECT count(\"click\") FROM events WHERE "
        "(\"host\" = 'h1' OR \"host\" = 'h2') AND \"host\" =~ /^(h2|h3)$/ "
        "AND " + RANGE,
        store,
    ).collect()[0]["count"]
    only_h2 = compile_influxql(
        spark,
        "SELECT count(\"click\") FROM events WHERE \"host\" = 'h2' AND "
        + RANGE,
        store,
    ).collect()[0]["count"]
    assert inter == only_h2 > 0
    contradiction = compile_influxql(
        spark,
        "SELECT count(\"click\") FROM events WHERE \"host\" = 'h1' AND "
        "\"host\" = 'h2' AND " + RANGE,
        store,
    ).collect()
    assert contradiction[0]["count"] == 0


def test_scaled_bare_selector_takes_aggregate_row(spark, store):
    """max(f) * 2 without GROUP BY time: the arithmetic tail is
    APPLIED (it was silently dropped) and the row takes the
    epoch-stamped aggregate form — a scaled extremum is not a point."""
    plain = compile_influxql(
        spark, 'SELECT max("click") FROM events WHERE ' + RANGE, store
    ).collect()[0]
    scaled = compile_influxql(
        spark, 'SELECT max("click") * 2 FROM events WHERE ' + RANGE, store
    ).collect()[0]
    assert scaled["max"] == plain["max"] * 2
    assert scaled["time"] == dt.datetime(1970, 1, 1)


def test_subquery_decimal_width_survives_large_sums(spark, store):
    """Outer mean over inner sums ~1e8+: DECIMAL(38,10) must not
    overflow-to-null the way decimal(18,10)'s 8 integer digits did."""
    rows = compile_influxql(
        spark,
        'SELECT mean("s") FROM (SELECT sum("click") * 100000 AS s '
        "FROM events WHERE " + RANGE + " GROUP BY time(1d) fill(none))",
        store,
    ).collect()
    # wait: arithmetic inside the subquery scales sums to ~1e8-1e9
    assert len(rows) == 1 and rows[0]["mean"] is not None
    assert rows[0]["mean"] > 1e7


def test_percentile_exact_rank_boundary(spark, store):
    """percentile(f, 10) over exactly 30 values must pick rank 3
    (ceil(10·30/100) = 3), not 4 — the double-order regression."""
    import duckdb  # noqa: F401  (parity harness already imported)

    rows = compile_influxql(
        spark,
        'SELECT percentile("click", 10) FROM events WHERE ' + RANGE,
        store,
    ).collect()
    con = _duck_events(SF_SMOKE)
    n, want = con.sql(
        """
        WITH pts AS (
          SELECT value, ROW_NUMBER() OVER (ORDER BY value, ts) AS rn,
                 COUNT(*) OVER () AS n
          FROM events WHERE event_type='click'
            AND ts >= TIMESTAMP '2024-01-08 00:00:00'
            AND ts < TIMESTAMP '2024-01-15 00:00:00')
        SELECT max(n), max(CASE WHEN rn = GREATEST(1, CEIL(10*n/100.0))
                          THEN value END) FROM pts
        """
    ).fetchone()
    assert rows[0]["percentile"] == want


def test_rank_aggregates_reject_fill(spark, store):
    for fn in ('percentile("click", 95)', 'mode("click")'):
        with pytest.raises(InfluxQLError, match="observed buckets"):
            compile_influxql(
                spark,
                f"SELECT {fn} FROM events WHERE " + RANGE
                + " GROUP BY time(1d) fill(0)",
                store,
            )


def test_aware_time_literal_rejected(spark, store):
    with pytest.raises(InfluxQLError, match="UTC offset"):
        compile_influxql(
            spark,
            'SELECT count("click") FROM events WHERE '
            "time >= '2024-01-08T00:00:00+02:00'",
            store,
        )


def test_show_inclusive_upper_bound(spark, store):
    """SHOW ... WHERE time <= t keeps values present only at exactly
    t (the bound was passed as an exclusive scan stop)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    t = con.sql(
        "SELECT max(ts) FROM events WHERE event_type='click'"
    ).fetchone()[0]
    lit = t.strftime("%Y-%m-%dT%H:%M:%S.%f")
    le = compile_influxql(
        spark,
        f'SHOW TAG VALUES FROM events WITH KEY = "host" '
        f"WHERE time >= '{lit}' AND time <= '{lit}'",
        store,
    ).count()
    lt = compile_influxql(
        spark,
        f'SHOW TAG VALUES FROM events WITH KEY = "host" '
        f"WHERE time >= '{lit}' AND time < '{lit}'",
        store,
    ).count()
    assert le == 1 and lt == 0


def test_hostile_identifier_rejected(spark, store):
    with pytest.raises(InfluxQLError, match="identifier"):
        compile_influxql(
            spark,
            'SELECT mean("click") AS "a`b" FROM events WHERE ' + RANGE
            + " GROUP BY time(1d) fill(none)",
            store,
        )


def test_numeric_clause_args_raise_named(spark, store):
    with pytest.raises(InfluxQLError, match="LIMIT expects an integer"):
        compile_influxql(
            spark,
            'SELECT "click" FROM events WHERE ' + RANGE + " LIMIT abc",
            store,
        )


# ---------------------------------------------------------------------------
# SHOW ... CARDINALITY (round 15b eighth batch): the ops monitors
# ---------------------------------------------------------------------------


def test_cardinality_family(spark, store):
    """Exact forms against known fixture cardinalities; the estimated
    default must land within HLL++ tolerance of the exact count."""
    def one(stmt):
        rows = compile_influxql(spark, stmt, store).collect()
        assert len(rows) == 1 and rows[0].__fields__ == ["count"]
        return rows[0]["count"]

    assert one("SHOW MEASUREMENT EXACT CARDINALITY") == 1
    assert one("SHOW FIELD KEY EXACT CARDINALITY") == 5
    assert one("SHOW TAG KEY CARDINALITY") == 2  # host, dc — schema
    assert one(
        'SHOW TAG VALUES EXACT CARDINALITY WITH KEY = "host"'
    ) == 4
    series = one("SHOW SERIES EXACT CARDINALITY")
    assert series == 12  # 4 hosts x 3 dcs, one measurement
    est = one("SHOW SERIES CARDINALITY")
    assert abs(est - series) <= max(2, series * 0.05)


def test_cardinality_time_scoped(spark, store):
    full = compile_influxql(
        spark, "SHOW SERIES EXACT CARDINALITY", store
    ).collect()[0]["count"]
    none = compile_influxql(
        spark,
        "SHOW SERIES EXACT CARDINALITY WHERE "
        "time >= '2030-01-01T00:00:00Z'",
        store,
    ).collect()[0]["count"]
    assert full == 12 and none == 0


def test_bare_show_series_rejected(spark, store):
    with pytest.raises(InfluxQLError, match="CARDINALITY monitors"):
        compile_influxql(spark, "SHOW SERIES", store)
