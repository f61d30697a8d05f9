"""InfluxQL-surface queries (round 15): the reference's InfluxDB
server answers TWO query languages, and until now only Flux had a
driver-gated face. Each query here is the verbatim InfluxQL text a
Grafana InfluxQL-datasource panel would send (the pre-Flux dashboard
language, and the one InfluxDB 3.x keeps now that Flux is deprecated
upstream), compiled by ``influxql.compile_influxql`` onto the SAME
tagged bucket store the Flux queries read — so the two front-ends are
attested against the same DuckDB oracles off the same storage.

Tag derivation matches the tagged-store fixture (timeseries_q.py):
``host = 'h' || user_id % 4``, ``dc = 'd' || user_id % 3`` — every
oracle re-derives the tags from the raw events table, keeping the
driver's value-hash gate end-to-end.

Deterministic-tie rules (selector/top/percentile point choices, LIMIT
ordering) are pinned in influxql.py docstrings and mirrored exactly in
each oracle's ROW_NUMBER ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query
from .timeseries_q import _AVG, _tagged_bucket_path

_RANGE_SQL = (
    "ts >= TIMESTAMP '2024-01-08 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-15 00:00:00'"
)
_RANGE_IQL = (
    "time >= '2024-01-08T00:00:00Z' AND time < '2024-01-15T00:00:00Z'"
)


def _run(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    from ..influxql import compile_influxql

    return compile_influxql(
        spark, statement, _tagged_bucket_path(spark, sf_dir)
    )


@query(
    "influxql_group_mean",
    # the canonical Grafana InfluxQL panel: tag-filtered windowed mean,
    # grouped by the remaining tag — same pruning tiers as the Flux
    # twin flux_compiled_tag_filter (host equality + range pushed to
    # the scan), same exact-decimal mean idiom
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts)//21600000000)*21600000000) AS "time",
           'd' || CAST(user_id % 3 AS VARCHAR) AS dc,
           {_AVG} AS mean
    FROM events
    WHERE event_type = 'click' AND user_id % 4 = 1 AND {_RANGE_SQL}
    GROUP BY 1, 2
    """,
)
def influxql_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT mean(f) .. GROUP BY time(6h), "dc"`` — the InfluxQL
    twin of ``flux_compiled_tag_filter``: the 1.x dashboard text
    compiles into the same manifest-pruned scan + epoch-aligned
    tumbling mean (influxql.py ``_compile_select``); ``fill(none)``
    keeps observed buckets only, the groupBy output as-is."""
    return _run(
        spark, sf_dir,
        'SELECT mean("click") FROM events '
        f"WHERE \"host\" = 'h1' AND {_RANGE_IQL} "
        'GROUP BY time(6h), "dc" fill(none)',
    )


@query(
    "influxql_multi_agg",
    # FIVE aggregates in ONE statement — the form where the Spark-first
    # design beats a Flux translation structurally: one scan + one
    # shuffle of conditional aggregates vs one aggregateWindow pipeline
    # per fn joined back together (influxql.py module doc)
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts)//21600000000)*21600000000) AS "time",
           {_AVG} AS m,
           MAX(value) AS mx,
           MIN(value) AS mn,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
    FROM events
    WHERE event_type = 'click' AND {_RANGE_SQL}
    GROUP BY 1
    """,
)
def influxql_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT mean(f), max(f), min(f), count(f), sum(f)`` in one
    pass: every item rides the single windowed groupBy via conditional
    aggregation — the plan a 100 TB store wants (one shuffle keyed on
    the window, partial-aggregated map-side, vs N pipelines + joins)."""
    return _run(
        spark, sf_dir,
        'SELECT mean("click") AS m, max("click") AS mx, min("click") AS mn, '
        'count("click") AS n, sum("click") AS s '
        f"FROM events WHERE {_RANGE_IQL} GROUP BY time(6h) fill(none)",
    )


@query(
    "influxql_fill_previous",
    # the carried-forward gauge panel: full 24-bucket spine of the
    # queried day, gaps carrying the last observed hourly mean —
    # upstream fill(previous) (buckets before the first observation
    # stay null). The spine is sequence-exploded (range/every rows,
    # volume-independent) per EXISTING series — influxql._apply_fill
    oracle=f"""
    WITH agg AS (
      SELECT make_timestamp((epoch_us(ts)//3600000000)*3600000000) AS t,
             {_AVG} AS mean
      FROM events
      WHERE event_type = 'click' AND user_id % 4 = 2
        AND ts >= TIMESTAMP '2024-01-08 00:00:00'
        AND ts < TIMESTAMP '2024-01-09 00:00:00'
      GROUP BY 1),
    spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-08 00:00:00',
               TIMESTAMP '2024-01-08 23:00:00', INTERVAL 1 HOUR)) AS "time")
    SELECT s."time",
           last_value(a.mean IGNORE NULLS) OVER (ORDER BY s."time"
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mean
    FROM spine s LEFT JOIN agg a ON a.t = s."time"
    """,
)
def influxql_fill_previous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY time(1h) fill(previous)`` over one day, host-pinned:
    InfluxQL's gap semantics (the Flux analog is the separate
    ``fill(usePrevious:)`` stage) — spine join + last-non-null window
    per series."""
    return _run(
        spark, sf_dir,
        'SELECT mean("click") FROM events '
        "WHERE \"host\" = 'h2' AND time >= '2024-01-08T00:00:00Z' "
        "AND time < '2024-01-09T00:00:00Z' "
        "GROUP BY time(1h) fill(previous)",
    )


@query(
    "influxql_percentile",
    # nearest-rank percentile: an ACTUAL member value (upstream
    # returns a real point, never an interpolation) at ascending index
    # max(1, ceil(N/100 * n)); ties broken by time — the oracle pins
    # the identical ROW_NUMBER rule
    oracle=f"""
    WITH pts AS (
      SELECT make_timestamp((epoch_us(ts)//86400000000)*86400000000) AS t,
             value, ts,
             ROW_NUMBER() OVER (PARTITION BY epoch_us(ts)//86400000000
                                ORDER BY value, ts) AS rn,
             COUNT(*) OVER (PARTITION BY epoch_us(ts)//86400000000) AS n
      FROM events WHERE event_type = 'click' AND {_RANGE_SQL})
    SELECT t AS "time", value AS percentile FROM pts
    WHERE rn = GREATEST(1, CEIL(95 * n / 100.0))
    """,
)
def influxql_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT percentile(f, 95) .. GROUP BY time(1d)`` — the daily
    p95 panel. Rank aggregates are inherently sort-based: one window
    rank per (bucket, series) partition, no value buffering in the
    driver (influxql._compile_percentile)."""
    return _run(
        spark, sf_dir,
        f'SELECT percentile("click", 95) FROM events WHERE {_RANGE_IQL} '
        "GROUP BY time(1d)",
    )


@query(
    "influxql_top_per_host",
    # top(f, N) keeps the extreme POINTS with their own timestamps
    # (upstream: top/bottom always carry point times); order value
    # desc then time asc, pinned both sides
    oracle=f"""
    WITH pts AS (
      SELECT ts, value, 'h' || CAST(user_id % 4 AS VARCHAR) AS host,
             ROW_NUMBER() OVER (PARTITION BY user_id % 4
                                ORDER BY value DESC, ts) AS rn
      FROM events WHERE event_type = 'click' AND {_RANGE_SQL})
    SELECT ts AS "time", host, value AS top FROM pts WHERE rn <= 3
    """,
)
def influxql_top_per_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT top(f, 3) .. GROUP BY "host"`` — the per-series top-N
    points leaderboard: one window rank per series partition, scan
    pruned to the field + range."""
    return _run(
        spark, sf_dir,
        f'SELECT top("click", 3) FROM events WHERE {_RANGE_IQL} '
        'GROUP BY "host"',
    )


@query(
    "influxql_raw_points",
    # the raw-points inspector panel: tag-filtered field scan, newest
    # first, LIMIT 20 — ORDER BY time DESC + deterministic value
    # tie-break behind it (influxql._series_limits tiebreak rule)
    oracle=f"""
    SELECT ts AS "time", value AS click FROM events
    WHERE event_type = 'click' AND user_id % 4 = 1 AND {_RANGE_SQL}
    ORDER BY ts DESC, value LIMIT 20
    """,
)
def influxql_raw_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT "click" .. ORDER BY time DESC LIMIT 20`` — a raw
    projection is a pure pushdown scan (field + tag + range all reach
    parquet) with a top-k tail, no aggregation at all."""
    return _run(
        spark, sf_dir,
        f"SELECT \"click\" FROM events WHERE \"host\" = 'h1' AND "
        f"{_RANGE_IQL} ORDER BY time DESC LIMIT 20",
    )


@query(
    "influxql_derivative",
    # the Grafana rate panel: derivative over an aggregated series —
    # Δmean ÷ Δt × unit, Δt the ACTUAL bucket gap (fill(none) holes
    # divide by true elapsed time), unit 1h explicit
    oracle=f"""
    WITH agg AS (
      SELECT make_timestamp((epoch_us(ts)//21600000000)*21600000000) AS t,
             {_AVG} AS v
      FROM events WHERE event_type = 'click' AND {_RANGE_SQL}
      GROUP BY 1)
    SELECT t AS "time",
           (v - LAG(v) OVER (ORDER BY t))
             / epoch(t - LAG(t) OVER (ORDER BY t)) * 3600.0 AS derivative
    FROM agg QUALIFY LAG(v) OVER (ORDER BY t) IS NOT NULL
    """,
)
def influxql_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT derivative(mean(f), 1h) .. GROUP BY time(6h)`` — the
    two-stage transform: windowed aggregate first, then a per-series
    lag window over bucket order (influxql._compile_transform)."""
    return _run(
        spark, sf_dir,
        f'SELECT derivative(mean("click"), 1h) FROM events '
        f"WHERE {_RANGE_IQL} GROUP BY time(6h) fill(none)",
    )


@query(
    "influxql_show_tag_values",
    # the Grafana template-variable dropdown, InfluxQL face — the
    # schema.tagValues twin served from the promoted tag column
    oracle="""
    SELECT DISTINCT 'host' AS key,
           'h' || CAST(user_id % 4 AS VARCHAR) AS value
    FROM events
    """,
)
def influxql_show_tag_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SHOW TAG VALUES FROM events WITH KEY = "host"`` — the
    InfluxQL meta-query family (SHOW MEASUREMENTS / FIELD KEYS / TAG
    KEYS / TAG VALUES), same single-column distinct over the promoted
    tag as the Flux ``schema.tagValues`` path."""
    return _run(
        spark, sf_dir,
        'SHOW TAG VALUES FROM events WITH KEY = "host"',
    )
