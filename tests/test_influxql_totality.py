"""InfluxQL front-end totality + differential sweeps.

Two system-level properties the per-feature tests cannot give:

* **Totality** (the flux.py calendar-sweep discipline, round 15):
  every statement composed from the seeded fragment pools either
  compiles to an analyzable DataFrame or raises ``InfluxQLError``
  naming the construct — NEVER an internal error (Py4J analysis
  exception, TypeError, bare ValueError). The pools deliberately mix
  valid and invalid fragments so a large share of compositions
  exercise the refusal surface.

* **Differential equality**: for the full grid of incremental
  aggregates × window sizes × tag filters, the InfluxQL statement and
  the equivalent Flux pipeline off the SAME tagged store must return
  identical row sets — both front-ends lower onto the shared scan +
  aggregate expressions, so any divergence is a front-end bug by
  construction.

Deterministic: fragments combine by index arithmetic (no RNG), so a
failure names a reproducible composition.
"""

from __future__ import annotations

import pytest

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


# fragment pools — valid and invalid members deliberately mixed
PROJECTIONS = [
    'mean("click")',
    'mean("click") AS m, max("click") AS mx, sum("click") AS s',
    'count(distinct("click"))',
    'percentile("click", 95)',
    'top("click", 3)',
    'bottom("click", 2)',
    'mode("click")',
    'integral("click", 1m)',
    'elapsed("click", 1m)',
    'derivative(mean("click"), 1h)',
    'moving_average(mean("click"), 3)',
    'cumulative_sum(sum("click"))',
    'non_negative_difference(count("click"))',
    'mean("click") * 8 / 1000 AS kbits',
    '"click"',
    "*",                                    # invalid: SELECT *
    'mean("click"), "click"',               # invalid: mixed raw+agg
    'holt_winters(mean("click"), 10, 4)',   # invalid: excluded fn
    'sample("click", 5)',                   # invalid: excluded fn
    'percentile("click", 95), mean("click")',  # invalid combo
]

WHERES = [
    "",
    f"WHERE {RANGE}",
    f"WHERE \"host\" = 'h1' AND {RANGE}",
    f"WHERE (\"host\" = 'h1' OR \"host\" = 'h2') AND {RANGE}",
    f"WHERE \"host\" =~ /^(h0|h2)$/ AND {RANGE}",
    f"WHERE \"host\" !~ /^(h0)$/ AND {RANGE}",
    f"WHERE \"click\" > 50 AND {RANGE}",
    f"WHERE \"host\" = 'h1' AND \"host\" = 'h2' AND {RANGE}",  # empty set
    "WHERE time >= now() - 7d",             # invalid: no anchor
    "WHERE \"host\" =~ /h.*/",              # invalid: general regex
    "WHERE \"host\" = 'h1' OR \"host\" = 'h2'",  # invalid: bare OR
    "WHERE time >= '2024-01-08T00:00:00+02:00'",  # invalid: offset
]

GROUPS = [
    "",
    "GROUP BY time(6h) fill(none)",
    "GROUP BY time(1d)",
    'GROUP BY time(1h, 15m) fill(none)',
    'GROUP BY time(6h), "host" fill(none)',
    'GROUP BY "host", "dc"',
    "GROUP BY *",
    "GROUP BY time(1d) fill(previous)",
    "GROUP BY time(1d) fill(0)",
    "GROUP BY time(1d) fill(linear)",       # invalid
    "GROUP BY time(500ms)",                 # invalid: sub-second
    'GROUP BY "nosuchtag"',                 # invalid
]

TAILS = [
    "",
    "ORDER BY time DESC LIMIT 5",
    "LIMIT 3 OFFSET 1",
    "SLIMIT 2",
    "tz('America/Chicago')",                # invalid
    "LIMIT abc",                            # invalid
]


def _compositions():
    """Deterministic stride sampling of the 4-pool product: every
    fragment of every pool appears in many contexts without running
    the full 17k-member product."""
    out = []
    np, nw, ng, nt = len(PROJECTIONS), len(WHERES), len(GROUPS), len(TAILS)
    for i in range(420):
        p = PROJECTIONS[i % np]
        w = WHERES[(i * 7 + i // np) % nw]
        g = GROUPS[(i * 3 + i // (np * 2)) % ng]
        t = TAILS[(i * 11 + i // ng) % nt]
        out.append(" ".join(x for x in (f"SELECT {p} FROM events", w, g, t) if x))
    return out


def test_totality_compile_or_named_refusal(spark, store):
    """Every composition compiles (schema analysis forced) or raises
    InfluxQLError. Any other exception type is a totality bug — an
    internal error leaked past the refusal surface."""
    compiled = refused = 0
    for stmt in _compositions():
        try:
            df = compile_influxql(spark, stmt, store)
            _ = df.columns  # force analysis
            compiled += 1
        except InfluxQLError:
            refused += 1
        except Exception as e:  # noqa: BLE001 — the property under test
            raise AssertionError(
                f"non-InfluxQLError {type(e).__name__} leaked for: "
                f"{stmt!r}\n{e}"
            ) from e
    # both sides of the surface must actually be exercised (most
    # stride pairings carry at least one invalid or incompatible
    # fragment, so refusals dominate by design — the valid paths get
    # their dense coverage from the per-feature tests)
    assert compiled >= 40, (compiled, refused)
    assert refused >= 200, (compiled, refused)


FNS = [
    "mean", "count", "sum", "min", "max", "first", "last", "median",
    "spread", "stddev",
]


@pytest.mark.parametrize("every", ["1h", "6h"])
@pytest.mark.parametrize("host_pin", [None, "h1"])
def test_differential_matches_flux_grid(spark, store, every, host_pin):
    """The full incremental-aggregate grid in both languages: grouped
    by the complete tag key so the Flux table split and the InfluxQL
    GROUP BY coincide — identical row sets required (shared scan +
    shared aggregate expressions make any diff a front-end bug)."""
    from time_series_data_pipeline_spark.flux import compile_flux

    host_iql = f"\"host\" = '{host_pin}' AND " if host_pin else ""
    host_flux = (
        f'  |> filter(fn: (r) => r["host"] == "{host_pin}")\n'
        if host_pin
        else ""
    )
    for fn in FNS:
        iql = compile_influxql(
            spark,
            f'SELECT {fn}("click") AS v FROM events WHERE {host_iql}'
            f'{RANGE} GROUP BY time({every}), "host", "dc" fill(none)',
            store,
        )
        flux = compile_flux(
            spark,
            f"""
            from(bucket: "tagged")
              |> range(start: "2024-01-08 00:00:00", stop: "2024-01-15 00:00:00")
              |> filter(fn: (r) => r["_measurement"] == "events")
              |> filter(fn: (r) => r["_field"] == "click")
            {host_flux}
              |> aggregateWindow(every: {every}, fn: {fn}, createEmpty: false)
            """,
            {"tagged": store},
        )
        got = {
            (r["time"], r["host"], r["dc"], r["v"]) for r in iql.collect()
        }
        want = {
            (r["window_start"], r["host"], r["dc"], r[fn])
            for r in flux.collect()
        }
        assert got == want and got, f"fn={fn} every={every} host={host_pin}"
