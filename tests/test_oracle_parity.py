"""Local replica of the driver's correctness gate (SURVEY.md §5.1):
run every registered query on Spark AND its DuckDB oracle on the same
parquet, compare row count, column names, and exact values
(order-insensitive). Strict equality — the engine's determinism policy
(exact-decimal aggregation, shared rounding) is designed to make even
float outputs bit-identical across engines.

Runs at sf0.001 for speed; the driver runs sf0.01.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from time_series_data_pipeline_spark.catalog import TABLES
from time_series_data_pipeline_spark.queries import ORACLE, QUERIES

from .conftest import SF_SMOKE

SF = os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMOKE)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _rows_to_multiset(cols, rows):
    # sort columns by name (the driver's contract), then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_schema_has_no_hugeint(name):
    """DuckDB's SUM(BIGINT) returns HUGEINT, which pandas materializes
    as float64 ("42.0") while Spark's int64 renders "42" — so the
    driver's value-hash diverges even on bit-identical values (the
    VERDICT-r6 pack_sequences red row). Pin, by binding each oracle's
    plan, that no oracle result column is HUGEINT: every integer SUM
    (plain or windowed) must be wrapped in CAST(... AS BIGINT)."""
    con = _duck(SF)
    rel = con.sql(ORACLE[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not bad, (
        f"{name}: HUGEINT column(s) {bad} — wrap the integer SUM in "
        f"CAST(... AS BIGINT) so pandas doesn't coerce to float64"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = list(df.columns)

    if name not in ORACLE:
        # rows-only contract: must run and return a stable schema
        assert isinstance(spark_rows, list)
        assert len(spark_cols) > 0
        return

    con = _duck(SF)
    res = con.execute(ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _rows_to_multiset(spark_cols, spark_rows)
    d = _rows_to_multiset(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[:3]}"
