"""End-to-end reference parity: the WHOLE gas-sensor pipeline at small
scale — 13 daily CSVs → batch backfill → partitioned bucket → the three
dashboard queries of SURVEY.md §3.3 (field-variable windowed mean at
two intervals, last-value gauges) — cross-checked against DuckDB
running the equivalent SQL on the bucket parquet itself.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from time_series_data_pipeline_spark.sources import bucket as bkt
from time_series_data_pipeline_spark.sources import gas_csv

N_DAYS = 13
ROWS_PER_DAY = 40  # t = 0, 60, 120, ... (fits in one hour)


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    """Build the corpus, run the backfill, return the bucket path."""
    root = tmp_path_factory.mktemp("e2e")
    src = root / "csv"
    src.mkdir()
    header = ",".join(["Time (s)", *gas_csv.FIELD_LABELS.values()])
    for d in range(N_DAYS):
        day = f"201610{d + 1:02d}"
        rows = [header]
        for k in range(ROWS_PER_DAY):
            t = k * 60.0
            # value for column j on day d at step k — deterministic, varied
            rows.append(",".join(str((d + 1) * 1000 + k + j) for j in range(20)))
        (src / f"{day}_000000.csv").write_text("\n".join(rows) + "\n")

    bucket_path = str(root / "bucket")
    long_df = bkt.to_long(
        gas_csv.ingest_wide(spark, str(src)),
        "gas",
        value_cols=list(gas_csv.VALUE_COLS),
        field_labels=gas_csv.FIELD_LABELS,
    )
    bkt.write_bucket(long_df, bucket_path)
    return bucket_path


def _duck(bucket_path: str, sql: str):
    import datetime

    con = duckdb.connect()
    files = os.path.join(bucket_path, "**", "*.parquet")
    con.execute(
        f"CREATE VIEW b AS SELECT * "
        f"FROM read_parquet('{files}', hive_partitioning=true)"
    )

    def _naive(v):
        # the bucket writes INT64 micros with isAdjustedToUTC (round 6;
        # INT96 carried no stats) → DuckDB yields tz-aware datetimes
        # where Spark collects naive session-local (UTC) ones: same
        # instant, normalize for comparison
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v

    return [tuple(_naive(v) for v in row) for row in con.execute(sql).fetchall()]


def test_corpus_shape(spark, pipeline):
    b = bkt.read_bucket(spark, pipeline)
    assert b.count() == N_DAYS * ROWS_PER_DAY * 19
    assert b.select("_field").distinct().count() == 19


@pytest.mark.parametrize("field,every_s", [("CO (ppm)", 300), ("Heater voltage (V)", 900)])
def test_dashboard_windowed_mean_vs_duckdb(spark, pipeline, field, every_s):
    """photo/use-variable.png (5 m, variable field) and photo/voltage.png
    (15 m, literal field): range + measurement + field + window mean."""
    scanned = bkt.scan(
        bkt.read_bucket(spark, pipeline),
        measurement="gas",
        field=field,
        start="2016-10-03 00:00:00",
        stop="2016-10-11 00:00:00",
    )
    got = {
        (r["window_start"], r["_field"]): (round(r["avg_value"], 9), r["n"])
        for r in bkt.window_mean(scanned, f"{every_s} seconds").collect()
    }
    oracle = _duck(
        pipeline,
        f"""
        SELECT make_timestamp((epoch_us("_time")//{every_s * 1_000_000})
                              *{every_s * 1_000_000}) AS w,
               "_field",
               CAST(SUM(CAST("_value" AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_v,
               COUNT(*) AS n
        FROM b
        WHERE "_measurement" = 'gas' AND "_field" = '{field}'
          AND "_time" >= TIMESTAMP '2016-10-03' AND "_time" < TIMESTAMP '2016-10-11'
        GROUP BY 1, 2
        """,
    )
    expect = {(w, f): (round(v, 9), n) for w, f, v, n in oracle}
    assert got == expect
    assert len(got) > 0


def test_gauge_last_value_vs_duckdb(spark, pipeline):
    """photo/grafana-result.png gauges: latest reading per field."""
    from time_series_data_pipeline_spark.operators.timeseries import last_value_per_group

    b = bkt.scan(bkt.read_bucket(spark, pipeline), measurement="gas")
    got = {
        r["_field"]: (r["last_ts"], r["last_value"])
        for r in last_value_per_group(b, "_time", "_value", ["_field"]).collect()
    }
    oracle = _duck(
        pipeline,
        """
        SELECT "_field", "_time", "_value" FROM b
        QUALIFY row_number() OVER (PARTITION BY "_field"
                                   ORDER BY "_time" DESC, "_value" DESC) = 1
        """,
    )
    assert got == {f: (t, v) for f, t, v in oracle}
    assert len(got) == 19


def test_partition_pruning_in_plan(spark, pipeline):
    """Date and measurement predicates must compile to PartitionFilters
    (directory pruning) — the layout IS the time index (SCALE.md §1)."""
    one_day = bkt.scan(
        spark.read.parquet(pipeline),
        measurement="gas",
        start="2016-10-05 00:00:00",
        stop="2016-10-06 00:00:00",
    ).filter(F.col("_date") == "2016-10-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "_date" in pf and "_measurement" in pf
    # time range pushes to parquet row groups (DataFilters on _time)
    assert "_time" in plan.split("PushedFilters: [")[1].split("]")[0]
