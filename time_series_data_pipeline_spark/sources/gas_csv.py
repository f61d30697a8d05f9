"""Wide gas-sensor CSV ingestion (reference parity: the transform DAG).

Reference: transform.py:11-56 + ETL.py:13-55 of
rahulkorpe/time-series-data-pipeline — per-file Dask read, row-wise
Python timestamp strings, psycopg2 membership probe. Here the whole DAG
is one declarative map-only plan (SURVEY.md §3.1-3.2):

- explicit ``StructType`` instead of header inference (transform.py:14) —
  one deterministic pass, no sampling job;
- date-in-filename via ``input_file_name()`` + regexp (transform.py:18-19)
  — no driver-side loop over files;
- native ``TimestampType`` arithmetic instead of the reference's
  row-at-a-time ``str(timedelta)`` lambdas (transform.py:26-34), which
  were its slowest path AND its bug source (unpadded hours, the
  ``'1 day, 0:00:00'`` artifact);
- the processed-file set (ETL.py:27-55, Postgres probe-and-insert) as a
  left-anti join.

Documented deviation: the 24 h cap is strict ``< 86400`` where the
reference uses ``<=`` (transform.py:22) — its kept boundary row produced
the malformed timestamp ``'... 1 day, 0:00:00Z'`` (SURVEY.md §2.3).

Scale: every step is narrow (no shuffle) — at 100 TB this is a pure
map job whose parallelism is the input-split count; filename-date
derivation is per-partition metadata, not a per-row regex cost worth
worrying about (constant-folded per split by codegen is not guaranteed,
but the regex runs on an already-in-memory string either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TIME_COL = "time_s"

#: In-flight column name → original CSV header / InfluxDB field label
#: (reference README.md:43-46; cast block transform.py:40-46). We carry
#: SAFE snake_case identifiers through the engine — the original labels
#: contain ``.`` (``Humidity (%r.h.)``), which Spark's column resolver
#: parses as struct access, a landmine for every downstream expression.
#: The original label is restored as the ``_field`` value at unpivot
#: time, so the query surface (Flux ``_field == "CO (ppm)"``) is
#: unchanged.
FIELD_LABELS: dict[str, str] = {
    "co_ppm": "CO (ppm)",
    "humidity_rh": "Humidity (%r.h.)",
    "temperature_c": "Temperature (C)",
    "flow_rate_ml_min": "Flow rate (mL/min)",
    "heater_voltage_v": "Heater voltage (V)",
    **{f"r{i}_mohm": f"R{i} (MOhm)" for i in range(1, 15)},
}

#: The 19 measurement columns (safe names), in CSV column order.
VALUE_COLS = tuple(FIELD_LABELS)

#: Explicit read schema — never inferSchema (deterministic, single
#: pass). With ``header=True`` + explicit schema the CSV reader binds
#: columns POSITIONALLY and skips the header row, so the safe names
#: here rename the original headers for free.
GAS_SCHEMA = T.StructType(
    [T.StructField(TIME_COL, T.DoubleType())]
    + [T.StructField(c, T.DoubleType()) for c in VALUE_COLS]
)

#: Seconds in 24 h; rows at or past this boundary are dropped (strict).
DAY_SECONDS = 86400


def read_wide_csv(spark: SparkSession, path: str) -> DataFrame:
    """Scan one or many wide daily CSVs (glob ok). Subsumes the
    reference's per-file ``read_csv`` + the 19 ``astype`` casts: the
    schema pins every column to double at scan time."""
    return spark.read.schema(GAS_SCHEMA).option("header", True).csv(path)


def read_wide_csv_tolerant(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): the dead-letter variant of the wide scan
    (same contract as sources/jsonl.read_events_jsonl) for sensor rigs
    that emit garbage lines — text in numeric columns, extra fields,
    log output interleaved into the capture file. One PERMISSIVE scan:
    rows whose cells all parse stay in ``good``; malformed rows surface
    with their raw text in the corrupt column and route to the
    quarantine with their source file (replay needs to know which
    day-file to re-pull). CSV is positional, so a truncated row (fewer
    columns) is structural damage and quarantines too — unlike JSONL,
    where an absent key is legal and only unparseable lines quarantine
    (sources/jsonl.py)."""
    schema = T.StructType(
        list(GAS_SCHEMA.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .withColumn(
            "file_name", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        # one parse feeds both outputs; corrupt-column-only reads need a
        # materialized parse (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        .cache()
    )
    good = raw.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    quarantine = raw.filter(F.col("_corrupt").isNotNull()).select(
        "file_name", F.col("_corrupt").alias("raw_line")
    )
    return good, quarantine


def with_event_time(df: DataFrame) -> DataFrame:
    """Derive ``_time`` (TimestampType) and ``file_name`` from the
    filename-borne date plus the in-file seconds offset, and apply the
    24 h cap.

    Replaces transform.py:18-34 (regex date + strptime + two row-wise
    ``.apply`` lambdas building RFC3339 strings) with native expressions:
    ``to_timestamp(yyyymmdd) + time_s seconds`` at µs precision —
    fractional 3.5 Hz steps survive exactly.
    """
    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    day = F.to_timestamp(F.regexp_extract(fname, r"\d{8}", 0), "yyyyMMdd")
    ts = F.timestamp_micros(
        F.unix_micros(day) + (F.col(TIME_COL) * 1_000_000).cast("long")
    )
    return (
        df.filter(F.col(TIME_COL) < DAY_SECONDS)  # strict: see module doc
        .withColumn("file_name", fname)
        .withColumn("_time", ts)
    )


def new_files(discovered: DataFrame, processed: DataFrame) -> DataFrame:
    """Exactly-once-per-file membership (reference ETL.py:27-55: per-row
    ``SELECT COUNT(*)`` probe + eager INSERT against Postgres) as a
    single left-anti join on ``file_name``.

    The processed set is small metadata (one row per file ever seen) —
    broadcast it so discovery never shuffles.
    """
    return discovered.join(
        F.broadcast(processed.select("file_name")), "file_name", "left_anti"
    )


def ingest_wide(spark: SparkSession, path: str) -> DataFrame:
    """Full batch backfill: scan → derive time → cap. One narrow job."""
    return with_event_time(read_wide_csv(spark, path))
