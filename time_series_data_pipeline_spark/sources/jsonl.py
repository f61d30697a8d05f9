"""Error-tolerant JSONL (newline-delimited JSON) event ingestion.

Real event firehoses contain malformed lines — truncated writes, stray
log output, encoding damage. Dropping them silently corrupts counts;
failing the batch on one bad line stalls the pipeline. The standard
contract (what production collectors implement) is: parse with an
EXPLICIT schema, route unparseable lines to a quarantine with the raw
text preserved, and publish both streams — good rows forward, bad rows
to a dead-letter table for inspection/replay.

Spark-first: the JSON source's PERMISSIVE mode with
``columnNameOfCorruptRecord`` does exactly this in one scan — corrupt
lines surface as rows whose typed columns are NULL and whose corrupt
column carries the raw line. No second parse pass, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: explicit event schema + the corrupt-record column. An inferred
#: schema is forbidden here: inference samples the data, so a bad batch
#: could silently change column types mid-pipeline.
EVENT_JSONL_SCHEMA = (
    "event_id long, event_type string, ts timestamp, value double, "
    "user_id long, _corrupt string"
)


def read_events_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): one permissive scan splits parseable events
    from malformed lines. ``good`` carries the typed columns;
    ``quarantine`` carries the raw offending line for the dead-letter
    sink. A line is quarantined iff the corrupt column is non-null —
    partial rows with missing fields parse as NULLs and stay in
    ``good`` (schema-level nullability is the DQ gate's job, not the
    parser's)."""
    raw = (
        spark.read.schema(EVENT_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        # cached: (a) both outputs share ONE parse of the files, and
        # (b) Spark refuses corrupt-column-only queries off a raw scan
        # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the quarantine stream
        # must read a materialized parse
        .cache()
    )
    good = raw.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    quarantine = raw.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return good, quarantine
