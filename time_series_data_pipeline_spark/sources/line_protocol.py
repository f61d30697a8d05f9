"""InfluxDB line-protocol source — the reference store's NATIVE wire
format, parsed entirely JVM-side into the bucket schema.

The reference's own ingest arrives as CSV (dags/ETL.py), but the
engine claims the InfluxDB data model (README.md:155-161) and every
real InfluxDB corpus ships as line protocol::

    measurement[,tag1=v1,tag2=v2] field1=1.5[,field2=2i] [timestamp]

Grammar subset (documented; everything else lands in the dead-letter
frame with a named reason, the ``read_wide_csv_tolerant`` discipline):

* escapes: ``\\,`` ``\\=`` ``\\  `` (backslash-comma/equals/space) in
  measurement, tag keys/values and field keys — handled via
  fixed-width negative-lookbehind splits (``(?<!\\\\)``), then
  unescaped. Backslash itself is LITERAL except immediately before a
  delimiter (upstream's model) — an identifier whose literal
  backslash precedes a delimiter is unrepresentable in the wire
  format itself, upstream's documented limitation (property-tested:
  every delimiter round-trips, tests/test_line_protocol.py);
* field values: floats and ``NNNi`` integers (both → double ``_value``
  — the bucket's one value type). Non-numeric values are quarantined,
  never silently coerced: space-free quoted strings / booleans / uints
  reject as ``non_numeric_field``; a quoted string carrying an
  unescaped space or ``=`` rejects structurally (``malformed_line`` /
  ``malformed_kv`` — the splitter sees extra parts before the value
  type is ever examined);
* a bare tag/field key with no ``=``, or an unescaped ``=`` inside a
  tag value (both parse errors upstream), quarantine as
  ``malformed_kv`` — the limit-2 key/value split alone would silently
  swallow the extra ``=``;
* timestamps: integer epoch in ``ns`` (upstream default), ``us``,
  ``ms`` or ``s``; a line WITHOUT a timestamp is quarantined
  (``missing_timestamp``) — upstream stamps server wall-clock arrival
  time, which would break replayability (the same explicit-bounds
  rule as range());
* a line with DUPLICATE tag or field keys quarantines
  (``duplicate_key``): it is invalid upstream, and under ANSI a
  duplicate key in ``map_from_entries`` would otherwise abort the
  whole scan (the map build itself dedupes keep-first so the
  expression stays total).

Everything is built-in-function Catalyst (split/transform/
map_from_entries/explode) — one narrow map per line, no Python, no
shuffle; parsing throughput scales with input splits like any text
scan. Declared ``tag_keys`` become PROMOTED columns (missing on a
line → NULL) with the full map mirrored in ``tags`` — the storage
contract of sources/bucket.py; undeclared tag keys still ride the
map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: negative-lookbehind delimiters: split on a delimiter NOT preceded
#: by a backslash (Java regex, fixed-width lookbehind)
_SP = r"(?<!\\) "
_COMMA = r"(?<!\\),"
_EQ = r"(?<!\\)="

#: epoch-integer scale to microseconds per declared input unit
_UNIT_DIV = {"ns": 1000, "us": 1, "ms": None, "s": None}
_UNIT_MUL = {"ms": 1000, "s": 1_000_000}


def _unescape(col):
    return F.regexp_replace(col, r"\\([,= ])", "$1")


def _kv_entries(pairs):
    """k=v pair array → struct<key, value> array (unescaped)."""
    return F.transform(
        pairs,
        lambda kv: F.struct(
            _unescape(F.split(kv, _EQ, 2).getItem(0)).alias("key"),
            _unescape(
                F.try_element_at(F.split(kv, _EQ, 2), F.lit(2))
            ).alias("value"),
        ),
    )


def _has_bad_kv(pairs):
    """True when any pair is not EXACTLY one unescaped ``=`` between a
    key and a value: a bare key (``t``), or an unescaped ``=`` inside
    a value (``t=a=b``) — both parse errors upstream; the limit-2
    split alone would silently swallow the latter (review r11)."""
    return F.exists(
        pairs, lambda kv: F.size(F.split(kv, _EQ)) != F.lit(2)
    )


def _kv_keys(entries):
    return F.transform(entries, lambda e: e["key"])


def _kv_map(entries):
    """Entries → map, keep-FIRST on duplicate keys: under ANSI,
    map_from_entries THROWS on a duplicate key (DUPLICATED_MAP_KEY) —
    one hostile line must never abort the scan; duplicate-key lines
    are additionally quarantined (``duplicate_key``), the dedup here
    only keeps the expression total."""
    keys = _kv_keys(entries)
    deduped = F.filter(
        entries,
        lambda e, i: F.array_position(keys, e["key"]) == i + F.lit(1),
    )
    return F.map_from_entries(deduped)


def _has_dup_keys(entries):
    keys = _kv_keys(entries)
    return F.size(F.array_distinct(keys)) != F.size(keys)


def _parsed(lines: DataFrame, time_unit: str) -> DataFrame:
    """Shared shredding: one row per FIELD per line, with raw value and
    a NULL ``_reject`` for good rows / a named reason otherwise."""
    if time_unit not in _UNIT_DIV:
        raise ValueError(f"time_unit must be one of {sorted(_UNIT_DIV)}")
    parts = F.split(F.trim(F.col("value")), _SP)
    ident = F.try_element_at(parts, F.lit(1))
    df = (
        lines.filter(F.length(F.trim(F.col("value"))) > 0)
        # upstream comments — trimmed like the emptiness check, so an
        # indented comment never pollutes the dead-letter frame
        .filter(~F.trim(F.col("value")).startswith("#"))
        .select(
            F.col("value").alias("_raw"),
            F.size(parts).alias("__n"),
            ident.alias("__ident"),
            F.try_element_at(parts, F.lit(2)).alias("__fieldset"),
            F.when(F.size(parts) >= 3, F.try_element_at(parts, F.lit(3))).alias("__ts"),
        )
    )
    ident_parts = F.split(F.col("__ident"), _COMMA)
    measurement = _unescape(F.try_element_at(ident_parts, F.lit(1)))
    tag_pairs = F.slice(
        ident_parts, 2, F.greatest(F.size(ident_parts) - 1, F.lit(0))
    )
    tag_entries = _kv_entries(tag_pairs)
    tags = _kv_map(tag_entries)
    dup_tag = _has_dup_keys(tag_entries)
    if time_unit in _UNIT_MUL:
        ts_us = F.try_multiply(
            F.col("__ts").try_cast("long"), F.lit(_UNIT_MUL[time_unit])
        )
    else:
        # integer FLOOR division, never a double detour: a ns epoch
        # (~1.7e18) is beyond double's 53-bit mantissa — float division
        # would move timestamps by whole microseconds. DIV truncates
        # toward ZERO, so pre-epoch (negative) timestamps need the
        # floor correction or they shift up 1 µs (review r11).
        # TRY_CAST: a malformed timestamp quarantines (bad_timestamp),
        # never throws mid-scan.
        d = _UNIT_DIV[time_unit]
        ts_us = F.expr(
            f"TRY_CAST(__ts AS BIGINT) DIV {d} - "
            f"(CASE WHEN TRY_CAST(__ts AS BIGINT) % {d} < 0 "
            f"THEN 1 ELSE 0 END)"
        )
    field_pairs = F.split(F.col("__fieldset"), _COMMA)
    field_entries = _kv_entries(field_pairs)
    shredded = df.select(
        "_raw",
        "__n",
        measurement.alias("_measurement"),
        tags.alias("tags"),
        F.coalesce(
            dup_tag | _has_dup_keys(field_entries), F.lit(False)
        ).alias("__dup"),
        F.coalesce(
            _has_bad_kv(tag_pairs) | _has_bad_kv(field_pairs),
            F.lit(False),
        ).alias("__badkv"),
        F.col("__fieldset"),
        F.col("__ts"),
        ts_us.alias("__ts_us"),
    ).select(
        "*",
        F.explode_outer(_kv_map(field_entries)).alias(
            "_field", "__rawval"
        ),
    )
    int_form = F.col("__rawval").rlike(r"^-?\d+i$")
    num = F.when(
        int_form,
        F.regexp_replace(F.col("__rawval"), "i$", "").cast("double"),
    ).otherwise(F.col("__rawval").try_cast("double"))
    reject = (
        F.when(F.col("__n") < 2, F.lit("malformed_line"))
        .when(F.col("__n") > 3, F.lit("malformed_line"))
        .when(F.col("__ts").isNull(), F.lit("missing_timestamp"))
        .when(
            F.col("__ts_us").isNull(), F.lit("bad_timestamp")
        )
        .when(F.col("__badkv"), F.lit("malformed_kv"))
        .when(F.col("__dup"), F.lit("duplicate_key"))
        .when(F.col("_field").isNull(), F.lit("malformed_line"))
        .when(num.isNull(), F.lit("non_numeric_field"))
    )
    return shredded.select(
        "_raw",
        F.timestamp_micros(F.col("__ts_us")).alias("_time"),
        "_measurement",
        "_field",
        num.alias("_value"),
        "tags",
        reject.alias("_reject"),
    )


def parse_line_protocol(
    lines: DataFrame,
    tag_keys: list[str] | None = None,
    time_unit: str = "ns",
) -> DataFrame:
    """Good rows in the bucket schema (one row per field per line),
    with each declared ``tag_keys`` promoted to a top-level string
    column (NULL where a line lacks it). ``lines`` is any one-column
    text frame (``spark.read.text`` / ``readStream.text``)."""
    from .bucket import BUCKET_COLS

    tag_keys = list(tag_keys or [])
    if len(tag_keys) != len(set(tag_keys)):
        raise ValueError(f"tag_keys lists a key twice: {tag_keys}")
    reserved = set(tag_keys) & ({*BUCKET_COLS, "_date"})
    if reserved:
        # a promoted tag named like a core column would silently
        # produce duplicate column names (same contract as to_long)
        raise ValueError(
            f"tag_keys collide with bucket schema columns: {sorted(reserved)}"
        )
    p = _parsed(lines, time_unit).filter(F.col("_reject").isNull())
    tag_cols = [
        F.try_element_at(F.col("tags"), F.lit(k)).alias(k)
        for k in tag_keys
    ]
    return p.select(
        "_time", "_measurement", "_field", "_value", *tag_cols, "tags"
    )


def line_protocol_rejects(
    lines: DataFrame, time_unit: str = "ns"
) -> DataFrame:
    """The dead-letter frame: (raw line, reason) for every shredded
    row the subset refuses — quarantine-and-continue, never silent
    coercion (the CSV tolerant-scan discipline)."""
    return (
        _parsed(lines, time_unit)
        .filter(F.col("_reject").isNotNull())
        .select(F.col("_raw").alias("line"), F.col("_reject").alias("reason"))
        .distinct()
    )


def read_line_protocol(
    spark: SparkSession,
    path: str,
    tag_keys: list[str] | None = None,
    time_unit: str = "ns",
) -> DataFrame:
    """Batch scan: line-protocol text file(s)/glob → bucket-schema
    frame, ready for ``bucket.write_bucket``."""
    return parse_line_protocol(
        spark.read.text(path), tag_keys=tag_keys, time_unit=time_unit
    )


def stream_line_protocol(
    spark: SparkSession,
    path: str,
    tag_keys: list[str] | None = None,
    time_unit: str = "ns",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source: file-arrival line-protocol directory → the
    same parsed frame (identical plan per micro-batch); pair with the
    exactly-once bucket sink (streaming/ingest) exactly like the CSV
    stream — the source's checkpointed file log provides the
    at-most-once file accounting."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_line_protocol(
        reader.text(path), tag_keys=tag_keys, time_unit=time_unit
    )


def _escape(col):
    return F.regexp_replace(col, r"([,= ])", r"\\$1")


def _unexportable(df: DataFrame):
    """Rows the wire format CANNOT represent (review r11): an
    identifier ending in a literal backslash would make the emitted
    structural delimiter after it look escaped (the parser's
    lookbehind cannot distinguish them — the format's own documented
    ambiguity), and a measurement starting with ``#`` would re-import
    as a comment. Interior backslashes round-trip fine (the escape
    pass never creates an ambiguous pair for them)."""
    from .bucket import tag_columns

    bad = (
        F.col("_measurement").endswith("\\")
        | F.col("_measurement").startswith("#")
        | F.col("_field").endswith("\\")
    )
    for k in tag_columns(df):
        bad = bad | F.coalesce(
            F.col(k).endswith("\\"), F.lit(False)
        )
    return bad


def line_protocol_unexportable(df: DataFrame) -> DataFrame:
    """The export-side dead-letter frame: rows ``to_line_protocol``
    excludes because the wire format cannot represent them — the
    mirror of ``line_protocol_rejects`` (account for every row, never
    silently corrupt or vanish one)."""
    return df.filter(_unexportable(df))


def to_line_protocol(df: DataFrame, time_unit: str = "ns") -> DataFrame:
    """Bucket frame → line-protocol text, one line per row (the
    export / replication / InfluxDB-write-API path — a reference user
    can round-trip a store back into their old system). Pure Catalyst
    string formatting: delimiters in measurement/tag/field identifiers
    are backslash-escaped (the parser's inverse over every
    REPRESENTABLE row — round-trip pinned by a property test over the
    delimiter alphabet; rows the wire format cannot represent are
    excluded, see ``line_protocol_unexportable``), tags come from the
    frame's PROMOTED columns in column order with NULL tags omitted
    (a missing tag is absence, not an empty value), ``_value`` renders
    via the JVM's round-trip double formatting, and timestamps render
    as integer epochs in ``time_unit``. Returns a one-column ``value``
    frame for ``df.write.text`` / any text sink."""
    from .bucket import tag_columns

    if time_unit not in _UNIT_DIV:
        raise ValueError(f"time_unit must be one of {sorted(_UNIT_DIV)}")
    bad_keys = [k for k in tag_columns(df) if k.endswith("\\")]
    if bad_keys:
        # a tag KEY is a schema decision, not data — raise, don't drop
        raise ValueError(
            f"tag column name(s) {bad_keys} end in a backslash — "
            "unrepresentable before the wire format's '=' delimiter"
        )
    if time_unit in _UNIT_MUL:
        # integer floor division back to the coarser unit
        m = _UNIT_MUL[time_unit]
        ts = F.expr(
            f"unix_micros(_time) DIV {m} - "
            f"(CASE WHEN unix_micros(_time) % {m} < 0 THEN 1 ELSE 0 END)"
        )
    else:
        ts = F.unix_micros("_time") * F.lit(_UNIT_DIV[time_unit])
    ident = _escape(F.col("_measurement"))
    for k in tag_columns(df):
        ident = F.concat(
            ident,
            F.when(
                F.col(k).isNotNull(),
                F.concat(
                    F.lit(","), _escape(F.lit(k)), F.lit("="), _escape(F.col(k))
                ),
            ).otherwise(F.lit("")),
        )
    line = F.concat(
        ident,
        F.lit(" "),
        _escape(F.col("_field")),
        F.lit("="),
        F.col("_value").cast("string"),
        F.lit(" "),
        ts.cast("string"),
    )
    return (
        df.filter(F.col("_value").isNotNull())
        # unrepresentable rows (trailing-backslash identifiers,
        # '#'-leading measurements) are EXCLUDED, never emitted as
        # corrupt lines — read them back via line_protocol_unexportable
        .filter(~_unexportable(df))
        .select(line.alias("value"))
    )
