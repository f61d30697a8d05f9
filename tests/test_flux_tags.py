"""Tag-dimension support (round 11, VERDICT r10 item 1): tags are the
InfluxDB data model's primary series dimension — these tests pin the
whole chain: promoted-column storage (to_long/write_bucket), scan
pushdown (scan/scan_bucket tags=), the compiled table key
(_measurement, _field, tags...), group()/keyValues re-keying over tag
columns, schema.tagKeys/tagValues over a tagged store, and the
refusal semantics on untagged stores.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_data_pipeline_spark.flux import FluxError, compile_flux
from time_series_data_pipeline_spark.queries.timeseries_q import (
    _event_bucket_path,
    _tagged_bucket_path,
)
from time_series_data_pipeline_spark.sources import bucket as bkt

from .conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def wide_plan_strings(spark):
    # PushedFilters renders through maxMetadataStringLength (default
    # 100) — too short to show a tag predicate behind the time bounds
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", None)
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    yield
    if prev is None:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    else:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


@pytest.fixture(scope="module")
def tagged(spark) -> str:
    return _tagged_bucket_path(spark, SF_SMOKE)


@pytest.fixture(scope="module")
def untagged(spark) -> str:
    return _event_bucket_path(spark, SF_SMOKE)


RANGE = {
    "timeRangeStart": "2024-01-08T00:00:00Z",
    "timeRangeStop": "2024-01-15T00:00:00Z",
}


# -- storage: to_long tag promotion ------------------------------------


def test_to_long_promotes_tags_and_mirrors_map(spark):
    wide = spark.createDataFrame(
        [("2024-01-01 00:00:00", "a", 1.0, 2.0)],
        "t string, h string, x double, y double",
    ).select(F.col("t").cast("timestamp").alias("t"), "h", "x", "y")
    out = bkt.to_long(wide, "m", time_col="t", tag_cols=["h"])
    rows = out.collect()
    assert sorted(r["_field"] for r in rows) == ["x", "y"]
    for r in rows:
        assert r["h"] == "a"
        assert dict(r["tags"]) == {"h": "a"}
    # promoted tag columns sit between _value and tags
    assert out.columns == ["_time", "_measurement", "_field", "_value", "h", "tags"]


def test_to_long_rejects_tag_value_overlap_and_reserved_names(spark):
    wide = spark.createDataFrame(
        [("2024-01-01 00:00:00", "a", 1.0)], "t string, h string, x double"
    ).select(F.col("t").cast("timestamp").alias("t"), "h", "x")
    with pytest.raises(ValueError, match="overlap"):
        bkt.to_long(wide, "m", time_col="t", value_cols=["x"], tag_cols=["x"])
    with pytest.raises(ValueError, match="collide"):
        bkt.to_long(
            wide.withColumnRenamed("h", "_field"),
            "m",
            time_col="t",
            value_cols=["x"],
            tag_cols=["_field"],
        )


def test_tag_columns_contract(spark, tagged):
    df = bkt.read_bucket(spark, tagged)
    assert bkt.tag_columns(df) == ["host", "dc"]


# -- scan: tag predicates ----------------------------------------------


def test_scan_tag_equality_promoted_and_map_fallback(spark, tagged):
    df = bkt.read_bucket(spark, tagged)
    promoted = bkt.scan(df, tags={"host": "h1"})
    assert promoted.filter(F.col("host") != "h1").count() == 0
    # same rows via the map-only fallback (drop the promoted column)
    map_only = bkt.scan(df.drop("host"), tags={"host": "h1"})
    assert map_only.count() == promoted.count() > 0


def test_scan_bucket_tag_pushdown_reaches_parquet(spark, tagged, wide_plan_strings):
    df = bkt.scan_bucket(
        spark,
        tagged,
        measurement="events",
        field="click",
        tags={"host": "h1"},
        start="2024-01-08 00:00:00",
        stop="2024-01-15 00:00:00",
    )
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters")[1][:2000]
    assert "EqualTo(host,h1)" in pushed


# -- compiled table key ------------------------------------------------


def test_tagged_aggregate_keys_on_full_series_key(spark, tagged):
    out = compile_flux(
        spark,
        """
        from(bucket: "tagged")
          |> range(start: v.timeRangeStart, stop: v.timeRangeStop)
          |> filter(fn: (r) => r["_measurement"] == "events")
          |> filter(fn: (r) => r["_field"] == "click")
          |> aggregateWindow(every: 1d, fn: mean, createEmpty: false)
        """,
        {"tagged": tagged},
        params=dict(RANGE),
    )
    assert out.columns == [
        "window_start", "_measurement", "_field", "host", "dc", "mean", "n",
    ]
    # every (host, dc) combination forms its own series
    assert out.select("host", "dc").distinct().count() == 12


def test_group_except_drops_listed_tag(spark, tagged):
    out = compile_flux(
        spark,
        """
        from(bucket: "tagged")
          |> range(start: v.timeRangeStart, stop: v.timeRangeStop)
          |> filter(fn: (r) => r["_measurement"] == "events")
          |> filter(fn: (r) => r["_field"] == "click")
          |> group(columns: ["dc"], mode: "except")
          |> mean()
        """,
        {"tagged": tagged},
        params=dict(RANGE),
    )
    assert out.columns == ["_measurement", "_field", "host", "mean", "n"]
    assert out.count() == 4  # one row per host


def test_keyvalues_over_tag_columns(spark, tagged):
    out = compile_flux(
        spark,
        """
        from(bucket: "tagged")
          |> range(start: v.timeRangeStart, stop: v.timeRangeStop)
          |> filter(fn: (r) => r["_measurement"] == "events")
          |> keyValues(keyColumns: ["host", "dc"])
        """,
        {"tagged": tagged},
        params=dict(RANGE),
    )
    keys = {(r["_key"], r["_value"]) for r in out.collect()}
    assert {k for k, _ in keys} == {"host", "dc"}
    assert {v for k, v in keys if k == "host"} == {"h0", "h1", "h2", "h3"}


def test_columns_lists_tag_labels(spark, tagged):
    out = compile_flux(
        spark,
        """
        from(bucket: "tagged")
          |> range(start: v.timeRangeStart, stop: v.timeRangeStop)
          |> filter(fn: (r) => r["_measurement"] == "events")
          |> filter(fn: (r) => r["_field"] == "click")
          |> group(columns: ["_field"])
          |> columns(column: "label")
        """,
        {"tagged": tagged},
        params=dict(RANGE),
    )
    labels = {r["label"] for r in out.collect()}
    assert labels == {"_measurement", "_field", "host", "dc", "_time", "_value"}


def test_tag_filter_pushdown_in_compiled_plan(spark, tagged, wide_plan_strings):
    out = compile_flux(
        spark,
        """
        from(bucket: "tagged")
          |> range(start: v.timeRangeStart, stop: v.timeRangeStop)
          |> filter(fn: (r) => r["_measurement"] == "events")
          |> filter(fn: (r) => r["host"] == "h1")
          |> filter(fn: (r) => r["_field"] == "click")
          |> aggregateWindow(every: 1h, fn: mean, createEmpty: false)
        """,
        {"tagged": tagged},
        params=dict(RANGE),
    )
    plan = plan_of(out)
    assert "EqualTo(host,h1)" in plan.split("PushedFilters")[1][:2000]


def test_two_pins_on_same_tag_conjoin(spark, tagged):
    # second equality on an already-pinned tag stays a residual row
    # filter — the conjunction is empty, never the second value
    out = compile_flux(
        spark,
        """
        from(bucket: "tagged")
          |> range(start: v.timeRangeStart, stop: v.timeRangeStop)
          |> filter(fn: (r) => r["_measurement"] == "events")
          |> filter(fn: (r) => r["host"] == "h1")
          |> filter(fn: (r) => r["host"] == "h2")
          |> filter(fn: (r) => r["_field"] == "click")
          |> mean()
        """,
        {"tagged": tagged},
        params=dict(RANGE),
    )
    assert out.count() == 0


# -- schema queries -----------------------------------------------------


def test_schema_tag_keys_tagged_store(spark, tagged):
    out = compile_flux(
        spark,
        'import "influxdata/influxdb/schema"\n'
        'schema.tagKeys(bucket: "tagged")',
        {"tagged": tagged},
    )
    assert {r["_value"] for r in out.collect()} == {"host", "dc"}


def test_schema_tag_values_dc(spark, tagged):
    out = compile_flux(
        spark,
        'import "influxdata/influxdb/schema"\n'
        'schema.tagValues(bucket: "tagged", tag: "dc")',
        {"tagged": tagged},
    )
    assert {r["_value"] for r in out.collect()} == {"d0", "d1", "d2"}


# -- untagged stores: unchanged + clean refusals ------------------------


def test_untagged_store_rejects_tag_group(spark, untagged):
    with pytest.raises(FluxError, match="group ships"):
        compile_flux(
            spark,
            """
            from(bucket: "b")
              |> range(start: v.timeRangeStart, stop: v.timeRangeStop)
              |> filter(fn: (r) => r["_measurement"] == "events")
              |> group(columns: ["host"])
              |> mean()
            """,
            {"b": untagged},
            params=dict(RANGE),
        )


def test_untagged_store_rejects_unknown_tag_filter(spark, untagged):
    with pytest.raises(FluxError, match="unknown column.*host"):
        compile_flux(
            spark,
            """
            from(bucket: "b")
              |> range(start: v.timeRangeStart, stop: v.timeRangeStop)
              |> filter(fn: (r) => r["_measurement"] == "events")
              |> filter(fn: (r) => r["host"] =~ /h[12]/)
              |> mean()
            """,
            {"b": untagged},
            params=dict(RANGE),
        )


def test_untagged_natural_key_unchanged(spark, untagged):
    out = compile_flux(
        spark,
        """
        from(bucket: "b")
          |> range(start: v.timeRangeStart, stop: v.timeRangeStop)
          |> filter(fn: (r) => r["_measurement"] == "events")
          |> filter(fn: (r) => r["_field"] == "click")
          |> aggregateWindow(every: 1d, fn: mean, createEmpty: false)
        """,
        {"b": untagged},
        params=dict(RANGE),
    )
    assert out.columns == ["window_start", "_measurement", "_field", "mean", "n"]


# -- schema query family: predicate / bounds / measurement* (round 11) --


def _schema(spark, store, text):
    return compile_flux(
        spark,
        'import "influxdata/influxdb/schema"\n' + text,
        {"tagged": store},
    )


def test_measurement_tag_values_equals_predicate_form(spark, tagged):
    sugar = _schema(
        spark,
        tagged,
        'schema.measurementTagValues(bucket: "tagged", '
        'measurement: "events", tag: "dc")',
    )
    assert {r["_value"] for r in sugar.collect()} == {"d0", "d1", "d2"}


def test_measurement_field_keys(spark, tagged):
    out = _schema(
        spark,
        tagged,
        'schema.measurementFieldKeys(bucket: "tagged", measurement: "events")',
    )
    vals = {r["_value"] for r in out.collect()}
    assert "click" in vals and len(vals) >= 3


def test_measurement_tag_keys_filtered_by_range(spark, tagged):
    out = _schema(
        spark,
        tagged,
        'schema.measurementTagKeys(bucket: "tagged", '
        'measurement: "events", '
        'start: "2024-01-08 00:00:00", stop: "2024-01-15 00:00:00")',
    )
    assert {r["_value"] for r in out.collect()} == {"host", "dc"}


def test_schema_tag_keys_empty_range_lists_nothing(spark, tagged):
    # filtered form: promoted keys are listed only when the filtered
    # frame holds values — an empty range yields the empty key set
    out = _schema(
        spark,
        tagged,
        'schema.tagKeys(bucket: "tagged", '
        'start: "2030-01-01 00:00:00", stop: "2030-01-02 00:00:00")',
    )
    assert out.count() == 0


def test_schema_predicate_unknown_column_raises(spark, tagged):
    with pytest.raises(FluxError, match="unknown column"):
        _schema(
            spark,
            tagged,
            'schema.fieldKeys(bucket: "tagged", '
            'predicate: (r) => r["rack"] == "r1")',
        )


def test_schema_relative_bound_needs_now(spark, tagged):
    with pytest.raises(FluxError, match="now= anchor"):
        _schema(
            spark,
            tagged,
            'schema.fieldKeys(bucket: "tagged", start: -30d)',
        )


def test_schema_measurement_form_requires_measurement(spark, tagged):
    with pytest.raises(FluxError, match="requires measurement"):
        _schema(
            spark,
            tagged,
            'schema.measurementTagKeys(bucket: "tagged")',
        )


def test_exists_predicate_on_sparse_tag(spark, tmp_path):
    # a line-protocol-style store where some series lack a tag: the
    # promoted column is NULL there — `exists` / `not exists` select
    # exactly the tagged/untagged rows (upstream's missing-column
    # semantics)
    src = str(tmp_path / "sparse")
    rows = [
        ("2024-01-01 00:10:00", "f", 1.0, "a"),
        ("2024-01-01 00:20:00", "f", 3.0, None),
        ("2024-01-01 00:40:00", "f", 5.0, "b"),
    ]
    long_df = spark.createDataFrame(
        rows, "t string, _field string, _value double, host string"
    ).select(
        F.col("t").cast("timestamp").alias("_time"),
        F.lit("m").alias("_measurement"),
        "_field",
        "_value",
        "host",
        F.when(
            F.col("host").isNotNull(),
            F.create_map(F.lit("host"), F.col("host")),
        )
        .otherwise(F.create_map().cast("map<string,string>"))
        .alias("tags"),
    )
    bkt.write_bucket(long_df, src, mode="overwrite")
    tagged_only = compile_flux(
        spark,
        """
        from(bucket: "b")
          |> range(start: "2024-01-01 00:00:00", stop: "2024-01-02 00:00:00")
          |> filter(fn: (r) => exists r["host"])
          |> group(columns: ["host"])
          |> count()
        """,
        {"b": src},
    )
    assert {(r["host"], r["count"]) for r in tagged_only.collect()} == {
        ("a", 1), ("b", 1),
    }
    untagged_only = compile_flux(
        spark,
        """
        from(bucket: "b")
          |> range(start: "2024-01-01 00:00:00", stop: "2024-01-02 00:00:00")
          |> filter(fn: (r) => not exists r.host)
          |> group()
          |> count()
        """,
        {"b": src},
    )
    assert [r["count"] for r in untagged_only.collect()] == [1]


def test_create_empty_gap_fill_over_tagged_key(spark, tagged):
    out = compile_flux(
        spark,
        """
        from(bucket: "tagged")
          |> range(start: v.timeRangeStart, stop: v.timeRangeStop)
          |> filter(fn: (r) => r["_measurement"] == "events")
          |> filter(fn: (r) => r["_field"] == "click")
          |> filter(fn: (r) => r["host"] == "h1")
          |> aggregateWindow(every: 6h, fn: count, createEmpty: true)
        """,
        {"tagged": tagged},
        params=dict(RANGE),
    )
    rows = out.collect()
    # the gap-fill spine covers every 6h bucket in each series' range
    # per full (measurement, field, host, dc) key; zero-count buckets
    # are materialized
    assert out.columns == [
        "window_start", "_measurement", "_field", "host", "dc", "count",
    ]
    keys = {(r["host"], r["dc"]) for r in rows}
    assert keys == {("h1", d) for d in ("d0", "d1", "d2")}
    assert all(r["count"] >= 0 for r in rows)


def test_to_long_rejects_duplicate_and_date_tags(spark):
    wide = spark.createDataFrame(
        [("2024-01-01 00:00:00", "a", 1.0)], "t string, h string, x double"
    ).select(F.col("t").cast("timestamp").alias("t"), "h", "x")
    with pytest.raises(ValueError, match="twice"):
        bkt.to_long(wide, "m", time_col="t", value_cols=["x"], tag_cols=["h", "h"])
    with pytest.raises(ValueError, match="collide"):
        bkt.to_long(
            wide.withColumnRenamed("h", "_date"),
            "m",
            time_col="t",
            value_cols=["x"],
            tag_cols=["_date"],
        )


def test_write_bucket_tags_clustering_skips_files(spark, tmp_path):
    """cluster="tags": each file covers ~one tag combination, so the
    manifest skips whole files for a tag-equality query — the measured
    SCALE §23 layout as a first-class write option."""
    import os

    from time_series_data_pipeline_spark.sources import manifest as mf

    rows = [
        (f"2024-01-01 0{h}:00:00", "f", float(i), f"h{i % 4}")
        for h in range(4)
        for i in range(8)
    ]
    long_df = spark.createDataFrame(
        rows, "t string, _field string, _value double, host string"
    ).select(
        F.col("t").cast("timestamp").alias("_time"),
        F.lit("m").alias("_measurement"),
        "_field",
        "_value",
        "host",
        F.create_map(F.lit("host"), F.col("host")).alias("tags"),
    )
    path = str(tmp_path / "tagclustered")
    bkt.write_bucket(long_df, path, mode="overwrite", cluster="tags")
    man = os.path.join(path, bkt.MANIFEST_SUBDIR)
    mf.write_manifest(
        mf.build_stats_manifest(spark, path, ["_field", "_time", "host"]), man
    )
    total = len(mf.prune_files(spark, path, man, constraints={"host": (None, None)}))
    kept = len(
        mf.prune_files(spark, path, man, constraints={"host": ("h1", "h1")})
    )
    assert 0 < kept < total
    # row-level result unchanged by the layout
    got = bkt.scan_bucket(spark, path, tags={"host": "h1"}).count()
    assert got == long_df.filter(F.col("host") == "h1").count()


def test_write_bucket_tags_clustering_requires_tags(spark):
    long_df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "f", 1.0)],
        "t string, _field string, _value double",
    ).select(
        F.col("t").cast("timestamp").alias("_time"),
        F.lit("m").alias("_measurement"),
        "_field",
        "_value",
        F.create_map().cast("map<string,string>").alias("tags"),
    )
    with pytest.raises(ValueError, match="promoted tag columns"):
        bkt.write_bucket(long_df, "/tmp/never", cluster="tags")


def test_compile_flux_stream_keys_on_tags(spark, tagged, tmp_path):
    """The LIVE-PANEL compiler discovers the tagged store's promoted
    columns exactly like the batch path: the streaming windowed mean
    keys on (_measurement, _field, host, dc) and emitted windows equal
    the batch compiler's for the same text (final open window aside)."""
    from time_series_data_pipeline_spark.flux import compile_flux_stream

    text = """
    from(bucket: "b")
      |> range(start: "2024-01-08T00:00:00Z", stop: "2024-01-12T00:00:00Z")
      |> filter(fn: (r) => r["_field"] == "click")
      |> filter(fn: (r) => r["host"] == "h1")
      |> aggregateWindow(every: 12h, fn: mean)
    """
    live = compile_flux_stream(
        spark, text, {"b": tagged}, watermark="0 seconds"
    )
    assert {"host", "dc"} <= set(live.columns)
    q = (
        live.writeStream.format("memory")
        .queryName("flux_live_tags")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["host"], r["dc"]): (r["mean"], r["n"])
        for r in spark.sql("SELECT * FROM flux_live_tags").collect()
    }
    batch = compile_flux(spark, text, {"b": tagged}).collect()
    max_t = max(r["window_start"] for r in batch)
    expected = {
        (r["window_start"], r["host"], r["dc"]): (r["mean"], r["n"])
        for r in batch
        if r["window_start"] < max_t
    }
    assert expected and all(got[k] == v for k, v in expected.items())
    assert all(k[1] == "h1" for k in got)  # the tag filter held


def test_pivot_on_tag_column(spark, tagged):
    """Round 12d: pivot(columnKey: ["host"]) — the per-host overlay
    table: the tag leaves the table key and becomes one column per
    value; the residual key (measurement, field, other tags) plus
    _time stays as rows. The _field form is unchanged; a column that
    is neither _field nor a promoted tag raises naming the store's
    tags."""
    got = compile_flux(
        spark,
        'from(bucket: "b") |> filter(fn: (r) => r["_field"] == "click") '
        '|> pivot(rowKey: ["_time"], columnKey: ["host"], '
        'valueColumn: "_value")',
        {"b": tagged},
    )
    hosts = sorted(
        r["host"]
        for r in bkt.read_bucket(spark, tagged)
        .select("host").distinct().collect()
        if r["host"] is not None
    )
    assert [h for h in hosts if h in got.columns] == hosts
    assert "host" not in got.columns and "_time" in got.columns
    assert "dc" in got.columns  # the other tag stays in the row key
    # values land in the right host column
    src = (
        bkt.read_bucket(spark, tagged)
        .filter((F.col("_field") == "click") & (F.col("host") == hosts[0]))
        .select("_time", "_value", "dc")
        .collect()
    )
    by_key = {
        (r["_time"], r["dc"]): r[hosts[0]] for r in got.collect()
    }
    hits = 0
    for r in src:
        v = by_key.get((r["_time"], r["dc"]))
        if v is not None:
            hits += 1
            assert v == r["_value"] or v >= r["_value"]  # MAX tie rule
    assert hits > 0
    with pytest.raises(FluxError, match="promoted tag column"):
        compile_flux(
            spark,
            'from(bucket: "b") |> pivot(rowKey: ["_time"], '
            'columnKey: ["nope"], valueColumn: "_value")',
            {"b": tagged},
        )
