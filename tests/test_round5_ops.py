"""Unit tests for the round-5 operators: per-group cap sampling,
char-trigram familiarity, and the leakage-safe split building blocks —
hand-computable fixtures with exact expected values (the oracle-parity
suite covers the registered-query forms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_data_pipeline_spark.operators import text as tx
from time_series_data_pipeline_spark.operators.sampling import (
    cap_per_group,
    hash_bucket,
)


def test_cap_per_group_keeps_cap_rows_per_group(spark):
    rows = [(i, f"g{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, ["k", "g"])
    out = cap_per_group(df, "g", "k", cap=5).collect()
    by_g: dict[str, list[int]] = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["k"])
    assert {g: len(v) for g, v in by_g.items()} == {"g0": 5, "g1": 5, "g2": 5}


def test_cap_per_group_partitioning_invariant(spark):
    rows = [(i, f"g{i % 4}") for i in range(80)]
    df1 = spark.createDataFrame(rows, ["k", "g"]).repartition(1)
    df7 = spark.createDataFrame(rows, ["k", "g"]).repartition(7)
    kept1 = {(r["k"], r["g"]) for r in cap_per_group(df1, "g", "k", 6).collect()}
    kept7 = {(r["k"], r["g"]) for r in cap_per_group(df7, "g", "k", 6).collect()}
    assert kept1 == kept7 and len(kept1) == 24


def test_cap_per_group_matches_single_window_reference(spark):
    from pyspark.sql import Window

    rows = [(i, f"g{i % 3}") for i in range(45)]
    df = spark.createDataFrame(rows, ["k", "g"]).repartition(5)
    w = Window.partitionBy("g").orderBy(hash_bucket(F.col("k"), "cap"), F.col("k"))
    ref = {
        (r["k"], r["g"])
        for r in df.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 4)
        .drop("r")
        .collect()
    }
    got = {(r["k"], r["g"]) for r in cap_per_group(df, "g", "k", 4).collect()}
    assert got == ref


def test_cap_smaller_groups_survive_whole(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["k", "g"])
    out = cap_per_group(df, "g", "k", cap=10).collect()
    assert len(out) == 3


def test_char_trigrams_values_and_short_text(spark):
    df = spark.createDataFrame(
        [(1, "ABcd"), (2, "xy"), (3, "aaa")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", tx.char_trigrams("text").alias("t")).collect()
    }
    assert got == {1: ["abc", "bcd"], 2: [], 3: ["aaa"]}


def test_trigram_familiarity_exact(spark):
    # corpus: "aaaa" -> [aaa, aaa]; "aaab" -> [aaa, aab]; "xyz" -> [xyz]
    # model: aaa=3, aab=1, xyz=1
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaab"), (3, "xyz"), (4, "zz")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tri"], r["familiarity"])
        for r in tx.trigram_familiarity(df).collect()
    }
    assert got == {
        1: (2, 3.0),           # (3 + 3) / 2
        2: (2, 2.0),           # (3 + 1) / 2
        3: (1, 1.0),
    }                          # doc 4 too short -> absent


def test_holt_linear_matches_reference_loop(spark):
    import datetime

    from time_series_data_pipeline_spark.queries.timeseries_q import (
        holt_linear_final,
    )

    # build a tiny events parquet so the query fn can read it
    import os
    import tempfile

    vals = [2.0, 4.0, 8.0, 3.0, 6.0]
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, "s", t0 + datetime.timedelta(minutes=i), v, 1, "{}")
        for i, v in enumerate(vals)
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double,"
        " user_id long, props string"
    ).write.parquet(os.path.join(d, "events.parquet"))

    got = holt_linear_final(spark, d).collect()[0]
    l, b = vals[0], 0.0
    for x in vals[1:]:
        ln = 0.5 * x + 0.5 * (l + b)
        b = 0.25 * (ln - l) + 0.75 * b
        l = ln
    assert got["n"] == 5
    assert got["level"] == round(l, 9)
    assert got["trend"] == round(b, 9)
    assert got["forecast_next"] == round(l + b, 9)


def test_triangle_decimate_keeps_spikes_and_endpoints(spark):
    import datetime

    from time_series_data_pipeline_spark.operators import (
        timeseries as ts_ops,
    )

    t0 = datetime.datetime(2024, 1, 1)
    # flat series with one huge spike at i=57; 100 points -> n_out=12
    rows = [
        (i, "s", t0 + datetime.timedelta(minutes=i),
         500.0 if i == 57 else 10.0 + (i % 3))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "ts", "value"])
    out = ts_ops.triangle_decimate(
        df, "ts", "value", ["event_type"], n_out=12
    ).collect()
    assert len(out) == 12  # 10 buckets + first + last
    buckets = {r["bucket"] for r in out}
    assert -1 in buckets and -2 in buckets
    assert any(r["value"] == 500.0 for r in out), "spike must survive"
    # endpoints kept verbatim
    ends = {r["ts"] for r in out if r["bucket"] < 0}
    assert ends == {t0, t0 + datetime.timedelta(minutes=99)}


def test_lsh_tuning_regimes():
    import math

    from time_series_data_pipeline_spark.operators.similarity import (
        lsh_tuning,
    )

    n9, b9 = lsh_tuning(0.9)
    n3, b3 = lsh_tuning(0.3)
    r9, r3 = n9 // b9, n3 // b3
    # high thresholds take LONG bands (candidate pressure), weak
    # thresholds short ones (recall) — the regimes must separate
    assert r9 >= 12 and r3 <= 6
    # the returned config actually meets the recall target in theory
    for t, (n, b) in ((0.9, (n9, b9)), (0.3, (n3, b3))):
        s = 1.0 - math.acos(t) / math.pi
        r = n // b
        assert 1.0 - (1.0 - s**r) ** b >= 0.9
    assert n9 <= 256 and n3 <= 256


def test_lsh_tuned_params_find_planted_neardups(spark):
    import numpy as np
    import pandas as pd

    from time_series_data_pipeline_spark.operators import similarity as sim

    rng = np.random.default_rng(5)
    base = rng.normal(size=(400, 64)).astype("float32")
    dup = base[:20] + rng.normal(scale=0.05, size=(20, 64)).astype("float32")
    allv = np.vstack([base, dup])
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(len(allv)), "embedding": list(allv)})
    )
    # DEFAULTS, not explicit params: since round 6 lsh_ann derives its
    # banding from the threshold via lsh_tuning (VERDICT r5 item 2) —
    # the planted-near-dup probe must pass through the bare call.
    got = sim.lsh_ann(df, threshold=0.9)
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    planted = {(i, 400 + i) for i in range(20)}
    assert len(pairs & planted) >= 18  # ≥0.9 recall on the planted set


# ---------------------------------------------------- property tests

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _CFG = dict(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )

    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 40), st.integers(0, 3)), max_size=30
        ),
        cap=st.integers(1, 5),
    )
    @settings(**_CFG)
    def test_cap_per_group_properties(spark, rows, cap):
        rows = list({k for k, _ in rows} and rows)
        uniq = {}
        for k, g in rows:
            uniq[k] = g  # unique keys (cap key is the identity)
        data = [(k, f"g{g}") for k, g in uniq.items()]
        if not data:
            return
        df = spark.createDataFrame(data, ["k", "g"])
        out = cap_per_group(df, "g", "k", cap).collect()
        per_g: dict[str, int] = {}
        for r in out:
            per_g[r["g"]] = per_g.get(r["g"], 0) + 1
        sizes: dict[str, int] = {}
        for _, g in data:
            sizes[g] = sizes.get(g, 0) + 1
        # each group keeps exactly min(cap, group size) rows
        assert per_g == {g: min(cap, n) for g, n in sizes.items()}

    @given(
        vals=st.lists(
            st.floats(-50, 50, allow_nan=False).map(lambda v: round(v, 2)),
            min_size=13,
            max_size=40,
        ),
        n_out=st.integers(3, 12),
    )
    @settings(**_CFG)
    def test_triangle_decimate_properties(spark, vals, n_out):
        import datetime

        from time_series_data_pipeline_spark.operators import (
            timeseries as ts_ops,
        )

        if len(vals) <= n_out:
            return
        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (i, "s", t0 + datetime.timedelta(seconds=i), float(v))
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows, ["event_id", "event_type", "ts", "value"]
        )
        out = ts_ops.triangle_decimate(
            df, "ts", "value", ["event_type"], n_out=n_out
        ).collect()
        # one point per non-empty bucket + the two endpoints; never
        # more than n_out points total
        assert len(out) <= n_out
        buckets = [r["bucket"] for r in out]
        assert buckets.count(-1) == 1 and buckets.count(-2) == 1
        mids = [b for b in buckets if b >= 0]
        assert len(mids) == len(set(mids))  # ≤1 per bucket
        # selected points are real input points
        pts = {(r["ts"], r["value"]) for r in out}
        allpts = {(r[2], r[3]) for r in rows}
        assert pts <= allpts


def test_incremental_rollup_refresh_matches_full_rebuild(spark, tmp_path):
    """Continuous-aggregate maintenance: after appending day-4 data and
    a late backfill into day 2, refreshing ONLY those two partitions
    must produce a rollup identical to a from-scratch rebuild, and the
    refresh must be idempotent."""
    import datetime

    from pyspark.sql import functions as F

    from time_series_data_pipeline_spark.sources import bucket as bkt

    def mk(day, n, base):
        t0 = datetime.datetime(2024, 1, day)
        return [
            ("gas", f"f{j % 3}", t0 + datetime.timedelta(minutes=13 * i),
             float(base + i + j))
            for i in range(n) for j in range(3)
        ]

    bucket_path = str(tmp_path / "bkt")
    roll_path = str(tmp_path / "roll")
    df0 = spark.createDataFrame(
        mk(1, 6, 10) + mk(2, 6, 20) + mk(3, 6, 30),
        ["_measurement", "_field", "_time", "_value"],
    ).withColumn("tags", F.lit(None).cast("map<string,string>"))
    bkt.write_bucket(df0, bucket_path)
    bkt.refresh_hourly_rollup(spark, bucket_path, roll_path)  # full build

    # new day 4 + late backfill into day 2
    df1 = spark.createDataFrame(
        mk(4, 6, 40) + mk(2, 2, 99),
        ["_measurement", "_field", "_time", "_value"],
    ).withColumn("tags", F.lit(None).cast("map<string,string>"))
    bkt.write_bucket(df1, bucket_path)
    bkt.refresh_hourly_rollup(
        spark, bucket_path, roll_path, dates=["2024-01-02", "2024-01-04"]
    )

    def snap(path):
        return {
            tuple(r)
            for r in spark.read.parquet(path)
            .select("_measurement", "_field", "_hour", "_date", "n",
                    F.col("sum_value").cast("double"), "min_value",
                    "max_value")
            .collect()
        }

    incremental = snap(roll_path)
    full_path = str(tmp_path / "roll_full")
    bkt.refresh_hourly_rollup(spark, bucket_path, full_path)
    assert incremental == snap(full_path)

    # idempotence: re-refreshing the same dates changes nothing
    bkt.refresh_hourly_rollup(
        spark, bucket_path, roll_path, dates=["2024-01-02"]
    )
    assert snap(roll_path) == incremental


def test_stats_manifest_prunes_files_without_losing_rows(spark, tmp_path):
    """Delta-style data skipping: a manifest built from parquet footers
    must (a) cover every file, (b) prune a selective predicate down to
    a strict subset of files, (c) never lose rows vs the full scan, and
    (d) treat files added after the harvest as must-scan (staleness
    degrades to extra IO, never wrong answers)."""
    from pyspark.sql import functions as F

    from time_series_data_pipeline_spark.sources import manifest as mf

    store = str(tmp_path / "store")
    man = str(tmp_path / "man")
    # 8 files, each a disjoint user_id range (write per-range)
    for b in range(8):
        spark.range(b * 100, (b + 1) * 100).select(
            F.col("id").alias("user_id"),
            (F.col("id") % 7).alias("v"),
        ).coalesce(1).write.mode("append").parquet(store)

    mf.write_manifest(
        mf.build_stats_manifest(spark, store, ["user_id"]), man
    )
    m = mf.read_manifest(spark, man)
    assert m.select("file").distinct().count() == 8
    assert m.filter(F.col("n_rows") != 100).count() == 0

    kept = mf.prune_files(spark, store, man, "user_id", lo=250, hi=349)
    assert 1 <= len(kept) <= 2  # ranges [200,300) and [300,400)

    pruned = (
        mf.scan_pruned(spark, store, man, "user_id", 250, 349)
        .filter((F.col("user_id") >= 250) & (F.col("user_id") <= 349))
    )
    full = spark.read.parquet(store).filter(
        (F.col("user_id") >= 250) & (F.col("user_id") <= 349)
    )
    assert pruned.count() == full.count() == 100

    # staleness: append a new file AFTER the harvest — it must be
    # scanned unconditionally
    spark.range(9000, 9010).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("v")
    ).coalesce(1).write.mode("append").parquet(store)
    kept2 = mf.prune_files(spark, store, man, "user_id", lo=8990, hi=9005)
    got = (
        mf.scan_pruned(spark, store, man, "user_id", 8990, 9005)
        .filter(F.col("user_id").between(8990, 9005))
        .count()
    )
    assert got == 6 and len(kept2) >= 1


def test_stats_manifest_timestamp_column(spark, tmp_path):
    import datetime

    from pyspark.sql import functions as F

    from time_series_data_pipeline_spark.sources import manifest as mf

    store = str(tmp_path / "tstore")
    t0 = datetime.datetime(2024, 3, 1)
    # INT96 (Spark's default parquet timestamp) carries NO stats →
    # every file would fall back to must-scan; write INT64 micros
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        for d in range(4):  # one file per day
            rows = [
                (i, t0 + datetime.timedelta(days=d, minutes=15 * i))
                for i in range(8)
            ]
            spark.createDataFrame(rows, ["k", "ts"]).coalesce(1).write.mode(
                "append"
            ).parquet(store)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    man = str(tmp_path / "tman")
    mf.write_manifest(mf.build_stats_manifest(spark, store, ["ts"]), man)
    kept = mf.prune_files(
        spark, store, man, "ts",
        lo=datetime.datetime(2024, 3, 2, 0, 30),
        hi=datetime.datetime(2024, 3, 2, 1, 0),
    )
    assert len(kept) == 1
    # file-granular pruning keeps BOTH intersecting files (Mar 3's
    # file starts exactly at the hi bound); the caller's row predicate
    # does the final cut: Mar 2's 8 rows + the inclusive Mar 3 00:00
    got = (
        mf.scan_pruned(
            spark, store, man, "ts",
            datetime.datetime(2024, 3, 2), datetime.datetime(2024, 3, 3),
        )
        .filter(
            F.col("ts").between(
                datetime.datetime(2024, 3, 2), datetime.datetime(2024, 3, 3)
            )
        )
        .count()
    )
    assert got == 9


def test_canonical_lttb_matches_reference_loop(spark):
    import datetime

    import numpy as np

    from time_series_data_pipeline_spark.operators import (
        timeseries as ts_ops,
    )

    rng = np.random.default_rng(9)
    vals = np.round(rng.normal(20, 5, 120), 2)
    vals[57] = 500.0  # spike
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, "s", t0 + datetime.timedelta(seconds=60 * i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "ts", "value"])
    n_out = 14
    got = sorted(
        (r["bucket"], r["ts"], r["value"])
        for r in ts_ops.triangle_decimate_sequential(
            df, "ts", "value", ["event_type"], n_out=n_out
        ).collect()
    )

    # reference: canonical LTTB in plain python
    xs = np.array(
        [int((t0 + datetime.timedelta(seconds=60 * i)).timestamp() * 1e6)
         for i in range(len(vals))], dtype="float64"
    )
    ys = vals.astype("float64")
    n, nb = len(vals), n_out - 2
    sel = [0]
    for i in range(nb):
        lo, hi = (i * (n - 2)) // nb + 1, ((i + 1) * (n - 2)) // nb + 1
        if i + 1 < nb:
            nlo, nhi = ((i + 1) * (n - 2)) // nb + 1, ((i + 2) * (n - 2)) // nb + 1
            ax, ay = xs[nlo:nhi].mean(), ys[nlo:nhi].mean()
        else:
            ax, ay = xs[-1], ys[-1]
        px, py = xs[sel[-1]], ys[sel[-1]]
        area = abs((px - ax) * (ys[lo:hi] - py) - (px - xs[lo:hi]) * (ay - py))
        sel.append(lo + int(area.argmax()))
    sel.append(n - 1)
    exp = sorted(
        (b, rows[s][2], float(ys[s]))
        for b, s in zip([-1] + list(range(nb)) + [-2], sel)
    )
    assert got == exp
    assert any(v == 500.0 for _, _, v in got)  # spike survives


def test_check_constraints_counts_planted_violations(spark):
    from time_series_data_pipeline_spark.operators.dq import (
        check_constraints,
    )

    df = spark.createDataFrame(
        [
            (1, 1, 10.0),
            (1, 1, 20.0),   # duplicate (k1,k2)
            (2, 1, None),   # null v -> fails not_null AND range check
            (3, 2, -5.0),   # fails range check
            (None, 3, 7.0),  # null key
        ],
        "k1 int, k2 int, v double",
    )
    got = {
        r["constraint_name"]: r["n_violations"]
        for r in check_constraints(
            df,
            not_null=["k1", "v"],
            unique=[["k1", "k2"]],
            checks={"v_nonneg": F.col("v") >= 0.0},
        ).collect()
    }
    assert got == {
        "not_null:k1": 1,
        "not_null:v": 1,
        "check:v_nonneg": 2,  # NULL counts as a violation (CHECK semantics)
        "unique:k1,k2": 1,
    }


def test_streaming_rollup_maintenance(spark, tmp_path):
    """Bucket-tailing maintenance stream: after each wave of bucket
    writes, one availableNow pass must leave the rollup identical to a
    from-scratch rebuild (and a restart over the same checkpoint must
    not disturb it)."""
    import datetime

    from pyspark.sql import functions as F

    from time_series_data_pipeline_spark.sources import bucket as bkt
    from time_series_data_pipeline_spark.streaming.ingest import (
        start_rollup_maintenance,
    )

    bucket_path = str(tmp_path / "bkt")
    roll = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")

    def mk(day, base):
        t0 = datetime.datetime(2024, 2, day)
        return [
            ("gas", f"f{j}", t0 + datetime.timedelta(minutes=20 * i),
             float(base + i + j))
            for i in range(5) for j in range(2)
        ]

    def wave(rows):
        df = spark.createDataFrame(
            rows, ["_measurement", "_field", "_time", "_value"]
        ).withColumn("tags", F.lit(None).cast("map<string,string>"))
        bkt.write_bucket(df, bucket_path)
        q = start_rollup_maintenance(spark, bucket_path, roll, ckpt)
        q.awaitTermination(120)

    def snap(path):
        return {
            tuple(r)
            for r in spark.read.parquet(path)
            .select("_measurement", "_field", "_hour", "_date", "n",
                    F.col("sum_value").cast("double"))
            .collect()
        }

    wave(mk(1, 10) + mk(2, 20))
    wave(mk(3, 30) + mk(2, 99))  # new day + late backfill into day 2

    full = str(tmp_path / "full")
    bkt.refresh_hourly_rollup(spark, bucket_path, full)
    assert snap(roll) == snap(full) and len(snap(roll)) > 0

    # restart with nothing new: no change
    q = start_rollup_maintenance(spark, bucket_path, roll, ckpt)
    q.awaitTermination(120)
    assert snap(roll) == snap(full)


def test_decode_audio_stub_exact_features(spark):
    import struct

    from time_series_data_pipeline_spark.operators import multimodal as mm

    # 4 samples: 100, -200, 32767, -32768 (+ one stray odd byte ignored)
    payload = struct.pack("<4h", 100, -200, 32767, -32768) + b"\x01"
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, None)], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in mm.decode_audio(df).collect()}
    r1 = rows[1]
    assert r1["n_samples"] == 4
    assert r1["sample_rate"] == 16000
    assert r1["duration_ms"] == 4 * 1000 // 16000
    assert int(r1["sum_squares"]) == 100**2 + 200**2 + 32767**2 + 32768**2
    assert r1["n_clipped"] == 2
    assert rows[2]["n_samples"] == 0 and int(rows[2]["sum_squares"]) == 0


def test_enrich_stream_picks_up_dim_refresh_across_runs(spark, tmp_path):
    """File-backed dimension refresh: rows arriving after the dimension
    gains a new file must join against the UPDATED dim (static side is
    re-planned per run/batch — the slowly-changing-dimension refresh)."""
    import json

    from pyspark.sql import functions as F

    from time_series_data_pipeline_spark.streaming.joins import enrich_stream

    src = tmp_path / "er_src"
    dimd = tmp_path / "er_dim"
    src.mkdir()
    dimd.mkdir()
    out = str(tmp_path / "er_out")
    ckpt = str(tmp_path / "er_ckpt")

    spark.createDataFrame(
        [("click", "interaction")], ["event_type", "category"]
    ).coalesce(1).write.mode("append").parquet(str(dimd))

    def run(events):
        with open(src / f"{len(events)}.json", "w") as f:
            for ty in events:
                f.write(json.dumps({"event_type": ty}) + "\n")
        stream = spark.readStream.schema("event_type string").json(str(src))
        dim = spark.read.parquet(str(dimd))
        q = (
            enrich_stream(stream, dim, on="event_type")
            .writeStream.foreachBatch(
                lambda df, eid: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(["click", "error"])  # 'error' unknown in dim v1
    # dim refresh: 'error' category lands
    spark.createDataFrame(
        [("error", "fault")], ["event_type", "category"]
    ).coalesce(1).write.mode("append").parquet(str(dimd))
    run(["error"])  # second wave sees the refreshed dim

    got = [
        (r.event_type, r.category)
        for r in spark.read.parquet(out).collect()
    ]
    assert got.count(("error", "fault")) == 1      # post-refresh row
    assert got.count(("error", None)) == 1         # pre-refresh row
    assert got.count(("click", "interaction")) == 1


def test_negative_pairs_properties(spark):
    from time_series_data_pipeline_spark.operators.sampling import (
        negative_pairs,
    )

    docs = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    pos = spark.createDataFrame(
        [(0, 1), (2, 3), (10, 20)], ["id_a", "id_b"]
    )
    out = negative_pairs(docs, pos, n=30)
    rows = {(r.id_a, r.id_b) for r in out.collect()}
    assert len(rows) <= 30 and rows
    assert all(a < b for a, b in rows)  # canonicalized
    assert not rows & {(0, 1), (2, 3), (10, 20)}  # no positives
    # deterministic under repartitioning
    rows2 = {
        (r.id_a, r.id_b)
        for r in negative_pairs(docs.repartition(7), pos, n=30).collect()
    }
    assert rows == rows2


def test_pack_sequences_conservation(spark):
    from time_series_data_pipeline_spark.operators.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i % 5))) for i in range(25)],
        ["doc_id", "text"],
    )
    out = pack_sequences(docs, budget=10).collect()
    total = sum(r["n_tokens"] for r in out)
    # offsets tile the concatenation exactly: every token accounted for
    assert sorted(r["token_offset"] for r in out)[0] == 0
    last = max(out, key=lambda r: r["token_offset"])
    assert last["token_offset"] + last["n_tokens"] == total
    offs = sorted((r["token_offset"], r["n_tokens"]) for r in out)
    for (o1, n1), (o2, _) in zip(offs, offs[1:]):
        assert o1 + n1 == o2  # contiguous, no gaps or overlaps
    for r in out:
        assert r["seq_first"] == r["token_offset"] // 10
        assert r["seq_last"] == (r["token_offset"] + r["n_tokens"] - 1) // 10


def test_pack_sequences_sharded_semantics(spark):
    """The sharded scale path: (a) unpadded, it equals the global pack
    under the (shard, rank, id) ordering — contiguous tiling, every
    token accounted for; (b) pad_shards=True starts every shard at a
    budget multiple, so no training sequence crosses a shard boundary
    and within-shard layout is unchanged."""
    from time_series_data_pipeline_spark.operators.sampling import hash_bucket
    from time_series_data_pipeline_spark.operators.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i % 7))) for i in range(60)],
        ["doc_id", "text"],
    )
    out = pack_sequences(docs, budget=10, n_shards=4).collect()
    offs = sorted((r["token_offset"], r["n_tokens"]) for r in out)
    assert offs[0][0] == 0
    for (o1, n1), (o2, _) in zip(offs, offs[1:]):
        assert o1 + n1 == o2  # contiguous global tiling, gap/overlap-free

    padded = pack_sequences(docs, budget=10, n_shards=4, pad_shards=True)
    shard_of = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id",
            (hash_bucket(F.col("doc_id"), "pack:shard") % 4).alias("s"),
        ).collect()
    }
    by_shard: dict[int, list] = {}
    for r in padded.collect():
        by_shard.setdefault(shard_of[r["doc_id"]], []).append(r)
    seq_owner: dict[int, int] = {}
    for s, rows in by_shard.items():
        rows.sort(key=lambda r: r["token_offset"])
        # shard starts at a budget multiple and tiles contiguously within
        assert rows[0]["token_offset"] % 10 == 0
        for r1, r2 in zip(rows, rows[1:]):
            assert r1["token_offset"] + r1["n_tokens"] == r2["token_offset"]
        # no sequence id is shared across shards
        for r in rows:
            for seq in range(r["seq_first"], r["seq_last"] + 1):
                assert seq_owner.setdefault(seq, s) == s, (
                    f"sequence {seq} spans shards {seq_owner[seq]} and {s}"
                )
    # padding must not reorder docs within a shard vs the unpadded pack
    unpadded_rank = {
        s: [r["doc_id"] for r in sorted(
            (r for r in out if shard_of[r["doc_id"]] == s),
            key=lambda r: r["token_offset"],
        )]
        for s in by_shard
    }
    for s, rows in by_shard.items():
        assert [r["doc_id"] for r in rows] == unpadded_rank[s]


def test_pack_sequences_rejects_bad_shards(spark):
    import pytest

    from time_series_data_pipeline_spark.operators.text import pack_sequences

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(docs, budget=10, n_shards=0)


def test_jsonl_ingestion_quarantines_malformed_lines(spark, tmp_path):
    from time_series_data_pipeline_spark.sources.jsonl import (
        read_events_jsonl,
    )

    p = tmp_path / "ev.jsonl"
    lines = [
        '{"event_id": 1, "event_type": "click", "ts": "2024-01-01 10:00:00",'
        ' "value": 1.5, "user_id": 7}',
        'this is not json at all',
        '{"event_id": 2, "event_type": "view"}',  # partial -> good, NULLs
        '{"event_id": 3, "value": "not-a-number"}',  # type damage -> quarantine
        '{truncated',
    ]
    p.write_text("\n".join(lines) + "\n")
    good, quarantine = read_events_jsonl(spark, str(p))
    g = {r["event_id"]: r for r in good.collect()}
    q = [r["raw_line"] for r in quarantine.collect()]
    assert set(g) == {1, 2}
    assert g[1]["value"] == 1.5 and g[1]["user_id"] == 7
    assert g[2]["value"] is None  # partial row parses, nullability is DQ's job
    assert len(q) == 3
    assert "this is not json at all" in q and "{truncated" in q


def test_bucket_frame_orc_roundtrip(spark, tmp_path):
    """Storage-format flexibility: the long bucket frame round-trips
    through ORC (Spark-native, no extra deps) with identical content —
    a deployment can pick ORC where its warehouse standardizes on it."""
    import datetime

    from pyspark.sql import functions as F

    rows = [
        ("gas", f"f{j}", datetime.datetime(2024, 1, 1, 0, 5 * i), float(i + j))
        for i in range(10) for j in range(3)
    ]
    df = spark.createDataFrame(
        rows, ["_measurement", "_field", "_time", "_value"]
    ).withColumn("tags", F.lit(None).cast("map<string,string>"))
    path = str(tmp_path / "orc_bucket")
    df.write.partitionBy("_measurement").orc(path)
    back = spark.read.orc(path)
    assert back.count() == 30
    a = {tuple(r) for r in df.select("_field", "_time", "_value").collect()}
    b = {tuple(r) for r in back.select("_field", "_time", "_value").collect()}
    assert a == b


def test_binaryfile_source_feeds_multimodal_pipeline(spark, tmp_path):
    """Media-lake ingestion: raw files on disk → Spark's binaryFile
    source → pack_media typed frame → the audio decode stage. The
    binary source carries (path, length, content); ids derive from the
    path deterministically."""
    import struct

    from pyspark.sql import functions as F

    from time_series_data_pipeline_spark.operators import multimodal as mm

    media = tmp_path / "media"
    media.mkdir()
    for i in range(3):
        (media / f"{i:03d}.pcm").write_bytes(
            struct.pack(f"<{4 + i}h", *range(100, 104 + i))
        )

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pcm")
        .load(str(media))
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pcm$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("length"),
            F.col("content").alias("payload"),
        )
    )
    packed = mm.pack_media(raw, "payload", "audio")
    rows = {r["doc_id"]: r for r in packed.collect()}
    assert set(rows) == {0, 1, 2}
    assert all(r["media_meta"]["kind"] == "audio" for r in rows.values())
    assert rows[1]["media_meta"]["n_bytes"] == 10  # 5 int16 samples

    decoded = {r["doc_id"]: r for r in mm.decode_audio(packed).collect()}
    assert [decoded[i]["n_samples"] for i in (0, 1, 2)] == [4, 5, 6]


def test_pq_persisted_index_equals_direct(spark):
    # the persisted-index path must reproduce the build-per-query path
    # bit for bit (same codebooks, same codes, same ranking)
    import tempfile

    from time_series_data_pipeline_spark.catalog import table
    from time_series_data_pipeline_spark.operators import similarity as sim

    from .conftest import SF_SMOKE

    emb = table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    with tempfile.TemporaryDirectory() as d:
        sim.pq_index_build(emb, d, dim=64, m=16, ksub=64)
        idx = sim.pq_index_load(spark, d)
        direct = sorted(
            map(tuple, sim.pq_topk(emb, q, dim=64, k=10).collect())
        )
        stored = sorted(
            map(tuple, sim.pq_topk(emb, q, dim=64, k=10, index=idx).collect())
        )
        assert direct == stored
        rr_direct = sorted(
            map(tuple, sim.pq_topk_rerank(emb, q, dim=64, shortlist=50, k=10).collect())
        )
        rr_stored = sorted(
            map(
                tuple,
                sim.pq_topk_rerank(
                    emb, q, dim=64, shortlist=50, k=10, index=idx
                ).collect(),
            )
        )
        assert rr_direct == rr_stored


def test_csv_dead_letter_split(spark, tmp_path):
    # sensor-rig garbage: text in a numeric cell, an over-wide row, and
    # a truncated row all quarantine with raw text + source file (CSV
    # is positional — a missing tail is structural damage, unlike
    # JSONL's legal absent keys); the intact row survives typed
    from time_series_data_pipeline_spark.sources.gas_csv import (
        GAS_SCHEMA,
        read_wide_csv_tolerant,
    )

    header = ",".join(f.name for f in GAS_SCHEMA.fields)
    n = len(GAS_SCHEMA.fields)
    good_row = ",".join(str(float(i)) for i in range(n))
    text_row = "12.5,garbage," + ",".join("1.0" for _ in range(n - 2))
    wide_row = ",".join("2.0" for _ in range(n + 3))
    short_row = "99.0,3.5"
    p = tmp_path / "20161001_000000.csv"
    p.write_text("\n".join([header, good_row, text_row, wide_row, short_row]) + "\n")

    good, quarantine = read_wide_csv_tolerant(spark, str(p))
    g = good.collect()
    q = quarantine.collect()
    assert len(g) == 1 and len(q) == 3
    assert g[0]["time_s"] == 0.0 and g[0]["r14_mohm"] == float(n - 1)
    for r in q:
        assert r["file_name"] == "20161001_000000.csv"
    raws = {r["raw_line"] for r in q}
    assert any("garbage" in r for r in raws)
    assert any(r.count(",") == n + 2 for r in raws)
    assert "99.0,3.5" in raws


def test_lsh_tuning_exact_duplicate_threshold():
    """threshold=1.0 (exact-duplicate search) must produce a working
    banding, not a bare math-domain ValueError from log(0)."""
    from time_series_data_pipeline_spark.operators.similarity import (
        lsh_tuning,
    )

    n, b = lsh_tuning(1.0)
    assert n >= 1 and b >= 1 and n % b == 0


def test_pack_sequences_pad_without_shards_raises(spark):
    import pytest

    from time_series_data_pipeline_spark.operators.text import pack_sequences

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="pad_shards"):
        pack_sequences(docs, budget=10, pad_shards=True)


def test_streaming_rollup_maintenance_watched_horizon(spark, tmp_path):
    """SCALE §20 mitigation (VERDICT r8 item 5 / r9 item 4):
    ``watch_recent_days=N`` narrows the file source to the newest N
    ``_date`` partitions, so the per-trigger listing floor is bounded
    by the horizon, not store history. The watched tick must still
    refresh arrivals inside the horizon exactly like the full watch;
    an arrival OUTSIDE it is (by documented design) deferred to the
    next unwatched/backfill tick — and the checkpoint's seen-files
    log must carry across the source-path changes."""
    import datetime

    from pyspark.sql import functions as F

    from time_series_data_pipeline_spark.sources import bucket as bkt
    from time_series_data_pipeline_spark.streaming.ingest import (
        _recent_bucket_dates,
        start_rollup_maintenance,
    )

    bucket_path = str(tmp_path / "bkt")
    roll = str(tmp_path / "roll")
    ckpt = str(tmp_path / "ckpt")

    def mk(day, base):
        t0 = datetime.datetime(2024, 3, day)
        return [
            ("gas", f"f{j}", t0 + datetime.timedelta(minutes=30 * i),
             float(base + i + j))
            for i in range(4) for j in range(2)
        ]

    def write(rows):
        df = spark.createDataFrame(
            rows, ["_measurement", "_field", "_time", "_value"]
        ).withColumn("tags", F.lit(None).cast("map<string,string>"))
        bkt.write_bucket(df, bucket_path)

    def drain(**kw):
        q = start_rollup_maintenance(spark, bucket_path, roll, ckpt, **kw)
        q.awaitTermination(120)

    def snap(path):
        return {
            tuple(r)
            for r in spark.read.parquet(path)
            .select("_measurement", "_field", "_hour", "_date", "n",
                    F.col("sum_value").cast("double"))
            .collect()
        }

    # store spans days 1..12; full (unwatched) backfill drain first
    write(mk(1, 10) + mk(2, 20) + mk(10, 30) + mk(11, 40) + mk(12, 50))
    drain()

    # the horizon helper: newest 3 present dates only
    assert _recent_bucket_dates(bucket_path, 3) == [
        "2024-03-10", "2024-03-11", "2024-03-12"
    ]
    assert _recent_bucket_dates(bucket_path, 100) == [
        "2024-03-01", "2024-03-02", "2024-03-10",
        "2024-03-11", "2024-03-12",
    ]
    assert _recent_bucket_dates(str(tmp_path / "nope"), 3) == []

    # arrival INSIDE the horizon: the watched tick refreshes it
    write(mk(12, 99))
    drain(watch_recent_days=3)
    full = str(tmp_path / "full")
    bkt.refresh_hourly_rollup(spark, bucket_path, full)
    assert snap(roll) == snap(full) and len(snap(roll)) > 0

    # arrival OUTSIDE the horizon: the watched tick must not see it
    # (listing never descends old dates) — the rollup stays stale for
    # day 1 until an unwatched tick catches it up
    write(mk(1, 77))
    drain(watch_recent_days=3)
    stale = snap(roll)
    bkt.refresh_hourly_rollup(spark, bucket_path, full)
    assert stale != snap(full)
    drain()  # unwatched catch-up over the same checkpoint
    assert snap(roll) == snap(full)
