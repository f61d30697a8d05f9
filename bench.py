"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop sink
(df.write.format("noop")): every output column is produced and shipped,
so narrow map-only queries (scrub_pii, token_stats, counter_rate, ...)
execute their full projection/window work. A bare .count() would let
Catalyst prune unused projections and Window operators and time little
more than scan+count.
"""

from __future__ import annotations

import json
import os
import time

from time_series_data_pipeline_spark.queries import QUERIES
from time_series_data_pipeline_spark.session import get_spark

# Headline queries: the flagship time-series path + the heaviest
# relational/extension operators (join, agg, window fn, unpivot, dedup,
# similarity). Names must exist in the registry.
HEADLINE = (
    "window_5m_mean",
    "window_5m_mean_bucketed",
    "flux_pipeline_mean",
    # round 10: the COMPILER path beside the hand-written plan —
    # flux_pipeline_mean is the DataFrame form of the same panel;
    # flux_compiled_mean runs the verbatim Flux text through
    # compile_flux, so front-end translation overhead is a measured
    # number (it should be driver-only: the compiled plan is
    # bit-identical); the overlay join is the multi-statement shape
    "flux_compiled_mean",
    "flux_compiled_join_overlay",
    # round 10b: the two new compiled shapes with nontrivial physical
    # plans — the Arrow per-series EMA kernel (the sequential-recurrence
    # escape hatch under measurement) and the pearsonr alignment join
    "flux_compiled_ema",
    "flux_compiled_pearsonr",
    # round 10c: the indicator batch's two heaviest shapes — the
    # chained-EMA Arrow kernel (full-series doubleEMA output) and the
    # trailing-frame CMO (exact-decimal sliding sums); mode's
    # two-aggregation shape rides the suite below
    "flux_compiled_dema",
    "flux_compiled_cmo",
    # round 11: the tagged-store panel — tag-equality pushdown over the
    # promoted column + full-series-key windowed aggregate — and the
    # compiled continuous-query task (each attempt re-executes the
    # idempotent downsample refresh: the steady-state rollup cost)
    "flux_compiled_tag_filter",
    "flux_compiled_to_rollup",
    # round 11b: the new compiled shapes with distinct physical plans —
    # the triple-recursion TRIX kernel, the gap-interpolation
    # pair-explode plan (two window passes over one table-key
    # exchange, marks exploded per consecutive pair), and the
    # downsample-then-rate composition (selector aggregate exchange +
    # per-table derivative window)
    "flux_compiled_trix",
    "flux_compiled_interpolate",
    "flux_compiled_downsample_rate",
    # the exact windowed rank: one raw-row compound-key exchange —
    # the only new shape whose cost scales with RAW rows per window
    "flux_compiled_windowed_quantile",
    # round 12: the new physical shapes — the forecast-with-fit
    # struct-accumulator fold (fits array carried through the same
    # F.aggregate, zip-exploded with the slot spine), the cross-field
    # reduce fold (one narrowed raw-row exchange into the Arrow
    # recurrence kernel), and the nested combiner overlay (three
    # window aggregates, exchange-free union, broadcast join)
    "flux_compiled_holt_winters_fit",
    "flux_compiled_reduce_fold",
    "flux_compiled_nested_overlay",
    # round 12d: the tail rewrite over the windowed mean (postmap +
    # threshold — the tail must cost a projection, nothing more), the
    # trapezoid/span twa (the integral machinery's second consumer),
    # and the per-tag pivot (the groupBy().pivot() reshape over the
    # tagged store — the one round-12d shape with its own physical plan)
    "flux_compiled_postmap_units",
    "flux_compiled_time_weighted",
    "flux_compiled_tag_pivot",
    # round 13: the time-decayed EMA — same Arrow recurrence class as
    # flux_compiled_ema but per-gap weights (timestamps ride into the
    # kernel), so its cost is its own number
    "flux_compiled_etma",
    "window_sliding_15m_5m",
    "session_windows_5m",
    "asof_error_click",
    "range_join_clicks_before_error",
    "rollup_day_from_hour",
    "rolling_stats_zscore",
    "counter_rate",
    "pricing_summary",
    "suite_joins",
    "suite_window_fns",
    "unpivot_lineitem",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "embedding_topk",
    "embedding_neardup_pairs",
    "embedding_ivf_topk",
    "dedup_exact",
    "doc_profile",
    "bpe_encode_stats",
    "scrub_pii",
    "winnow_fingerprints",
    "sampling_splits",
    "heavy_hitter_tokens",
    "bm25_search",
    "doc_chunks",
    "embedding_quantized_topk",
    "value_histogram",
    "value_trend_per_type",
    "merge_value_intervals",
    "time_weighted_avg",
    "event_transitions",
    "simhash_pairs",
    "dedup_clusters",
    # the registered scale alternative to the O(n²) exact cosine path —
    # benched beside embedding_neardup_pairs so the wall-time win is on
    # record (VERDICT r4 item 6)
    "embedding_lsh_ann",
    # compressed-corpus search: ADC shortlist + exact re-rank
    "embedding_pq_rerank",
    # round-5 pass-4 curation tier: hashed-n-gram importance weighting,
    # span-level exact dedup, hybrid lexical+dense retrieval
    "dsir_weights",
    "duplicate_spans",
    "hybrid_search_rrf",
    # the full curation cascade (exact/near dedup + repetition +
    # quality + DSIR) as one job
    "curation_pipeline",
    # round-7: sequence packing global (single-partition window, the
    # oracle-parity form) vs 8-way sharded (the 100 TB path) — benched
    # side by side so the distributed plan's overhead/win is measured,
    # not claimed (VERDICT r6 item 2)
    "pack_sequences",
    "pack_sequences_sharded",
    # round 15: the driver-facing drained streaming queries — the
    # applyInPandasWithState envelope (moving_avg) and the append-mode
    # window-state envelope (window_mean) through the registered-query
    # surface (compile + availableNow drain + memory-sink capture), so
    # the cost the driver's correctness gate pays is itself a
    # measured number
    "stream_moving_avg_drained",
    "stream_window_mean_drained",
    # round 15b: the InfluxQL front-end beside its Flux twins —
    # influxql_group_mean is the same tagged panel as
    # flux_compiled_tag_filter asked in the 1.x language (front-end
    # overhead should be driver-only, like flux_compiled_mean vs
    # flux_pipeline_mean); influxql_multi_agg is the shape where the
    # single conditional-aggregation shuffle replaces N Flux pipelines
    # + joins, so the structural win is a measured number
    "influxql_group_mean",
    "influxql_multi_agg",
)


_CAL_VERSION = "cal-v1"

# Pinned IDLE reference for the calibration anchor (VERDICT r12 item
# 4): the quiet-run anchors recorded across r10–r12 cluster at
# 0.196–0.26 s (builder quiet captures 0.196/0.209/0.229/0.258; judge
# idle re-runs 0.218/0.313) — 0.21 is the pinned floor-of-band value.
# A run whose BOTH anchors sit above 2× this reference is uniformly
# contended: the within-run spread test can't see it (that was the
# r12 failure mode — anchors 0.44/0.46, ratio ~1.0, no adjudication
# fired, and a 1.9× phantom mover shipped), so the absolute test
# fires the same 5-slowest re-run. (2×, not 1.5×: the idle band
# itself tops at 0.313 s, inside 1.5 × 0.21.) If the bench box
# changes generations, re-pin this from that box's quiet END anchors.
_CAL_IDLE_REFERENCE = 0.21


def _calibration_workload(spark) -> float:
    """Environment-calibration anchor (VERDICT r10 item 3): a FIXED,
    engine-independent reference workload — pinned-seed parquet
    (4M rows, built once per version under /tmp) → scan → groupBy(k)
    → sum/avg/max → noop sink — timed min-of-3. It exercises nothing
    from this repo, so its round-over-round ratio measures the BOX
    (CPU contention, page cache, GC pressure), not the engine: divide
    a query's cross-round ratio by the calibration ratio to normalize
    drift out (normalization rule recorded in ROUND_NOTES). Run at
    bench start AND end; a large start/end spread marks the run as
    contended mid-flight."""
    import numpy as np
    import pandas as pd

    path = f"/tmp/tsdp_bench_{_CAL_VERSION}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path)
        rng = np.random.default_rng(2024)
        n = 4_000_000
        pd.DataFrame(
            {
                "k": rng.integers(0, 1000, n),
                "v": rng.normal(0.0, 1.0, n),
            }
        ).to_parquet(os.path.join(path, "cal.parquet"), index=False)
        open(marker, "w").close()
    from pyspark.sql import functions as F

    def _run() -> None:
        (
            spark.read.parquet(os.path.join(path, "cal.parquet"))
            .groupBy("k")
            .agg(F.sum("v"), F.avg("v"), F.max("v"), F.count("v"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    # one untimed warm-up: the anchor must measure the BOX, so its own
    # one-time costs (page-cache fill of the cal file, agg codegen)
    # stay out of the timed attempts — measured 1.05 s first-touch vs
    # 0.22 s steady for identical work
    _run()
    attempts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _run()
        attempts.append(time.perf_counter() - t0)
    return round(min(attempts), 3)


def _loadavg_1m() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return -1.0


def _bench_ingest_backfill(spark) -> float:
    """Time the reference batch-backfill path (SURVEY §3.1 / BASELINE's
    '~4M wide rows in a 10-min budget' envelope): 13 daily wide CSVs →
    schema-pinned scan → wide→long unpivot (×19 fields) → partitioned
    bucket write. The synthetic corpus (13 × $SPARK_GRAFT_INGEST_ROWS
    wide rows, default 30k ≈ 7.4M long rows) is generated once and
    reused across bench runs; only ingest+write is timed."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd

    from time_series_data_pipeline_spark.sources import bucket as bkt
    from time_series_data_pipeline_spark.sources import gas_csv

    rows = int(os.environ.get("SPARK_GRAFT_INGEST_ROWS", "30000"))
    corpus = f"/tmp/tsdp_bench_ingest_corpus_r{rows}"
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        shutil.rmtree(corpus, ignore_errors=True)
        os.makedirs(corpus)
        rng = np.random.default_rng(7)
        cols = ["Time (s)", *gas_csv.FIELD_LABELS.values()]
        for d in range(13):
            data = {"Time (s)": np.arange(rows) * (86000.0 / rows)}
            for j, c in enumerate(cols[1:]):
                data[c] = np.round(rng.normal(10 + j, 3, rows), 4)
            pd.DataFrame(data).to_csv(
                os.path.join(corpus, f"201610{d + 1:02d}_000000.csv"), index=False
            )
        open(os.path.join(corpus, "_DONE"), "w").close()

    out = tempfile.mkdtemp(prefix="tsdp_bench_bucket_")
    t0 = time.perf_counter()
    from pyspark.sql import functions as F

    # round 15 (shuffle-before-explode, guide §2.3/§8): cluster the WIDE
    # frame by day BEFORE the 19x unpivot, so the exchange moves ~60 MB
    # of wide rows instead of ~300 MB of long ones; the unpivot + sort +
    # write then run on the already-day-clustered partitions
    # (write_bucket cluster="pre"). Output layout/content identical
    # (same day files, same (_field, _time) sort). Measured 1.9->1.6 s.
    wide = gas_csv.ingest_wide(spark, corpus).repartition(F.to_date("_time"))
    long_df = bkt.to_long(
        wide,
        "gas",
        value_cols=list(gas_csv.VALUE_COLS),
        field_labels=gas_csv.FIELD_LABELS,
    )
    bkt.write_bucket(long_df, out, cluster="pre")
    elapsed = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    return elapsed


def _warm_backfill_machinery(spark) -> None:
    """Throwaway mini-backfill before the TIMED backfill attempts
    (VERDICT r8 item 3, carried to r9 item 3): two tiny CSVs through
    the IDENTICAL scan → wide→long unpivot → partitioned-write path,
    so CSV-reader codegen, the parquet committer, and the write-path
    class loading never land inside a timed attempt. r8's driver
    capture recorded 4.61 s cold vs 1.6–2.5 s steady for the same
    code purely because attempt 1 paid this init under contention —
    warming is the fix min-of-N can't fake (same rationale as
    _warm_stream_machinery)."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd

    from time_series_data_pipeline_spark.sources import bucket as bkt
    from time_series_data_pipeline_spark.sources import gas_csv

    corpus = tempfile.mkdtemp(prefix="tsdp_bench_warm_backfill_")
    out = tempfile.mkdtemp(prefix="tsdp_bench_warm_bucket_")
    try:
        rng = np.random.default_rng(13)
        cols = ["Time (s)", *gas_csv.FIELD_LABELS.values()]
        for d in range(2):
            data = {"Time (s)": np.arange(100) * 860.0}
            for j, c in enumerate(cols[1:]):
                data[c] = np.round(rng.normal(10 + j, 3, 100), 4)
            pd.DataFrame(data).to_csv(
                os.path.join(corpus, f"201608{d + 1:02d}_000000.csv"),
                index=False,
            )
        long_df = bkt.to_long(
            gas_csv.ingest_wide(spark, corpus),
            "gas",
            value_cols=list(gas_csv.VALUE_COLS),
            field_labels=gas_csv.FIELD_LABELS,
        )
        bkt.write_bucket(long_df, out)
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def _warm_stream_machinery(spark) -> None:
    """Throwaway mini-drain before the TIMED stream-chain attempts
    (VERDICT r7 item 2): one tiny 2-file corpus through the identical
    ingest + rollup chain, so streaming-machinery one-time init — state
    store and sink-log class loading, micro-batch planner codegen,
    checkpoint format setup — never lands inside a timed attempt. The
    r7 driver recorded 8.4 s for a chain that steady-states at 3.0 s
    because BOTH min-of-2 attempts paid cold init under box
    contention; warming is the only fix min-of-N can't fake."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd

    from time_series_data_pipeline_spark.sources import gas_csv
    from time_series_data_pipeline_spark.streaming import ingest as sti

    corpus = tempfile.mkdtemp(prefix="tsdp_bench_warm_corpus_")
    scratch = tempfile.mkdtemp(prefix="tsdp_bench_warm_stream_")
    try:
        rng = np.random.default_rng(11)
        cols = ["Time (s)", *gas_csv.FIELD_LABELS.values()]
        for d in range(2):
            data = {"Time (s)": np.arange(100) * 860.0}
            for j, c in enumerate(cols[1:]):
                data[c] = np.round(rng.normal(10 + j, 3, 100), 4)
            pd.DataFrame(data).to_csv(
                os.path.join(corpus, f"201609{d + 1:02d}_000000.csv"), index=False
            )
        q1 = sti.start_bucket_ingest(
            spark, corpus, os.path.join(scratch, "bucket"),
            os.path.join(scratch, "ckpt_ingest"),
        )
        q1.awaitTermination()
        q2 = sti.start_rollup_maintenance(
            spark, os.path.join(scratch, "bucket"),
            os.path.join(scratch, "rollup"),
            os.path.join(scratch, "ckpt_rollup"),
        )
        q2.awaitTermination()
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)


def _bench_stream_chain(spark) -> float:
    """Time the CONTINUOUS chain at the ingest-corpus scale (VERDICT r5
    item 6): CSV stream → exactly-once partitioned bucket
    (streaming/ingest.start_bucket_ingest) → hourly-rollup maintenance
    stream (start_rollup_maintenance), both drained with
    trigger(availableNow) so the number is the full streaming envelope
    — micro-batch scheduling, checkpoint commits, dynamic-partition
    rollup refresh — over the same 13 × $SPARK_GRAFT_INGEST_ROWS wide
    CSVs the batch `ingest_backfill` entry measures (~7.4M long rows).
    Fresh sink/checkpoint dirs per attempt: re-timing a drained
    checkpoint would measure a no-op."""
    import shutil
    import tempfile

    from time_series_data_pipeline_spark.streaming import ingest as sti

    rows = int(os.environ.get("SPARK_GRAFT_INGEST_ROWS", "30000"))
    corpus = f"/tmp/tsdp_bench_ingest_corpus_r{rows}"
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        # built by _bench_ingest_backfill, which always runs first
        _bench_ingest_backfill(spark)

    scratch = tempfile.mkdtemp(prefix="tsdp_bench_stream_")
    bucket = os.path.join(scratch, "bucket")
    rollup = os.path.join(scratch, "rollup")
    t0 = time.perf_counter()
    q1 = sti.start_bucket_ingest(
        spark, corpus, bucket, os.path.join(scratch, "ckpt_ingest")
    )
    q1.awaitTermination()
    q2 = sti.start_rollup_maintenance(
        spark, bucket, rollup, os.path.join(scratch, "ckpt_rollup")
    )
    q2.awaitTermination()
    elapsed = time.perf_counter() - t0
    shutil.rmtree(scratch, ignore_errors=True)
    return elapsed


def _bench_stream_drain(spark, sf_dir: str, flux_text: str, prefix: str) -> float:
    """Time one keyed-state streaming drain: the sf-scale events
    bucket through ``compile_flux_stream(flux_text)`` with
    trigger(availableNow) — the live panel's full envelope
    (stream-source file listing, applyInPandasWithState shuffle +
    state-store commit, the per-series fold) over every event row.
    Fresh checkpoint per attempt: re-timing a drained checkpoint
    would measure a no-op. The store build is the cached one the
    batch queries share. ONE protocol for every stream-panel bench
    entry (review r14) so they always measure the same envelope."""
    import shutil
    import tempfile

    from time_series_data_pipeline_spark.flux import compile_flux_stream
    from time_series_data_pipeline_spark.queries.timeseries_q import (
        _event_bucket_path,
        _stream_partition_conf,
    )

    store = _event_bucket_path(spark, sf_dir)
    scratch = tempfile.mkdtemp(prefix=prefix)
    t0 = time.perf_counter()
    # round 15: state partitions sized to the panel's key space (the
    # drained-query rule — see timeseries_q._stream_state_partitions);
    # the timed envelope is unchanged (compile + drain + state commits),
    # only the state store stops paying 32 per-partition commits for a
    # <=5-key panel
    with _stream_partition_conf(spark):
        live = compile_flux_stream(spark, flux_text, {"b": store})
        q = (
            live.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(scratch, "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    elapsed = time.perf_counter() - t0
    shutil.rmtree(scratch, ignore_errors=True)
    return elapsed


def _bench_stream_smoothing(spark, sf_dir: str) -> float:
    """Round 13: the live smoothed panel (EMA n:12 keyed-state fold)."""
    return _bench_stream_drain(
        spark, sf_dir,
        'from(bucket: "b") |> exponentialMovingAverage(n: 12)',
        "tsdp_bench_smooth_",
    )


def _bench_stream_state_panel(spark, sf_dir: str) -> float:
    """Round 14: the bounded-list/run-state path — kaufmansAMA(n: 10)
    is the heaviest new member (n+1-value buffer + O(n) ER fold per
    row), so its envelope bounds the family (movingAverage / cmo /
    ker fold O(1) after the review-r14 running-sum change; elapsed
    and stateDuration/stateCount fold O(1))."""
    return _bench_stream_drain(
        spark, sf_dir,
        'from(bucket: "b") |> kaufmansAMA(n: 10)',
        "tsdp_bench_state_",
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Quiet stdout (VERDICT r6 item 7): the driver captures a bounded
    # tail of this process's output, and stage progress bars + the
    # expected streaming-AQE WARN (ResolveWriteToStream disables AQE
    # inside micro-batches — informational, not a misconfiguration)
    # were crowding out the one JSON line the contract requires.
    spark = get_spark(
        "tsdp-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure the queries
    QUERIES["window_5m_mean"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # environment calibration anchor + load average, captured at both
    # ends of the run (VERDICT r10 item 3) so cross-round ratios can be
    # normalized for box drift instead of hand-adjudicated
    load_start = _loadavg_1m()
    cal_start = _calibration_workload(spark)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        # Isolate queries from each other: drop whatever the PREVIOUS
        # query pinned before this one starts. Within a query, pins
        # survive across attempts — Spark's CacheManager matches cached
        # logical plans, so attempt 2 is the steady-state run in which
        # in-query persists amortize exactly as they would in
        # production (clearing between attempts forced every attempt to
        # pay the one-time build cost and hid the amortization).
        spark.catalog.clearCache()
        # BOTH numbers are recorded so a methodology change can never
        # masquerade as a plan win: attempt 1 ("queries_cold") pays
        # every one-time pin/store build from the parquet scan; the
        # best-of-3 headline ("queries") is the steady state an
        # amortized production pipeline pays. Three attempts (VERDICT
        # r9 item 3): the r9 round-over-round band on UNTOUCHED
        # queries was ±30% under box contention with min-of-2 —
        # min-of-3 halves the odds both steady attempts land on a
        # contended slice, making cross-round comparison meaningful.
        attempts: list[float] = []
        for _attempt in range(3):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            attempts.append(time.perf_counter() - t0)
        cold[name] = round(attempts[0], 3)
        timings[name] = round(min(attempts), 3)
    # same cold/steady protocol as the queries, with the write-path
    # machinery warmed first (mini-backfill above) so attempt 1 no
    # longer pays CSV-reader/committer init — run-to-run it swung
    # 4-20 s from that plus GC/cache pressure alone; the best-of-2 is
    # the reproducible cost of the backfill work itself (re-ingest of a
    # cached day is a real operation: the idempotent-overwrite retry path)
    spark.catalog.clearCache()
    _warm_backfill_machinery(spark)
    ingest_attempts = [
        round(_bench_ingest_backfill(spark), 3) for _ in range(2)
    ]
    cold["ingest_backfill"] = ingest_attempts[0]
    timings["ingest_backfill"] = min(ingest_attempts)
    _warm_stream_machinery(spark)
    # min-of-3 (round 10): the chain runs LAST, after 45+ materialized
    # queries — end-of-bench GC/cache pressure hit BOTH min-of-2
    # attempts in the same run (6.8 s recorded for a chain that
    # steady-states at 3.1 s in isolation); a third attempt makes one
    # uncontended slice far more likely
    stream_attempts = [round(_bench_stream_chain(spark), 3) for _ in range(3)]
    cold["ingest_stream_chain"] = stream_attempts[0]
    timings["ingest_stream_chain"] = min(stream_attempts)
    # round 13: the keyed-state smoothing drain (the live smoothed
    # panel) — same min-of-3 protocol
    smooth_attempts = [
        round(_bench_stream_smoothing(spark, sf_dir), 3) for _ in range(3)
    ]
    cold["stream_smoothing_panel"] = smooth_attempts[0]
    timings["stream_smoothing_panel"] = min(smooth_attempts)
    # round 14: the bounded-list/run-state drain (kaufmansAMA n:10 —
    # the heaviest new member bounds the family)
    state_attempts = [
        round(_bench_stream_state_panel(spark, sf_dir), 3) for _ in range(3)
    ]
    cold["stream_state_panel"] = state_attempts[0]
    timings["stream_state_panel"] = min(state_attempts)
    total = round(sum(timings.values()), 3)
    cal_end = _calibration_workload(spark)
    load_end = _loadavg_1m()
    # CONTENTION ADJUDICATION (VERDICT r11 item 7): when the two
    # calibration anchors disagree by more than the 1.5× "contended
    # run" threshold, the per-query numbers above were captured on a
    # box whose speed CHANGED mid-run — re-run the five slowest
    # queries once more, bracketed by their own calibration pair, and
    # record both captures in bench_detail.json so the judge reads the
    # adjudication instead of re-deriving it. (The re-run lands at
    # end-of-bench — often the calmer side of the spread; its own
    # anchors say how calm.)
    adjudication = None
    cal_ratio = max(cal_start, cal_end) / max(min(cal_start, cal_end), 1e-9)
    # two triggers (VERDICT r12 item 4): (a) the anchors DISAGREE —
    # the box changed speed mid-run; (b) BOTH anchors sit above 2×
    # the pinned idle reference — the whole run was uniformly
    # contended, which the spread test is blind to. Either way the
    # 5 slowest entries re-run bracketed by their own calibration pair.
    # 2× (not 1.5×): the recorded idle band itself tops at 0.313 s —
    # 1.5 × 0.21 = 0.315 would fire on a genuinely idle run at the
    # band's edge (review r13); 2× = 0.42 sits clear of the band and
    # below the r12 contended capture's 0.44 anchors
    abs_contended = min(cal_start, cal_end) > 2.0 * _CAL_IDLE_REFERENCE
    if cal_ratio > 1.5 or abs_contended:
        movers = sorted(timings, key=timings.get, reverse=True)[:5]
        re_cal_start = _calibration_workload(spark)
        rerun: dict[str, float] = {}
        special = {
            "ingest_backfill": lambda: _bench_ingest_backfill(spark),
            "ingest_stream_chain": lambda: _bench_stream_chain(spark),
            "stream_smoothing_panel": (
                lambda: _bench_stream_smoothing(spark, sf_dir)
            ),
            "stream_state_panel": (
                lambda: _bench_stream_state_panel(spark, sf_dir)
            ),
        }
        for name in movers:
            if name in special:
                fn = special[name]
                rerun[name] = round(min(fn() for _ in range(2)), 3)
                continue
            spark.catalog.clearCache()
            attempts = []
            for _attempt in range(3):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                attempts.append(time.perf_counter() - t0)
            rerun[name] = round(min(attempts), 3)
        adjudication = {
            "trigger_cal_ratio": round(cal_ratio, 3),
            "trigger": (
                "mid_run_change" if cal_ratio > 1.5 else "uniform_contention"
            ),
            "idle_reference": _CAL_IDLE_REFERENCE,
            "first_capture": {n: timings[n] for n in movers},
            "rerun": rerun,
            "rerun_cal": [re_cal_start, _calibration_workload(spark)],
            "rerun_load_1m": _loadavg_1m(),
        }
    # STEADY map (VERDICT r13 item 5): two driver captures in a row
    # were contended, and a naive BENCH_rN-vs-rN-1 diff of "queries"
    # read the contended first-capture numbers as regressions that the
    # adjudication block had already re-measured. Emit the adjudicated
    # steady value — min(first capture, adjudication re-run) — beside
    # the raw map, SPARSE (only re-run entries whose steady value
    # differs from "queries"; a consumer reads
    # steady.get(name, queries[name])) so the stdout line stays under
    # the driver's 2000-char capture.
    steady = {}
    if adjudication is not None:
        for name, rr in adjudication["rerun"].items():
            s = round(min(timings[name], rr), 2)
            if s != round(timings[name], 2):
                steady[name] = s
    # full per-query detail (cold attempt-1 timings, calibration pair,
    # load averages) goes to a repo-root sidecar — the stdout line must
    # stay under the driver's 2000-char capture (the r4 line overflowed
    # it and parsed as null), and the round-11 calibration fields only
    # fit with the cold ARRAY moved out of the line (total_cold stays).
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "steady": steady,
        "cold": cold,
        "total_cold": round(sum(cold.values()), 3),
        "calibration": {"start": cal_start, "end": cal_end},
        "loadavg_1m": {"start": load_start, "end": load_end},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if adjudication is not None:
        detail["adjudication"] = adjudication
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_detail.json"), "w"
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass  # detail sidecar is best-effort; the contract line is stdout
    # ONE compact line: best-of-attempts timings under the contract
    # key "queries" (2 dp on the line; 3-dp precision, cold attempts,
    # total_cold, and load averages live in bench_detail.json — the
    # line must stay under the driver's 2000-char capture); "steady" =
    # the sparse adjudicated overrides (see above); "cal" = [start,
    # end] min-of-3 calibration anchor.
    # hard budget: the driver captures a bounded 2000-char tail — an
    # overflowing line parses as null. Shedding order (review r14 —
    # the budget must never "give up"): steady entries first (all
    # duplicated in bench_detail.json's full map + adjudication
    # block), then the cal pair (also in the sidecar), then 1-dp
    # query timings (full precision lives in the sidecar). Every
    # shed stage keeps the line a parseable superset of the contract
    # keys metric/value/unit/queries/sf.
    line_steady = dict(steady)
    line_cal: list | None = [cal_start, cal_end]
    # precision ladder (VERDICT r15 item 8): a blanket 1-dp round made
    # the driver's 10% regression threshold trigger on the ±0.05 s
    # rounding step of every sub-0.6 s entry. Shed precision from the
    # LARGE entries first — ≥1 s timings lose <5% meaning at 1 dp —
    # and keep sub-1 s entries at 2 dp until nothing else is left.
    prec = 0  # 0: all 2 dp; 1: ≥1 s at 1 dp, rest 2 dp; 2: all 1 dp

    def _q(v: float) -> float:
        if prec == 0 or (prec == 1 and v < 1.0):
            return round(v, 2)
        return round(v, 1)

    while True:
        payload = {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": {n: _q(v) for n, v in timings.items()},
            "steady": line_steady,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
        if line_cal is not None:
            payload["cal"] = line_cal
        line = json.dumps(payload, separators=(",", ":"))
        if len(line) <= 1990:
            break
        if line_steady:
            line_steady.pop(max(line_steady, key=len))
        elif line_cal is not None:
            line_cal = None
        elif prec < 2:
            prec += 1
        else:
            break  # floor: nothing optional left to shed
    print(line)


if __name__ == "__main__":
    main()
