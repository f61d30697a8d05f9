"""Keyed MERGE/upsert ``foreachBatch`` sink — exactly-once mutable state
over plain Parquet (SURVEY.md §2.7 ST6 completion).

The reference's InfluxDB writes are last-write-wins per (measurement,
tags, time) point (README.md:155-161) — i.e. its sink is an UPSERT, not
an append. The append/overwrite-by-partition paths (sources/bucket.py,
streaming/ingest.py) cover immutable facts; this sink covers the keyed
mutable case: "latest reading per sensor", "current session per user",
any table whose rows are REPLACED by key as new data streams in.

Exactly-once without a transactional table format, from two pieces:

1. **Idempotence by epoch.** ``foreachBatch`` redelivers a batch with
   the SAME epoch id after a crash/restart (the checkpoint replays the
   uncommitted epoch). The sink records each applied epoch as a commit
   marker file; a redelivered epoch whose marker exists is skipped, so
   a retry can never double-apply (the delete-after-load double-write
   race in the reference's ETL.py:100-105 is exactly what this closes).
2. **Atomic visibility.** Each batch MERGEs into a NEW versioned
   snapshot directory (``v-<epoch>-<nonce>``); the commit marker — a
   tiny file whose atomic creation is the commit point — names the
   snapshot. Readers resolve the highest committed epoch and read only
   its snapshot: a crash between data write and marker leaves an
   invisible orphan directory, never a torn table.

MERGE semantics per batch: within the batch, the greatest
``order_col`` row per key wins (deterministic tie-break on remaining
columns); against the current snapshot, batch keys REPLACE existing
rows (anti-join + union) and new keys are inserted.

Scale: the merge itself is one shuffled anti-join + union — linear,
broadcast-free. Rewriting the FULL snapshot per batch is the honest
cost of multi-row transactions on a plain filesystem; at 100 TB state
you would either partition the snapshot and rewrite only partitions the
batch touches (the dynamic-overwrite pattern sources/bucket.write_bucket
uses) or hand the same foreachBatch body a transactional format's
``MERGE INTO`` (Delta/Iceberg) — the epoch-idempotence logic above is
identical in all three; only the rewrite granularity changes.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class UpsertParquetSink:
    """``foreachBatch`` target maintaining a keyed last-write-wins table.

    >>> sink = UpsertParquetSink(path, keys=["sensor"], order_col="ts")
    >>> stream.writeStream.foreachBatch(sink).option(
    ...     "checkpointLocation", ckpt).start()
    >>> sink.read(spark)  # the current merged table
    """

    def __init__(self, path: str, keys: list[str], order_col: str):
        if not keys:
            raise ValueError("upsert sink requires at least one key column")
        self.path = path
        self.keys = list(keys)
        self.order_col = order_col

    # -- commit log ----------------------------------------------------
    def _commits_dir(self) -> str:
        return os.path.join(self.path, "_commits")

    def _committed(self) -> dict[int, str]:
        """epoch -> snapshot dir name, for every committed epoch."""
        out: dict[int, str] = {}
        try:
            names = os.listdir(self._commits_dir())
        except FileNotFoundError:
            return out
        for n in names:
            if not n.isdigit():
                continue
            with open(os.path.join(self._commits_dir(), n)) as f:
                out[int(n)] = f.read().strip()
        return out

    def _latest_snapshot(self) -> str | None:
        commits = self._committed()
        if not commits:
            return None
        return os.path.join(self.path, commits[max(commits)])

    # -- sink ----------------------------------------------------------
    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        os.makedirs(self._commits_dir(), exist_ok=True)
        marker = os.path.join(self._commits_dir(), str(int(epoch_id)))
        if os.path.exists(marker):
            # redelivered epoch after a restart: already applied, skip —
            # this is the exactly-once half the checkpoint can't give
            return

        w = Window.partitionBy(*self.keys).orderBy(
            F.col(self.order_col).desc(),
            *[F.col(c).desc() for c in batch_df.columns if c != self.order_col],
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

        current_path = self._latest_snapshot()
        spark = batch_df.sparkSession
        if current_path is not None:
            current = spark.read.parquet(current_path)
            merged = current.join(
                latest.select(*self.keys), self.keys, "left_anti"
            ).unionByName(latest)
        else:
            merged = latest

        snap = f"v-{int(epoch_id)}-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(os.path.join(self.path, snap))

        # the commit point: tiny file, atomically published via rename
        tmp = marker + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(snap)
        os.rename(tmp, marker)

    # -- reader --------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        """The current committed table (raises if nothing committed)."""
        snap = self._latest_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot under {self.path}")
        return spark.read.parquet(snap)

    def epochs(self) -> list[int]:
        """Committed epoch ids, ascending — the table's version history."""
        return sorted(self._committed())

    def read_at(self, spark: SparkSession, epoch_id: int) -> DataFrame:
        """Time travel: the table as of ``epoch_id`` (the newest commit
        with epoch ≤ the requested one — Delta/Iceberg VERSION AS OF
        semantics). Every committed epoch's snapshot is retained and
        immutable, so historical reads are plain parquet scans; readers
        never block writers and vice versa."""
        commits = self._committed()
        eligible = [e for e in commits if e <= epoch_id]
        if not eligible:
            raise FileNotFoundError(
                f"no snapshot at or before epoch {epoch_id} under {self.path}"
            )
        return spark.read.parquet(
            os.path.join(self.path, commits[max(eligible)])
        )

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Retention: drop all but the newest ``keep_last`` committed
        snapshots (directories AND their commit markers), bounding the
        storage that per-epoch snapshots would otherwise grow without
        limit. Shrinks the time-travel horizon to ``keep_last`` epochs.

        Safety: ``keep_last`` must exceed the sink's maximum epoch
        redelivery lag (foreachBatch redelivers only the most recent
        uncommitted epoch after a restart, so ≥1 always suffices for
        exactly-once; keep more for time travel). The newest snapshot
        is never eligible, so a concurrent ``read()`` that resolved the
        latest commit cannot lose its files. Returns the vacuumed
        epoch ids."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        commits = self._committed()
        victims = sorted(commits)[:-keep_last]
        for e in victims:
            snap = os.path.join(self.path, commits[e])
            marker = os.path.join(self._commits_dir(), str(e))
            # marker first: once it is gone, no reader can resolve the
            # snapshot, so the directory delete can never tear a read
            # that started after the vacuum began
            try:
                os.remove(marker)
            except FileNotFoundError:
                pass
            shutil.rmtree(snap, ignore_errors=True)
        return victims


class PartitionedUpsertSink(UpsertParquetSink):
    """Partitioned keyed MERGE sink: per batch, only the partitions the
    batch TOUCHES are merged and rewritten — the scale form of
    ``UpsertParquetSink`` (which rewrites the full snapshot every
    batch). With 100 TB of keyed state partitioned by, say, day or
    tenant, a micro-batch touching 3 partitions rewrites 3 partitions.

    Layout: each epoch writes its touched partitions under a fresh
    ``v-<epoch>-<nonce>/<pcol>=<val>/`` tree; the commit marker names a
    MANIFEST (partition subdir -> epoch dir) built as {previous
    manifest} with the touched entries replaced. Readers group the
    manifest by epoch dir and read each group with ``basePath`` set so
    the partition column is restored; atomicity/idempotence are the
    parent's marker scheme unchanged (a crash between data write and
    marker leaves orphan dirs, never a torn table).

    The manifest accretes pointers into old epoch dirs; the read fans
    out over at most one directory group per distinct epoch still
    referenced. A periodic full rewrite (``compact``) collapses the
    manifest back to one epoch dir — the same maintenance cadence any
    log-structured table (Delta/Iceberg/Hudi) schedules.

    Partition values must be non-null (hive-encoded dir names are the
    manifest keys)."""

    def __init__(
        self, path: str, keys: list[str], order_col: str, partition_col: str
    ):
        super().__init__(path, keys, order_col)
        if partition_col in keys:
            # fine — but it must not be the ONLY key (merge would be
            # partition-global)
            if keys == [partition_col]:
                raise ValueError("partition_col cannot be the only key")
        self.partition_col = partition_col

    def _manifest(self) -> dict[str, str]:
        """partition subdir name -> epoch dir name, latest commit."""
        import json

        commits = self._committed()
        if not commits:
            return {}
        with open(os.path.join(self.path, commits[max(commits)])) as f:
            return json.load(f)

    def _read_manifest(self, spark: SparkSession, manifest: dict[str, str]):
        if not manifest:
            # a committed EMPTY table (first epoch was an empty batch) is
            # not a reader error path worth a bare IndexError: say what
            # happened (ADVICE r5)
            raise FileNotFoundError(
                f"committed manifest under {self.path} references no "
                "partitions (the table is empty — every committed epoch "
                "so far carried an empty batch)"
            )
        by_epoch: dict[str, list[str]] = {}
        for part_dir, epoch_dir in manifest.items():
            by_epoch.setdefault(epoch_dir, []).append(part_dir)
        frames = []
        for epoch_dir, part_dirs in sorted(by_epoch.items()):
            base = os.path.join(self.path, epoch_dir)
            frames.append(
                spark.read.option("basePath", base).parquet(
                    *[os.path.join(base, p) for p in sorted(part_dirs)]
                )
            )
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        return out

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        import json

        os.makedirs(self._commits_dir(), exist_ok=True)
        marker = os.path.join(self._commits_dir(), str(int(epoch_id)))
        if os.path.exists(marker):
            return  # redelivered epoch: already applied

        pcol = self.partition_col
        w = Window.partitionBy(*self.keys).orderBy(
            F.col(self.order_col).desc(),
            *[F.col(c).desc() for c in batch_df.columns if c != self.order_col],
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

        manifest = self._manifest()
        spark = batch_df.sparkSession
        # Touched partitions: distinct partition values of the batch — a
        # bounded driver-side list (#partitions per batch, not #rows).
        touched_vals = [r[0] for r in latest.select(pcol).distinct().collect()]
        if not touched_vals:
            # empty batch: commit an unchanged manifest so the epoch is
            # recorded as applied
            snap_rel = None
            new_manifest = manifest
        else:
            touched_subdirs_old = set()
            merged = latest
            if manifest:
                # current rows of the touched partitions only — the
                # manifest IS the partition pruning
                cur_all = self._read_manifest(spark, manifest)
                cur = cur_all.filter(F.col(pcol).isin(touched_vals))
                merged = cur.join(
                    latest.select(*self.keys), self.keys, "left_anti"
                ).unionByName(latest)
            snap_rel = f"v-{int(epoch_id)}-{uuid.uuid4().hex[:8]}"
            snap_abs = os.path.join(self.path, snap_rel)
            merged.write.partitionBy(pcol).mode("overwrite").parquet(snap_abs)
            written = {
                n for n in os.listdir(snap_abs) if n.startswith(f"{pcol}=")
            }
            # hive-encoded names of the touched values (as written):
            # replace exactly those entries in the manifest
            new_manifest = {
                p: d for p, d in manifest.items() if p not in written
            }
            for p in written:
                new_manifest[p] = snap_rel

        mf_name = f"manifest-{int(epoch_id)}-{uuid.uuid4().hex[:8]}.json"
        with open(os.path.join(self.path, mf_name), "w") as f:
            json.dump(new_manifest, f)
        tmp = marker + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(mf_name)
        os.rename(tmp, marker)

    def read(self, spark: SparkSession) -> DataFrame:
        if not self._committed():
            raise FileNotFoundError(f"no committed manifest under {self.path}")
        return self._read_manifest(spark, self._manifest())

    def read_at(self, spark: SparkSession, epoch_id: int) -> DataFrame:
        """VERSION AS OF for the partitioned sink: resolve the newest
        manifest with epoch ≤ the requested one and read it."""
        import json

        commits = self._committed()
        eligible = [e for e in commits if e <= epoch_id]
        if not eligible:
            raise FileNotFoundError(
                f"no manifest at or before epoch {epoch_id} under {self.path}"
            )
        with open(os.path.join(self.path, commits[max(eligible)])) as f:
            return self._read_manifest(spark, json.load(f))

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Retention for the log-structured layout: keep the newest
        ``keep_last`` manifests (and their markers); delete older
        markers + manifest files, then exactly the epoch dirs the
        VICTIM manifests reference and no surviving manifest does.

        Concurrent-writer safety (ADVICE r5): deletion eligibility is
        victim-referenced MINUS kept-referenced — never "any v-* dir
        not in the kept set". The earlier listdir sweep raced a live
        ``foreachBatch`` epoch: a dir written between the
        ``_committed()`` snapshot and the sweep (mid-write, or
        committed just after) was unreferenced *from this process's
        stale view* and got rmtree'd while the newest manifest pointed
        into it — data loss inside the exactly-once path. Restricting
        the delete set to dirs a victim manifest actually names makes
        in-flight epoch dirs ineligible by construction (no victim can
        reference a dir that didn't exist when it was committed...
        and any dir it does reference that the kept manifests still
        need is excluded by the subtraction). Crash orphans (data
        written, marker never created) are left behind — bounded by
        crash count, and reclaimable by ``compact`` which collapses
        the table into one fresh epoch dir after which every old dir
        becomes victim-referenced-only on the next vacuum.

        Returns the vacuumed epoch ids."""
        import json
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        commits = self._committed()
        ordered = sorted(commits)
        victims, keep = ordered[:-keep_last], ordered[-keep_last:]
        kept_refs: set[str] = set()
        for e in keep:
            with open(os.path.join(self.path, commits[e])) as f:
                kept_refs.update(json.load(f).values())
        victim_refs: set[str] = set()
        for e in victims:
            try:
                with open(os.path.join(self.path, commits[e])) as f:
                    victim_refs.update(json.load(f).values())
            except FileNotFoundError:
                pass
        for e in victims:
            try:
                os.remove(os.path.join(self._commits_dir(), str(e)))
            except FileNotFoundError:
                pass
            try:
                os.remove(os.path.join(self.path, commits[e]))
            except FileNotFoundError:
                pass
        for d in sorted(victim_refs - kept_refs):
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return victims
