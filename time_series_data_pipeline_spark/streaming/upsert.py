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
