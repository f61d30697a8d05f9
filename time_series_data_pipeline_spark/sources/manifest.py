"""File-level statistics manifest — Delta/Iceberg-style data skipping
for a plain parquet store.

Hive-partition pruning skips DIRECTORIES and row-group stats skip
PAGES, but between them sits the file: a query with a predicate on an
unpartitioned column still opens every file's footer at plan time. A
stats manifest inverts that: per-file (min, max, n_rows) for chosen
columns is harvested ONCE (at write/compact time) and every subsequent
query consults the manifest — a tiny table — to decide which files to
scan at all. This is precisely the role of Delta's per-file stats /
Iceberg's manifest files, rebuilt here from public parquet footer
metadata.

Scale shape: footer harvesting runs IN EXECUTORS (mapInPandas over the
file list — a footer read is ~KBs of IO regardless of file size), so
manifest construction parallelizes over the store and never moves data.
The manifest itself is rows = files — at 100 TB with 256 MB files
that's ~400k rows, a broadcast-sized table.

Correct-by-construction caveat: a manifest row proves [min, max]
CONTAINS the file's values; pruning keeps any file whose range
intersects the predicate — false positives cost a scan, never a wrong
answer. Files appended after the harvest are unknown to the manifest;
`prune_files` therefore also returns files ABSENT from the manifest,
so a stale manifest degrades to extra scanning, not missing rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "file string, column string, type string, min_value string, "
    "max_value string, n_rows long"
)


def _parse(v: str | None, type_name: str):
    """Parse a stringified stat back through its column type so range
    comparisons are TYPED — lexicographic comparison of stringified
    numbers silently keeps wrong files ('99' > '250')."""
    if v is None:
        return None
    if type_name.startswith(("int", "uint")):
        return int(v)
    if type_name in ("float", "double") or type_name.startswith("decimal"):
        return float(v)
    if type_name.startswith("timestamp") or type_name.startswith("date"):
        import pandas as pd

        ts = pd.Timestamp(v)
        # normalize to naive UTC so tz-aware stats (Spark LTZ columns)
        # compare against naive bounds
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts
    return v


def build_stats_manifest(
    spark: SparkSession,
    path: str,
    columns: list[str],
    n_tasks: int = 32,
) -> DataFrame:
    """Harvest per-file (min, max, n_rows) for ``columns`` from parquet
    footers, in executors. Values are carried as strings (ISO for
    timestamps, repr for numerics) so one manifest schema serves every
    column type; comparisons at prune time parse back through the
    column's own type."""
    import glob
    import os

    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    file_df = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(n_tasks, max(len(files), 1)))

    cols = list(columns)

    def _harvest(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                md = pq.read_metadata(f)
                arrow_schema = pq.read_schema(f)
                names = {c: i for i, c in enumerate(md.schema.names)}
                for c in cols:
                    if c not in names:
                        continue
                    type_name = str(arrow_schema.field(c).type)
                    mn = mx = None
                    nrows = 0
                    for rg in range(md.num_row_groups):
                        col = md.row_group(rg).column(names[c])
                        nrows += md.row_group(rg).num_rows
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            mn = mx = None
                            break
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                    out.append(
                        (
                            f,
                            c,
                            type_name,
                            None if mn is None else str(mn),
                            None if mx is None else str(mx),
                            nrows,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "file", "column", "type", "min_value", "max_value", "n_rows"
                ],
            )

    return file_df.mapInPandas(_harvest, MANIFEST_SCHEMA)


def write_manifest(manifest: DataFrame, manifest_path: str) -> None:
    """Persist the manifest beside the store (one small parquet)."""
    manifest.coalesce(1).write.mode("overwrite").parquet(manifest_path)


def prune_files(
    spark: SparkSession,
    path: str,
    manifest_path: str,
    column: str,
    lo=None,
    hi=None,
) -> list[str]:
    """Files whose [min, max] range for ``column`` intersects [lo, hi]
    (either bound may be None = unbounded), PLUS any file in the store
    that the manifest does not cover (stale-manifest safety).
    Comparisons are TYPED: stats parse back through the column's
    recorded arrow type (the manifest is file-sized, so this runs
    driver-side over the collected rows)."""
    import glob
    import os

    rows = (
        spark.read.parquet(manifest_path)
        .filter(F.col("column") == column)
        .collect()
    )
    kept = []
    for r in rows:
        mn = _parse(r["min_value"], r["type"])
        mx = _parse(r["max_value"], r["type"])
        plo = _parse(None if lo is None else str(lo), r["type"])
        phi = _parse(None if hi is None else str(hi), r["type"])
        if mn is None or mx is None:  # no stats → must scan
            kept.append(r["file"])
            continue
        if plo is not None and mx < plo:
            continue
        if phi is not None and mn > phi:
            continue
        kept.append(r["file"])
    known = {r["file"] for r in rows}
    all_files = set(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    unknown = sorted(all_files - known)
    return sorted(kept) + unknown


def scan_pruned(
    spark: SparkSession,
    path: str,
    manifest_path: str,
    column: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Manifest-pruned read: only intersecting (or unknown) files are
    opened. The predicate itself must STILL be applied by the caller —
    pruning is file-granular, rows inside a kept file may fall outside
    [lo, hi]."""
    files = prune_files(spark, path, manifest_path, column, lo, hi)
    if not files:
        # preserve schema with an empty frame
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*files)
