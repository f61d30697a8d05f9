"""Stream-stream joins (SURVEY.md §2.7 ST3/ST5 extension): correlate
two live event streams within a bounded time window — e.g. every error
joined to the same user's clicks from the preceding N minutes, while
both sides are still arriving.

Spark's stream-stream inner join buffers BOTH sides in state; the
watermark plus the time-range join condition is what makes that state
bounded: a buffered left row can be evicted once the watermark passes
``left.ts + window`` (no future right row can match it), and a right
row once it passes ``right.ts`` (plus the join range). Without the
range condition the state would grow forever — the condition is not an
optimization, it is the liveness contract.

Scale: state per key-window is the stream's rate x the join window, not
history; the join itself shuffles both streams on the equi-key exactly
like the batch hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window: str = "5 minutes",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join two watermarked streams on ``on`` where the right
    event falls in ``[left.ts - window, left.ts]`` (the streaming
    counterpart of the batch range join / backward as-of family).

    Both inputs must carry DISTINCT timestamp column names (rename
    before calling); the returned frame contains every column of both
    sides. The watermark bounds both buffers; ``window`` bounds how far
    apart matched events may be.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {window}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, "inner").drop(rw[on])


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch of the stream
    hash-joins against a STATIC dimension frame — the standard
    enrichment shape (events → device/customer/config attributes).

    The static side needs no watermark and holds NO streaming state:
    Spark re-plans it per micro-batch, so a dimension backed by a file
    source even picks up new files between batches (slowly-changing
    dimension refresh for free). With ``broadcast_dim`` (the default —
    dimensions are small by definition) each batch is a broadcast hash
    join: zero shuffle on the hot stream path, which is exactly what
    the 100 TB/day firehose wants; set it False for a dimension too
    large to broadcast and the batch falls back to a shuffled join."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)
