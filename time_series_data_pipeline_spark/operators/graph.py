"""Graph operators for dedup clustering: connected components over a
near-duplicate pair list.

A pair list (id_a, id_b) is only half a dedup pipeline — acting on it
requires grouping pairs into clusters (a≈b, b≈c ⇒ {a,b,c} is ONE
duplicate group) and electing a canonical keeper per cluster. That is
connected components over the similarity graph, the step every
production dedup run (e.g. the MinHashLSH → components → keep-one
pipelines described in the deduplication literature) performs between
pair generation and row deletion.

Algorithm: iterated min-label propagation ("hash-min" — Rastogi et al.,
'Finding Connected Components in Map-Reduce in Logarithmic Rounds',
and the simple baseline of Kiveris et al.'s 'Connected Components in
MapReduce and Beyond', whose large-star/small-star rounds are the
upgrade path if diameters ever grow). Each round every node adopts the
minimum label among itself and its neighbors; rounds = graph diameter.
Near-dup similarity graphs are unions of small dense cliques — observed
diameters are 1-3 — so the round count is tiny and independent of
corpus size.

Scale shape per round: one shuffle of the EDGE list (keyed by dst) + a
min-combine — edges are the near-dup pair list, orders of magnitude
smaller than the corpus; the corpus itself never enters the loop. The
convergence check is a single aggregated scalar per round (the same
driver-side pattern GraphX/GraphFrames use); each round's label frame
is pinned and the previous round's unpersisted, so lineage stays O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint's executor blocks eagerly.

    A checkpointed DataFrame's plan is a LogicalRDD over the persisted
    block RDD; dropping the Python reference only frees the blocks when
    the JVM ContextCleaner eventually GCs it, so a long CC run would
    hold one label-frame copy per round. Unpersisting the underlying
    RDD bounds executor storage to two rounds (previous + current).
    Best-effort: if the internal accessor shape ever changes, the
    blocks still fall back to GC-driven cleanup."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al.): every node u links its
    strictly-larger neighbors to min(N(u) ∪ {u}). Input and output are
    SYMMETRIC edge lists."""
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    out = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return out.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        out.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """One small-star round: orient edges high→low, then every node u
    links its (smaller) neighbors and itself to min(N(u) ∪ {u})."""
    d = sym.filter(F.col("u") > F.col("v")).distinct()
    m = d.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    j = d.join(m, "u")
    out = (
        j.select(F.col("v").alias("a"), F.col("m").alias("b"))
        .union(j.select(F.col("u").alias("a"), F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return out.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        out.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def _star_components(sym0: DataFrame, max_iter: int) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    'Connected Components in MapReduce and Beyond'): alternate the two
    rules until the edge set reaches its fixpoint — a forest of depth-1
    stars rooted at each component's minimum id. Converges in
    O(log² n) rounds INDEPENDENT of graph diameter, so chain-shaped
    graphs that cost hash-min one round per hop finish in a handful of
    rounds here. Per round: two groupBy+join shuffles over the edge
    list only; convergence check is a 1-row (count, hash-sum) scalar —
    a collision-proof fixpoint signature is not needed because the
    iteration is monotone (edge target labels only decrease)."""
    sym = sym0
    prev_sig = None
    for _ in range(max_iter):
        new_sym = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        sig = tuple(
            new_sym.agg(
                F.count("*").alias("n"),
                # decimal sum: a BIGINT Σ of 64-bit hashes overflows
                # (and raises under Spark 4 ANSI mode)
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
        )
        if sym is not sym0:
            _release_checkpoint(sym)
        sym = new_sym
        if sig == prev_sig:
            # fixpoint: sym is now (leaf ↔ root) stars
            stars = sym.filter(F.col("u") > F.col("v"))
            nodes = sym0.select("u").distinct()
            return nodes.join(
                stars.withColumnRenamed("u", "node"), nodes["u"] == F.col("node"), "left"
            ).select(
                nodes["u"].alias("node"),
                F.coalesce(F.col("v"), nodes["u"]).alias("component"),
            )
        prev_sig = sig
    raise RuntimeError(
        f"star connected_components did not converge in {max_iter} rounds"
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "auto",
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = the minimum node id in the node's connected component.

    Deterministic for any partitioning (min is order-insensitive).

    ``algorithm``: ``"hashmin"`` = min-label propagation, one round per
    diameter hop — optimal for near-dup clique graphs (diameter 1–3);
    ``"star"`` = large-star/small-star, O(log² n) rounds regardless of
    diameter; ``"auto"`` (default) = hash-min, falling back to star if
    no convergence within 5 rounds (a long chain has shown up).
    Raises if neither converges within ``max_iter`` rounds rather than
    returning a half-propagated labeling.
    """
    # Lineage is truncated PHYSICALLY each round with an eager
    # localCheckpoint, not persist(): a cached round-N frame still
    # carries the full round-0..N logical plan, and on graphs needing
    # more than ~3 rounds the CacheManager stopped serving intermediate
    # rounds from cache — every round re-executed the whole history
    # (measured: 1.5 s -> 266 s per round by round 6 on a 920-edge
    # graph; flat 0.5 s/round after the change). localCheckpoint
    # materializes the round's rows as executor blocks and REPLACES the
    # plan, so round cost is O(edges) regardless of round number. The
    # blocks are not fault-replayable (an executor loss aborts the
    # job) — the standard iterative-graph trade, same as GraphFrames'
    # checkpointing, acceptable for a loop whose state is the tiny
    # label frame; use reliable checkpoints if that ever matters.
    p0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    # Materialize the (small) bidirectional edge list once; every round
    # joins against it.
    e = (
        p0.union(p0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if algorithm == "star":
        return _star_components(e, max_iter)
    hashmin_rounds = min(5, max_iter) if algorithm == "auto" else max_iter
    prev = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(hashmin_rounds):
        # neighbor minimum: for each v, min over u-neighbors' labels
        nbr_min = (
            e.join(prev.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            prev.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
                (F.coalesce("nbr_component", "component") < F.col("component"))
                .alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = (
            new_labels.agg(F.sum(F.col("__changed").cast("long")).alias("n"))
            .collect()[0]["n"]
        )
        # the new round is materialized (eager checkpoint + the scalar
        # collect above) — release the previous round's blocks now so
        # executor storage stays bounded at two label-frame copies
        _release_checkpoint(prev)
        prev = new_labels
        if not n_changed:
            return new_labels.drop("__changed")
    if algorithm == "auto":
        # diameter exceeded the hash-min budget (chain-shaped graph) —
        # restart on the star algorithm, whose round count is
        # O(log² n) regardless of diameter
        _release_checkpoint(prev)
        return _star_components(e, max_iter)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(diameter too large — use algorithm='star')"
    )


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Near-dup pair list → actionable dedup assignment: one row per
    document that appears in any pair, with its ``cluster_id`` (min doc
    id in the component) and ``is_keeper`` (the canonical survivor —
    everything else in the cluster is the delete set). Documents in no
    pair are implicitly their own keepers and are not emitted."""
    comp = connected_components(pairs, src=src, dst=dst)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )
