"""Embedding similarity search (SURVEY.md §2.9 X3).

Baseline: brute-force cosine top-k — broadcast the (small) query set,
compute dot products with built-in higher-order array functions
(zip_with + aggregate, JVM-side, no Python), rank per query.

Scale path (100 TB of vectors): brute force against a handful of query
vectors is already a single broadcast-join map-only pass (no shuffle) —
it scales linearly and is exactly what a 1000-executor cluster wants.
For query sets too large to broadcast-pair, `lsh_ann` buckets vectors by
random hyperplane signs so candidate generation is an equi-join on
bucket id instead of a cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import pin as _pin


def dot(a: Column, b: Column) -> Column:
    """Dot product over array<float|double> with double accumulation,
    index order (matches DuckDB's list_dot_product fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def with_unit(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """Add a unit-normalized double copy of ``vec_col``.

    Normalizing each side ONCE turns every cosine into a single dot
    product — higher-order-function evaluation is the per-pair cost, so
    pre-normalization cuts scoring ~3x (dot + two norms → one dot)
    wherever a vector is compared against many. The norm lives in a
    sibling column during the transform so it is computed once per row,
    not once per element."""
    return (
        df.withColumn("__vnorm", norm(F.col(vec_col)))
        .withColumn(
            out_col,
            F.transform(vec_col, lambda x: x.cast("double") / F.col("__vnorm")),
        )
        .drop("__vnorm")
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector the k nearest
    non-self vectors. Rounds cosine before ranking so rank ties resolve
    identically across engines (cross-engine float drift ~1e-15 ≪ the
    5e-7 rounding quantum)."""
    from pyspark.sql import Window

    q = with_unit(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q")),
        "__q",
        "__qv",
    ).select("query_id", "__qv")
    # pinned: materializes the normalized corpus once — otherwise
    # CollapseProject inlines the normalization into the scoring
    # expression and the norm is recomputed per scored pair
    c = _pin(
        with_unit(
            vectors.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__c")
            ),
            "__c",
            "__cv",
        ).select("neighbor_id", "__cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(dot(F.col("__qv"), F.col("__cv")), round_to))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """All vector pairs (id_a < id_b) with cosine >= threshold —
    embedding near-dup detection. Brute force O(n²) pairs; at scale the
    LSH bucketing below replaces the cross product."""
    u = _pin(with_unit(vectors.select(F.col(id_col), F.col(vec_col)), vec_col, "__u"))
    a = u.select(F.col(id_col).alias("id_a"), F.col("__u").alias("__va"))
    b = u.select(F.col(id_col).alias("id_b"), F.col("__u").alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(dot(F.col("__va"), F.col("__vb")), round_to))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    every vector to its nearest of ``n_cells`` centroids; each query
    probes only its ``n_probe`` nearest cells, scoring exact cosine
    within them.

    The coarse centroids here are deterministic MEDOIDS — the first
    ``n_cells`` vectors by id — rather than trained k-means: the plan is
    reproducible from code alone and needs no ML-pipeline dependency;
    swapping in trained centroids only changes the tiny centroid table.

    Scale: the centroid table is n_cells rows → broadcast to both
    assignment passes (map-only). The probe join is an equi-join on
    cell id, so scored candidates are ~(n_probe/n_cells) of the corpus
    per query — the standard IVF cost model; recall is tested against
    the brute-force baseline.
    """
    uvec = _pin(
        with_unit(vectors.select(F.col(id_col), F.col(vec_col)), vec_col, "__uv")
    )
    cent = (
        uvec.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cell"), F.col("__uv").alias("__cent"))
    )
    return _ivf_search(uvec, queries, cent, k, n_probe, id_col, vec_col, round_to)


def ivf_topk_kmeans(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """IVF with TRAINED coarse centroids (pyspark.ml KMeans, fixed seed)
    — the production quantizer: balanced cells mean the probed fraction
    is predictable, so recall per unit of scored work beats medoids on
    clustered data. Training cost is one pass over a sample; the search
    path is identical to `ivf_topk`."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    spark = vectors.sparkSession
    cent_raw = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        f"cell long, {vec_col} array<double>",
    )
    cent = with_unit(cent_raw, vec_col, "__cent").select("cell", "__cent")
    uvec = _pin(
        with_unit(vectors.select(F.col(id_col), F.col(vec_col)), vec_col, "__uv")
    )
    return _ivf_search(uvec, queries, cent, k, n_probe, id_col, vec_col, round_to)


def _ivf_search(
    uvec: DataFrame,
    queries: DataFrame,
    cent: DataFrame,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
    round_to: int,
) -> DataFrame:
    """Shared IVF search: assign corpus to cells, probe nearest cells
    per query, exact cosine inside probed cells. ``uvec`` carries
    ``__uv`` (unit vectors); ``cent`` carries (cell, __cent unit)."""
    from pyspark.sql import Window

    # assignment: argmax dot over broadcast unit centroids
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("cell")
    )
    assigned = (
        uvec.join(F.broadcast(cent))
        .withColumn("__sim", dot(F.col("__uv"), F.col("__cent")))
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("__uv"), "cell")
    )
    # probe list: n_probe nearest cells per query
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("cell")
    )
    probes = (
        with_unit(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
            vec_col,
            "__qv",
        )
        .select("query_id", "__qv")
        .join(F.broadcast(cent))
        .withColumn("__sim", dot(F.col("__qv"), F.col("__cent")))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "cell")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cos_sim", F.round(dot(F.col("__qv"), F.col("__uv")), round_to))
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos_sim")
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
    )


def label_centroids(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_to: int = 9,
) -> DataFrame:
    """Per-label centroid in LONG form: (label, pos, centroid_val, n) —
    the class-prototype / cluster-center computation. posexplode + one
    hash-agg on (label, pos): the shuffle carries (label, pos, partial
    sum) — map-side combined, never whole vectors."""
    e = vectors.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    return (
        e.groupBy(label_col, "pos")
        .agg(
            F.round(
                F.sum(F.col("x").cast("double")) / F.count(F.lit(1)), round_to
            ).alias("centroid_val"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("pos", (F.col("pos") + 1).cast("long"))  # 1-based like SQL
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (LCG — no numpy
    RNG so the plan is reproducible from code alone)."""
    state = seed & 0x7FFFFFFF
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append(state / 0x40000000 - 1.0)  # roughly uniform [-1, 1)
        planes.append(row)
    return planes


def lsh_ann(
    vectors: DataFrame,
    threshold: float = 0.3,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Sign-random-projection LSH: candidate pairs share at least one
    band of hyperplane signs; exact cosine verifies candidates.

    Scale: candidate generation is explode(bands) + equi-join on
    (band, signature) — a hash shuffle on bucket keys, never a cross
    product. Bucket skew is bounded by band width (n_planes/bands bits).
    """
    planes = random_hyperplanes(dim, n_planes)
    sig_bits = [
        (dot(F.col(vec_col), F.array(*[F.lit(v) for v in p])) > 0).cast("int")
        for p in planes
    ]
    per_band = n_planes // bands
    band_cols = [
        F.concat_ws(
            "",
            *[sig_bits[b * per_band + i].cast("string") for i in range(per_band)],
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    sigs = vectors.select(F.col(id_col), F.col(vec_col), *band_cols)
    exploded = sigs.select(
        id_col,
        vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("sig"))
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, vec_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))

    a = exploded.select(
        F.col("band"), F.col("sig"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = exploded.select(
        F.col("band"), F.col("sig"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    cand = (
        a.join(b, on=["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__va", "__vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cos_sim", F.round(cosine(F.col("__va"), F.col("__vb")), round_to))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
