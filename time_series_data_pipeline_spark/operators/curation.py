"""Corpus-curation operators: hashed-n-gram importance weighting
(DSIR), exact-substring duplicate spans (detect + apply), rank fusion
for hybrid retrieval, training-mixture planning, and corpus-
distribution drift monitoring.

These extend the reference's query surface (it stops at dashboard
aggregations — README.md:200-236) with the selection/cleaning steps a
large-scale training-data pipeline runs between ingestion and training:

* ``dsir_logweights`` — Data Selection via Importance Resampling
  (Xie et al. 2023, NeurIPS): score every raw document by the
  log-likelihood ratio of a hashed-n-gram bag model fit on a target
  subcorpus vs the raw corpus. Documents that "sound like" the target
  get high weights; sampling proportional to exp(weight) yields a
  target-like mixture from raw data.
* ``duplicate_spans`` — exact substring duplication across documents
  (the k-gram/suffix-automaton family of Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better"): find
  maximal runs of ≥ ``min_tokens`` consecutive shared tokens between
  document pairs via a positional k-gram inverted index + diagonal
  run-length merge — the span-level complement of document-level
  near-dedup (boilerplate, quoted passages, licence blocks).
* ``rrf_fuse`` — Reciprocal Rank Fusion (Cormack et al. 2009) of two
  ranked retrieval lists (e.g. BM25 lexical + embedding cosine), the
  standard zero-tuning hybrid-search combiner.

Scale shapes (100 TB contract):

* DSIR: one scan explodes n-grams (linear), two map-side-combined
  aggregates — the model frame is bounded by ``n_buckets`` (that is the
  point of feature hashing: the model NEVER grows with the corpus) and
  broadcast back; per-doc scoring is one more map-side-combined agg.
  No driver collect anywhere.
* duplicate_spans: postings are (doc, pos, 8-byte-prefix hash) — the
  inverted-index join shuffles hashes, never text. The document-
  frequency cap (``max_df``) bounds every posting list, so the
  pair-expansion is ≤ C(max_df,2) per gram — the same frequency-cap
  trick PPJoin/decontamination use to stay near-linear; dropped
  stop-grams are the grams that cannot witness a *rare* duplicated
  span anyway. The diagonal merge is a window over (pair, diagonal)
  groups — keys are two ids + a small int, no skew.
* rrf_fuse: inputs are already top-k frames (k rows); the fusion is a
  k-row outer join — driver-free and constant-size regardless of
  corpus scale.

Determinism (driver value-hash gate): DSIR per-bucket log-ratios are
``ln`` of ratios of exact integers, rounded to 6 dp (libm cross-engine
drift ~1e-15 ≪ 5e-7 quantum) and cast to DECIMAL(18,6); the per-doc
sum Σ c_b·L_b is then exact decimal arithmetic — associative, so
partition order cannot change the hash. Span detection and RRF are
exact integer/rank arithmetic end to end (RRF's 1/(k+r) terms are
correctly-rounded doubles of identical integer inputs, summed in a
fixed 2-term order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import text as tx
from ._util import pin as _pin


def _gram_bucket(gram: Column, n_buckets: int, salt: str) -> Column:
    """Stable bucket in [0, n_buckets) from the gram's salted md5 —
    the hashing-trick feature map, replayable on any engine (same
    construction as sampling.hash_bucket)."""
    h = F.md5(F.concat(gram, F.lit(salt)).cast("binary"))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % n_buckets


def dsir_logweights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document DSIR importance log-weight under hashed-bigram bag
    models with add-one smoothing.

    ``target`` is a boolean Column marking the target subcorpus (e.g.
    ``F.col("lang") == "en"`` — "select raw docs that look like clean
    English"). For each hash bucket b the model stores occurrence
    counts n_tgt[b] / n_raw[b]; a document's weight is

        log w(x) = Σ_b c_b(x) · [ ln((n_tgt[b]+1)/(N_tgt+B))
                                − ln((n_raw[b]+1)/(N_raw+B)) ]

    Documents shorter than 2 tokens have no bigrams and drop out.
    Returns (doc_id, n_grams, dsir_logw).

    ``tokens_col`` reuses a pre-materialized token array (the
    with_token_stats convention); ``target`` is still evaluated against
    ``docs``, so it may reference any of its columns.
    """
    # materialize the token array before the gram build: ngrams() would
    # re-derive the interpreted token split 3x per row if inlined. (No
    # spread_small_scan here: A/B on the bench corpus showed the
    # round-robin exchange of the raw text costs more than the saved
    # single-task CPU for this gram pass — 0.88 s → 1.15 s.)
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        target.alias("is_t"),
        (tx.tokens(text_col) if tokens_col is None else F.col(tokens_col)).alias(
            "__t"
        ),
    )
    # pinned: the exploded gram frame feeds the model aggregate AND the
    # per-doc counts — without the pin the corpus is tokenized twice
    occ = _pin(
        toked.select(
            "doc_id",
            "is_t",
            F.explode(tx.ngrams(F.col("__t"), 2)).alias("g"),
        ).select(
            "doc_id", "is_t", _gram_bucket(F.col("g"), n_buckets, salt).alias("b")
        )
    )
    model = occ.groupBy("b").agg(
        F.count("*").alias("n_raw"),
        F.sum(F.col("is_t").cast("long")).alias("n_tgt"),
    )
    tot = model.agg(F.sum("n_raw").alias("nr"), F.sum("n_tgt").alias("nt"))
    # ≤ n_buckets rows regardless of corpus size — broadcastable by
    # construction; the 1-row totals ride along the same broadcast
    lm = model.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                (F.col("n_tgt").cast("double") + F.lit(1.0))
                / (F.col("nt").cast("double") + F.lit(float(n_buckets)))
            )
            - F.log(
                (F.col("n_raw").cast("double") + F.lit(1.0))
                / (F.col("nr").cast("double") + F.lit(float(n_buckets)))
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("l"),
    )
    per_doc = occ.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    return (
        per_doc.join(F.broadcast(lm), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            # exact decimal Σ c·L — associative, partition-order-proof
            F.sum(F.col("c") * F.col("l")).cast("double").alias("dsir_logw"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 6,
    min_tokens: int = 8,
    max_df: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal exact-duplicate token spans between document pairs.

    Build a positional k-gram inverted index (16-hex-char md5 prefix
    keys — the contamination-join convention), drop grams seen in fewer
    than 2 or more than ``max_df`` distinct documents, join postings
    pairwise, and merge consecutive matches along each (pair, diagonal)
    into maximal runs: a run of r consecutive matching k-grams is a
    shared substring of r+k−1 tokens. Spans shorter than ``min_tokens``
    are dropped.

    Returns (id_a, id_b, a_start, b_start, n_tokens) with id_a < id_b
    and 0-based token offsets.
    """
    # materialize tokens first: the k-gram build re-derives the
    # interpreted token split k+1 times per row when inlined (no spread
    # — see dsir_logweights for the A/B)
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tx.tokens(text_col).alias("__t")
    )
    post = _pin(
        toked.select(
            "doc_id",
            F.posexplode(tx.ngrams(F.col("__t"), k)).alias("pos", "g"),
        ).select(
            "doc_id",
            "pos",
            F.substring(F.md5(F.col("g").cast("binary")), 1, 16).alias("gh"),
        )
    )
    # frequency cap: grams in <2 docs cannot match; grams in >max_df
    # docs are boilerplate stop-grams whose postings would expand
    # quadratically — the standard bound that keeps the join linear
    keep = post.groupBy("gh").agg(
        F.countDistinct("doc_id").alias("ndocs")
    ).filter((F.col("ndocs") >= 2) & (F.col("ndocs") <= max_df)).select("gh")
    p = post.join(keep, "gh")
    a, b = p.alias("a"), p.alias("b")
    matches = a.join(b, "gh").filter(F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.pos").alias("i"),
        (F.col("b.pos") - F.col("a.pos")).alias("diag"),
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("i")
    # gaps-and-islands: consecutive i on one diagonal share i - row_number()
    runs = matches.withColumn("grp", F.col("i") - F.row_number().over(w))
    return (
        runs.groupBy("id_a", "id_b", "diag", "grp")
        .agg(F.min("i").alias("a_start"), (F.max("i") - F.min("i") + k).alias("n_tokens"))
        .filter(F.col("n_tokens") >= min_tokens)
        .select(
            "id_a",
            "id_b",
            "a_start",
            (F.col("a_start") + F.col("diag")).alias("b_start"),
            "n_tokens",
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply step for ``duplicate_spans``: cut each detected span from
    the LATER document of its pair (id_b — first occurrence wins, the
    Lee et al. 2022 retention rule), keeping earlier documents intact.
    Overlapping spans from different partners union naturally.

    Returns one row per document — untouched docs included —
    (doc_id, n_tokens_before, n_tokens_after, cleaned_hash) where
    cleaned_hash is the md5 of the space-joined surviving tokens: the
    digest form ships 16 bytes per doc instead of rewritten text (the
    doc_chunks convention), and equality against the pre-image is what
    the oracle replays.

    Scale shape: span lists aggregate per victim doc (bounded by that
    doc's match count), broadcast-join back onto the corpus scan when
    small / hash-join otherwise, and the cut itself is an in-row
    indexed filter — no token rows ever shuffle.
    """
    cuts = spans.groupBy(F.col("id_b").alias(id_col)).agg(
        F.collect_list(F.struct("b_start", "n_tokens")).alias("__cuts")
    )
    tok = tx.tokens(text_col)
    base = docs.select(F.col(id_col), tok.alias("__t")).join(
        cuts, id_col, "left"
    )

    def _kept(t: Column, i: Column) -> Column:
        # i is 0-based; drop when any span [b_start, b_start+n) covers it
        return ~F.coalesce(
            F.exists(
                "__cuts",
                lambda s: (i >= s["b_start"]) & (i < s["b_start"] + s["n_tokens"]),
            ),
            F.lit(False),
        )

    kept = F.filter("__t", _kept)
    return base.select(
        id_col,
        F.size("__t").cast("long").alias("n_tokens_before"),
        F.size(kept).cast("long").alias("n_tokens_after"),
        F.md5(F.concat_ws(" ", kept).cast("binary")).alias("cleaned_hash"),
    )


def distribution_drift(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    salt: str = "dsir",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-distribution drift between the ``target`` subcorpus and
    the rest, over hashed-bigram buckets with add-one smoothing: both
    KL divergences (nats) and total-variation distance — the corpus
    monitoring statistic a pipeline tracks across snapshot versions
    ("did this crawl / this curation pass shift the token
    distribution, and how far?").

    Exact-arithmetic construction (hash-verifiable like DSIR): with
    p_b=(c_pb+1)/(N_p+B), KL(p‖q)·(N_p+B) = Σ_b (c_pb+1)·L_b where
    L_b is a log of exact-integer ratios, rounded to 6 dp and summed
    as DECIMAL — associative, partition-order-proof; the TVD numerator
    is a pure-integer sum (DECIMAL(18,0) products — exact to 1e18
    occurrences per side). Buckets with no mass on either side enter
    through a closed-form correction, so the statistic is over the
    full B-bucket simplex, not just occupied buckets.

    Returns one row: (n_buckets_hit, kl_target_rest, kl_rest_target,
    tvd). Scale shape: one exploded scan → one B-bounded aggregate →
    arithmetic on a 1-row frame.
    """
    Bf = float(n_buckets)
    # materialize tokens once (see dsir_logweights — same shape)
    occ = (
        docs
        .select(target.alias("is_t"), tx.tokens(text_col).alias("__t"))
        .select("is_t", F.explode(tx.ngrams(F.col("__t"), 2)).alias("g"))
        .select("is_t", _gram_bucket(F.col("g"), n_buckets, salt).alias("b"))
    )
    # NOT pinned: the model aggregate feeds both the totals and the
    # term sums, but Catalyst's ReusedExchange already shares the one
    # physical aggregate between them (verified: pinning changes
    # nothing at 50k docs) — the wall cost is the single md5 pass over
    # the exploded grams, linear in corpus size
    model = occ.groupBy("b").agg(
        F.sum(F.col("is_t").cast("long")).alias("cp"),
        F.sum((~F.col("is_t")).cast("long")).alias("cq"),
    )
    tot = model.agg(
        F.sum("cp").alias("np"),
        F.sum("cq").alias("nq"),
        F.count("*").alias("hits"),
    )
    m = model.crossJoin(F.broadcast(tot))
    dp = F.col("np").cast("double") + F.lit(Bf)
    dq = F.col("nq").cast("double") + F.lit(Bf)

    def _l(ca: Column, cb: Column, na: Column, nb: Column) -> Column:
        return F.round(
            F.log((ca.cast("double") + F.lit(1.0)) / (cb.cast("double") + F.lit(1.0)))
            + F.log(nb / na),
            6,
        ).cast("decimal(18,6)")

    d18 = "decimal(18,0)"
    terms = m.agg(
        F.sum((F.col("cp") + 1) * _l(F.col("cp"), F.col("cq"), dp, dq)).alias("s_pq"),
        F.sum((F.col("cq") + 1) * _l(F.col("cq"), F.col("cp"), dq, dp)).alias("s_qp"),
        F.sum(
            F.abs(
                (F.col("cp") + 1).cast(d18) * (F.col("nq") + n_buckets).cast(d18)
                - (F.col("cq") + 1).cast(d18) * (F.col("np") + n_buckets).cast(d18)
            )
        ).alias("s_tvd"),
        F.first("np").alias("np"),
        F.first("nq").alias("nq"),
        F.first("hits").alias("hits"),
    )
    dp2 = F.col("np").cast("double") + F.lit(Bf)
    dq2 = F.col("nq").cast("double") + F.lit(Bf)
    empty = (F.lit(n_buckets) - F.col("hits")).cast(d18)
    l_empty_pq = F.round(F.log(dq2 / dp2), 6).cast("decimal(18,6)")
    l_empty_qp = F.round(F.log(dp2 / dq2), 6).cast("decimal(18,6)")
    return terms.select(
        F.col("hits").alias("n_buckets_hit"),
        ((F.col("s_pq") + empty * l_empty_pq).cast("double") / dp2).alias(
            "kl_target_rest"
        ),
        ((F.col("s_qp") + empty * l_empty_qp).cast("double") / dq2).alias(
            "kl_rest_target"
        ),
        (
            F.lit(0.5)
            * (
                F.col("s_tvd")
                + empty * F.abs(F.col("nq").cast(d18) - F.col("np").cast(d18))
            ).cast("double")
            / (dp2 * dq2)
        ).alias("tvd"),
    )


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    group_col: str = "lang",
    text_col: str = "text",
    round_to: int = 9,
) -> DataFrame:
    """Training-mixture feasibility plan (the Pile/Dolma-style mixing
    step downstream of curation): given target mixture ``weights`` per
    group, find the largest total token budget B the corpus can serve
    without oversampling any group (B = min_g tokens_g / w_g), and the
    per-group deterministic sampling rate that realizes it.

    Returns (group, n_docs, n_tokens, weight, sample_rate,
    expected_tokens); corpus groups absent from ``weights`` are
    excluded from the mixture. Feed ``sample_rate`` to
    ``sampling.deterministic_sample`` per group to materialize the mix.

    Every key in ``weights`` must exist in the corpus with tokens: a
    weighted group with no (or zero-token) docs means the TRUE maximal
    budget serving the full mixture is 0, so silently min-ing over the
    present groups would overstate the servable budget (and a
    zero-token present group would divide 0/0 into a NaN sample_rate)
    — the plan raises at execution instead (ADVICE r5). The check is
    in-plan (a when/raise_error over the 1-row budget aggregate), so
    the operator stays lazy and adds no extra job.

    Scale shape: one map-side-combined aggregate over the corpus (the
    token count is an in-row size()), then all arithmetic happens on
    the |groups|-row frame with a broadcast 1-row budget — nothing
    after the first agg depends on corpus size.
    """
    if not weights:
        raise ValueError("mixture_plan: weights must be non-empty")
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    agg = (
        docs.select(F.col(group_col).alias("grp"), tx.tokens(text_col).alias("__t"))
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("__t")).cast("long").alias("n_tokens"),
        )
        .withColumn("weight", wmap[F.col("grp")])
        .filter(F.col("weight").isNotNull())
    )
    budget = agg.agg(
        F.count(F.lit(1)).alias("__ng"),
        F.min("n_tokens").alias("__min_t"),
        F.min(F.col("n_tokens").cast("double") / F.col("weight")).alias("__b0"),
    ).select(
        F.when(
            F.col("__ng") < len(weights),
            F.raise_error(
                F.lit(
                    "mixture_plan: weighted group(s) absent from the corpus "
                    f"(matched __ng of {len(weights)} weights; the maximal "
                    "budget serving the full mixture is 0)"
                )
            ),
        )
        .when(
            F.col("__min_t") <= 0,
            F.raise_error(
                F.lit(
                    "mixture_plan: a weighted group has zero tokens — its "
                    "sample_rate would be 0/0"
                )
            ),
        )
        .otherwise(F.col("__b0"))
        .alias("__b")
    )
    out = agg.crossJoin(F.broadcast(budget))
    return out.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_tokens",
        "weight",
        F.round(
            F.least(
                F.col("__b") * F.col("weight") / F.col("n_tokens").cast("double"),
                F.lit(1.0),
            ),
            round_to,
        ).alias("sample_rate"),
        F.round(F.col("__b") * F.col("weight"), 6).alias("expected_tokens"),
    )


def rrf_fuse(
    lex: DataFrame,
    dense: DataFrame,
    k: int = 10,
    k_rrf: int = 60,
    round_to: int = 9,
) -> DataFrame:
    """Reciprocal Rank Fusion of two ranked lists.

    ``lex`` and ``dense`` each carry (doc_id, rank); a document absent
    from a list contributes 0 for it. rrf = Σ 1/(k_rrf + rank), the
    parameter-free hybrid-search combiner (Cormack et al. 2009; k=60
    is the canonical constant). Returns (doc_id, rrf_score, rank).

    CONTRACT (ADVICE r15): each input list must hold at most ONE row
    per doc_id — true by construction for row_number ranks, which both
    callers produce. A duplicated doc_id would be collapsed to its best
    rank by the min() below instead of multiplying rows the way the
    FULL OUTER join this aggregate replaces would.
    """
    # union + one aggregate instead of a FULL OUTER join: a full-outer
    # cannot broadcast, so the join planned as a SortMergeJoin with two
    # sort exchanges over the k-row inputs; each doc appears at most
    # once per list (row_number ranks), so min() per side under a
    # groupBy is exactly the outer join's row — one tiny exchange,
    # identical rrf arithmetic (guide §2.4: remove shuffles outright)
    fused = (
        lex.select(
            "doc_id",
            F.col("rank").cast("long").alias("r_lex"),
            F.lit(None).cast("long").alias("r_dense"),
        )
        .unionByName(
            dense.select(
                "doc_id",
                F.lit(None).cast("long").alias("r_lex"),
                F.col("rank").cast("long").alias("r_dense"),
            )
        )
        .groupBy("doc_id")
        .agg(
            F.min("r_lex").alias("r_lex"),
            F.min("r_dense").alias("r_dense"),
        )
        .select(
            "doc_id",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("r_lex").cast("double")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0)
                    / (F.lit(float(k_rrf)) + F.col("r_dense").cast("double")),
                    F.lit(0.0),
                ),
                round_to,
            ).alias("rrf_score"),
        )
    )
    out = fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    # rank window runs over k fused rows, not the corpus
    return out.withColumn("rank", F.row_number().over(w).cast("long"))
