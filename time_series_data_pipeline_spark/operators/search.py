"""Keyword search scoring (BM25) over the documents corpus.

The reference stack surfaces its data through dashboards and ad-hoc
queries (README.md:200-236); a training-data pipeline additionally needs
lexical retrieval — pick the documents most relevant to a query — both
for corpus curation (topic filtering) and eval-set construction. BM25 is
the standard lexical ranking function (Robertson & Zaragoza 2009, public
domain formulation as used by Lucene).

Scale shape: one scan computes per-document term frequencies IN-ROW
(``size(filter(tokens, t = term))`` — no explode, no shuffle of token
rows), a single tiny aggregate derives the corpus statistics
(N, Σdl, per-term document frequencies), and scoring is a broadcast of
that 1-row stats frame back onto the scan. The only wide operation is
the final global top-k, which Catalyst plans as TakeOrderedAndProject
(per-partition heap + driver merge of k rows per partition). At 100 TB:
map-side work scales linearly, the stats row stays one row, and the
top-k never materializes a global sort.

Determinism (for the DuckDB value-hash oracle): tf/df/dl/N are exact
integers; avgdl and the per-term BM25 contributions are IEEE-double
expressions written in the exact same shape on both engines, summed in
fixed left-associative term order; the final score is rounded to 6 dp
(same policy as the cosine family — cross-engine libm drift ~1e-15 ≪
the 5e-7 rounding quantum) and ties at the k-boundary are broken by
doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import text as tx
from ._util import pin as _pin


def _tf(tok: Column, term: str) -> Column:
    """Exact term frequency via an in-row filter — no token explosion."""
    return F.size(F.filter(tok, lambda t: t == F.lit(term))).cast("long")


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-words query.

    Returns (doc_id, score, rank); documents matching no term are
    dropped before the top-k (score > 0).
    """
    tok = tx.tokens(text_col)
    # pinned: the narrow tf frame (~8B × (terms+2) per doc) feeds both
    # the stats aggregate and the scoring pass — without the pin the
    # corpus is scanned and tokenized twice
    base = _pin(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tok).cast("long").alias("dl"),
            *[_tf(tok, t).alias(f"tf_{i}") for i, t in enumerate(terms)],
        )
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = scored["sum_dl"].cast("double") / scored["n_docs"].cast("double")
    # per-term contribution, written to mirror the oracle SQL exactly:
    # idf = ln(1 + (N - df + 0.5)/(df + 0.5));
    # w   = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    contribs = []
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df_ = F.col(f"df_{i}")
        idf = F.log(
            F.lit(1.0)
            + ((scored["n_docs"] - df_).cast("double") + F.lit(0.5))
            / (df_.cast("double") + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        )
        contribs.append(
            F.when(F.col(f"tf_{i}") == 0, F.lit(0.0)).otherwise(
                idf * (tf * F.lit(k1 + 1.0)) / denom
            )
        )
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c  # fixed left-associative order, same as the oracle
    out = (
        scored.withColumn("score", F.round(score, round_to))
        .filter(F.col("score") > 0)
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    # the rank window runs over k rows post-limit, not the corpus
    return out.withColumn("rank", F.row_number().over(w).cast("long"))


def bm25_oracle_sql(
    terms: list[str],
    toks_expr: str,
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle replaying the exact scoring expression shape."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(__t, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"""(CASE WHEN tf_{i} = 0 THEN 0.0 ELSE
           ln(1.0 + (CAST(n_docs - df_{i} AS DOUBLE) + 0.5)
                    / (CAST(df_{i} AS DOUBLE) + 0.5))
           * (CAST(tf_{i} AS DOUBLE) * {k1 + 1.0})
           / (CAST(tf_{i} AS DOUBLE)
              + {k1} * ({1.0 - b} + {b} * (CAST(dl AS DOUBLE)
                        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
         END)"""
        for i in range(len(terms))
    )
    return f"""
    WITH base AS (
      SELECT doc_id, len(__t) AS dl,
             {tf_cols}
      FROM (SELECT doc_id, {toks_expr} AS __t FROM documents)
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {df_cols} FROM base
    )
    SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
    FROM (
      SELECT doc_id, round({contribs}, 6) AS score
      FROM base, stats
    ) WHERE score > 0
    ORDER BY score DESC, doc_id LIMIT {k}
    """
