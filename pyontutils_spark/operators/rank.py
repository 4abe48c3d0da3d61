"""BM25 document ranking over the engine's token model.

The lexical-search complement to the embedding ANN family
(:mod:`.simsearch`): score documents against a bag-of-terms query with
BM25 (Robertson/Sparck-Jones probabilistic relevance framework — the
public standard, e.g. Robertson & Zaragoza 2009).

Shuffle discipline at 100 TB: the per-(doc, term) term-frequency
aggregation filters the exploded token stream to QUERY TERMS ONLY
before any shuffle (an `isin` over a handful of literals, pushed into
the scan projection), so the heavy explode never leaves the map side
for non-query tokens.  Document length and corpus stats are one cheap
aggregate each; the final score is a pure column expression.

Scores are emitted as integer micro-units rounded PER (doc, term)
before summing, so a DuckDB oracle can reproduce them bit-for-bit
(sums of doubles differ across engines; sums of rounded bigints do
not).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col

__all__ = ["bm25_rank"]


def bm25_rank(docs: DataFrame, query_terms: list, id_col: str = "doc_id",
              text_col: str = "text", k1: float = 1.2, b: float = 0.75,
              top_k: int | None = None) -> DataFrame:
    """(id, score_e6) BM25 scores for every doc matching >= 1 term.

    ``query_terms`` are normalized through the engine's token model
    (lowercase alnum); idf uses the standard
    ``ln((N - df + 0.5) / (df + 0.5) + 1)`` form (always positive).
    Per-term contributions are rounded to micro-units before the final
    sum — the cross-engine determinism contract.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t for q in query_terms
                    for t in _normalize_term(q) if t})
    if not terms:
        raise ValueError("query_terms normalize to nothing")

    toks = docs.select(F.col(id_col),
                       F.explode(tokens_col(F.col(text_col)))
                       .alias("term"))
    # doc lengths + corpus stats from per-doc rows, not the exploded
    # stream: size() is a per-row column expression
    lens = docs.select(F.col(id_col),
                       F.size(tokens_col(F.col(text_col))).alias("dl"))
    stats = lens.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = stats["n_docs"], float(stats["avgdl"] or 1.0)

    tf = (toks.filter(F.col("term").isin(terms))
          .groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf"))
          .join(lens, id_col))
    dfreq = (tf.groupBy("term")
             .agg(F.countDistinct(id_col).alias("df"))
             .collect())
    idf = {r["term"]: math.log((n_docs - r["df"] + 0.5)
                               / (r["df"] + 0.5) + 1.0) for r in dfreq}
    idf_map = F.create_map(
        *[x for t in terms if t in idf
          for x in (F.lit(t), F.lit(idf[t]))])
    contrib = (F.element_at(idf_map, F.col("term"))
               * (F.col("tf") * (k1 + 1))
               / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                      / F.lit(avgdl))))
    scored = (tf.withColumn("c_e6",
                            F.round(contrib * 1_000_000).cast("long"))
              .groupBy(id_col)
              .agg(F.sum("c_e6").cast("long").alias("score_e6")))
    out = scored.orderBy(F.col("score_e6").desc(), F.col(id_col).asc())
    return out.limit(top_k) if top_k else out


def _normalize_term(q: str) -> list:
    import re
    return [t for t in re.sub(r"[^a-z0-9]+", " ", q.lower()).split()
            if t]
