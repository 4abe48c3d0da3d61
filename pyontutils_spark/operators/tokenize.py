"""Distributed BPE tokenization: histogram training + Arrow-batched apply.

Spark wiring around :mod:`..kernel.bpe` (pure-Python BPE core):

- :func:`word_counts` — the corpus -> (word, count) reduction.  Pure
  codegen (split/explode/groupBy with map-side partial aggregation);
  this is the ONLY stage that touches every byte of text, and it never
  ships text to Python.
- :func:`train_bpe` — collects the *histogram* (not the corpus) to the
  driver and runs the deterministic merge loop.  The collect is bounded
  by ``min_count`` + ``max_words`` (top-N by count, word-lexicographic
  tie-break) — the standard truncation every production BPE trainer
  applies; the cap is surfaced in ``TrainedBPE.truncated`` rather than
  silently dropped.
- :func:`bpe_encode` — encode documents to token-id arrays with ONE
  Arrow-batched pandas UDF; the model ships to executors as a
  JSON-serialized closure (merge list — broadcast-sized, ~100 KB for a
  32k vocab) and a per-executor word cache makes repeated words O(1).

100 TB notes: training reads the corpus once, reduced map-side to a
distinct-word histogram (Heaps' law keeps that far below corpus size);
the driver-side merge loop sees at most ``max_words`` rows.  Encoding is
embarrassingly parallel per document — no shuffle at all.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType

from ..kernel.bpe import BPETokenizer, train_bpe_from_counts

__all__ = ["word_counts", "train_bpe", "bpe_encode",
           "bpe_token_count_col", "TrainedBPE"]


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) histogram over whitespace-run words.

    Matches the kernel's ``\\S+`` pre-tokenizer exactly: split on
    whitespace runs, drop empty fragments (leading-whitespace artifact
    of ``split``).  Codegen end to end; partial aggregation makes the
    shuffle carry distinct words per partition, not corpus tokens.
    """
    # (?U) = Java UNICODE_CHARACTER_CLASS: \s then covers NBSP/U+3000
    # etc., matching Python's \S+ pre-tokenizer in kernel/bpe.py (a
    # plain Java \s is ASCII-only, so non-ASCII whitespace would leak
    # into histogram "words" that encode() never segments)
    w = F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                          r"(?U)\s+")).alias("word")
    return (docs.select(w)
            .filter(F.length("word") > 0)
            .groupBy("word").agg(F.count(F.lit(1)).alias("count")))


@dataclass
class TrainedBPE:
    tokenizer: BPETokenizer
    n_distinct_words: int      # before truncation
    n_words_used: int          # after min_count/max_words truncation
    truncated: bool


def train_bpe(docs: DataFrame, text_col: str = "text",
              n_merges: int = 1000, min_count: int = 2,
              max_words: int = 1_000_000) -> TrainedBPE:
    """Train a BPE model on a document corpus.

    The corpus is reduced to a word histogram on the executors; only
    words with ``count >= min_count``, capped at the ``max_words`` most
    frequent (ties broken word-ASC for determinism), reach the driver.
    ``TrainedBPE.truncated`` says whether the cap actually bit — no
    silent coverage loss.
    """
    # persist the (small) histogram so the corpus is scanned ONCE for
    # both the distinct-word count and the truncated collect — without
    # it the full text pass runs twice (guide: remove repeated passes)
    hist = word_counts(docs, text_col).persist()
    try:
        n_distinct = hist.count()
        kept = hist.filter(F.col("count") >= min_count)
        if kept.count() > max_words:
            # global top-N sort only when the cap actually bites; the
            # merge loop is deterministic under histogram order
            # (tested), so an unsorted collect is equivalent when
            # nothing is dropped — and the count probe is a narrow
            # job over the persisted histogram
            top = (kept.orderBy(F.col("count").desc(),
                                F.col("word").asc())
                   .limit(max_words).collect())
        else:
            top = kept.collect()
    finally:
        hist.unpersist()
    counts = {r["word"]: r["count"] for r in top}
    tok = train_bpe_from_counts(counts, n_merges=n_merges)
    return TrainedBPE(tokenizer=tok,
                      n_distinct_words=n_distinct,
                      n_words_used=len(counts),
                      truncated=len(counts) == max_words
                      and n_distinct > max_words)


def _encode_udf(model_json: str):
    """Build the Arrow-batched encoder column function.

    The tokenizer is rebuilt once per executor from the JSON payload
    (closure-shipped; lazily cached in the UDF's cell) — never per row,
    never per batch.
    """
    state: dict = {}

    def encode_series(texts: pd.Series) -> pd.Series:
        tok = state.get("tok")
        if tok is None:
            tok = BPETokenizer.from_json(model_json)
            state["tok"] = tok
        return texts.map(lambda t: tok.encode(t) if t else [])

    return F.pandas_udf(encode_series, ArrayType(IntegerType()))


def bpe_encode(docs: DataFrame, tokenizer: BPETokenizer,
               text_col: str = "text",
               out_col: str = "token_ids") -> DataFrame:
    """Add ``out_col`` (array<int> BPE ids) and ``n_bpe_tokens``.

    One pandas-UDF stage, no shuffle; ``n_bpe_tokens`` is derived with
    codegen ``size()`` from the already-computed array.
    """
    enc = _encode_udf(tokenizer.to_json())
    return (docs.withColumn(out_col, enc(F.col(text_col)))
            .withColumn("n_bpe_tokens", F.size(F.col(out_col))))


def bpe_token_count_col(tokenizer: BPETokenizer, text_col) -> Column:
    """Standalone BPE token-count column (for quality funnels that only
    need the count, not the ids)."""
    enc = _encode_udf(tokenizer.to_json())
    return F.size(enc(text_col))
