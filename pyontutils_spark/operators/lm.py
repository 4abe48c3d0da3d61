"""N-gram language-model perplexity scoring for corpus curation.

The CCNet pipeline (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data" — public paper)
filters web text by language-model perplexity: gibberish, keyword
stuffing and boilerplate score far from prose even when they pass
length/stopword gates.  This module is the Spark-first rendition with
a self-trained model (no external LM download in this sandbox):

- :func:`train_ngram_lm` — interpolated unigram+bigram model with
  add-k smoothing over the engine's deterministic token stream.  The
  corpus reduces to (gram, count) histograms on the executors (two
  codegen explode/groupBy passes with map-side combine — the only
  corpus-wide work); only the top-``max_vocab`` unigrams and the
  bigrams among them reach the driver.
- :func:`perplexity_col` / :func:`score_docs` — per-doc bits-per-token
  cross-entropy in ONE Arrow-batched stage; the model ships to
  executors as a JSON closure (same broadcast pattern as the BPE
  encoder), rebuilt once per executor, no shuffle.

Scores are surfaced in integer milli-bits (bits/token * 1000, rounded)
so downstream oracles never compare floats.

100 TB shape: training shuffles distinct grams (Heaps-bounded), not
tokens; scoring is embarrassingly parallel.  The model is ~MBs for a
100k vocab — broadcast-sized by construction.
"""

from __future__ import annotations

import json
import math

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType

from .dedup import tokens_col

__all__ = ["NGramLM", "train_ngram_lm", "perplexity_col", "score_docs"]

_UNK = "<unk>"


class NGramLM:
    """Interpolated bigram LM: p(t|prev) = lam * p2 + (1-lam) * p1,
    both components add-k smoothed over a closed top-V vocabulary
    (out-of-vocabulary tokens map to ``<unk>``, which is IN the
    vocabulary, so probabilities stay proper)."""

    #: set by train_ngram_lm when a max_bigrams cap actually dropped rows
    bigrams_truncated = False

    def __init__(self, unigrams: dict, bigrams: dict, k: float = 0.5,
                 lam: float = 0.7):
        self.unigrams = dict(unigrams)          # token -> count
        self.bigrams = dict(bigrams)            # "a\x1fb" -> count
        self.k = float(k)
        self.lam = float(lam)
        self.total = sum(self.unigrams.values())
        self.vsize = len(self.unigrams)
        # context totals from the RETAINED bigram rows, so the bigram
        # component normalizes to exactly 1 per context (unigram counts
        # would over-count doc-final tokens and min_count-dropped rows)
        self.ctx: dict = {}
        for g, c in self.bigrams.items():
            a = g.split("\x1f", 1)[0]
            self.ctx[a] = self.ctx.get(a, 0) + c

    def _p1(self, tok: str) -> float:
        c = self.unigrams.get(tok, self.unigrams.get(_UNK, 0))
        return (c + self.k) / (self.total + self.k * self.vsize)

    def logprob_token(self, prev: str | None, tok: str) -> float:
        """log2 p(tok | prev); prev=None for the first token."""
        if tok not in self.unigrams:
            tok = _UNK
        p1 = self._p1(tok)
        if prev is None:
            return math.log2(p1)
        if prev not in self.unigrams:
            prev = _UNK
        ctx = self.ctx.get(prev, 0)
        cbig = self.bigrams.get(prev + "\x1f" + tok, 0)
        p2 = (cbig + self.k) / (ctx + self.k * self.vsize)
        return math.log2(self.lam * p2 + (1.0 - self.lam) * p1)

    def bits_per_token(self, tokens: list) -> float:
        """Cross-entropy in bits/token (0.0 for empty docs)."""
        if not tokens:
            return 0.0
        prev = None
        total = 0.0
        for t in tokens:
            total -= self.logprob_token(prev, t)
            prev = t if t in self.unigrams else _UNK
        return total / len(tokens)

    def bits_e3(self, tokens: list) -> int:
        """Cross-entropy in integer milli-bits/token — the
        cross-engine-exact contract: each token's -log2 p is rounded
        to MICRO-bits first, the micro-bit ints are summed, and the
        average is taken with integer half-up division.  Sums of
        rounded bigints are order-independent, so a SQL oracle
        reproduces this bit-for-bit (sums of raw doubles do not)."""
        if not tokens:
            return 0
        prev = None
        total = 0
        for t in tokens:
            total += round(-self.logprob_token(prev, t) * 1_000_000)
            prev = t if t in self.unigrams else _UNK
        n = len(tokens)
        return (total + n * 500) // (n * 1000)

    def to_json(self) -> str:
        return json.dumps(
            {"unigrams": self.unigrams, "bigrams": self.bigrams,
             "k": self.k, "lam": self.lam}, ensure_ascii=False)

    @classmethod
    def from_json(cls, payload: str) -> "NGramLM":
        d = json.loads(payload)
        return cls(d["unigrams"], d["bigrams"], d["k"], d["lam"])


def _tokens_df(docs: DataFrame, text_col: str):
    return F.explode(tokens_col(F.col(text_col))).alias("tok")


def train_ngram_lm(docs: DataFrame, text_col: str = "text",
                   max_vocab: int = 50_000, min_count: int = 2,
                   k: float = 0.5, lam: float = 0.7,
                   max_bigrams: int | None = None) -> NGramLM:
    """Train the LM on a corpus.  Vocabulary = the ``max_vocab`` most
    frequent tokens with count >= ``min_count`` (count-desc,
    token-asc tie-break — deterministic); everything else folds into
    ``<unk>`` WITH its mass (unigram and bigram counts are re-labeled,
    not dropped, so the model is trained on exactly the corpus
    distribution it will score).

    ``max_bigrams`` bounds the driver-side bigram collect (guide §5:
    the driver should do almost no data work; a 100-TB corpus with a
    50k vocab could push 10^8+ min_count-surviving bigram rows to the
    driver) — keep the most frequent ``max_bigrams`` rows, count-desc /
    (a,b)-asc deterministic tie-break, exactly like ``train_bpe``'s
    ``max_words``.  The cap is surfaced: ``NGramLM.bigrams_truncated``
    is True when it actually bit.  Default ``None`` = unbounded
    (existing behavior; the staged lm_score oracle retrains the exact
    uncapped model in SQL)."""
    toks = docs.select(_tokens_df(docs, text_col))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab_rows = (uni.filter(F.col("c") >= min_count)
                  .orderBy(F.col("c").desc(), F.col("tok").asc())
                  .limit(max_vocab).collect())
    vocab = {r["tok"] for r in vocab_rows}
    unigrams = {r["tok"]: r["c"] for r in vocab_rows}
    # fold OOV unigram mass into <unk>: total corpus tokens minus the
    # in-vocab mass (one cheap count job; counts are not dropped, so
    # the model is trained on the distribution it will score)
    total_all = toks.count()
    unigrams[_UNK] = max(total_all - sum(unigrams.values()), 0) \
        + unigrams.get(_UNK, 0)

    # bigram counts with OOV folded to <unk> BEFORE the groupBy: pairs
    # come from a codegen zip of the token array with itself shifted by
    # one; the relabel is a broadcast membership join (vocab is
    # broadcast-sized by construction)
    sess = docs.sparkSession
    vdf = F.broadcast(sess.createDataFrame(
        [(t,) for t in vocab], "tok string"))
    ts = tokens_col(F.col(text_col))
    pairs = docs.select(F.explode(F.zip_with(
        F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")))).alias("p")) \
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    a_lab = F.when(F.col("av").isNull(), F.lit(_UNK)).otherwise(F.col("a"))
    b_lab = F.when(F.col("bv").isNull(), F.lit(_UNK)).otherwise(F.col("b"))
    labeled = (pairs
               .join(vdf.select(F.col("tok").alias("a"),
                                F.lit(1).alias("av")), "a", "left")
               .join(vdf.select(F.col("tok").alias("b"),
                                F.lit(1).alias("bv")), "b", "left")
               .select(a_lab.alias("ga"), b_lab.alias("gb")))
    big = (labeled.groupBy("ga", "gb")
           .agg(F.count(F.lit(1)).alias("c"))
           .filter(F.col("c") >= min_count))
    truncated = False
    if max_bigrams is not None:
        big = big.orderBy(F.col("c").desc(), F.col("ga").asc(),
                          F.col("gb").asc()).limit(max_bigrams + 1)
        big_rows = big.collect()
        truncated = len(big_rows) > max_bigrams
        big_rows = big_rows[:max_bigrams]
    else:
        big_rows = big.collect()
    bigrams = {r["ga"] + "\x1f" + r["gb"]: r["c"] for r in big_rows}
    lm = NGramLM(unigrams, bigrams, k=k, lam=lam)
    lm.bigrams_truncated = truncated
    return lm


def perplexity_col(model: NGramLM, text_col) -> Column:
    """bits-per-token cross-entropy * 1000, rounded to bigint, as a
    column (one Arrow stage; model rebuilt once per executor)."""
    payload = model.to_json()
    state: dict = {}

    def score(texts: pd.Series) -> pd.Series:
        lm = state.get("lm")
        if lm is None:
            lm = state["lm"] = NGramLM.from_json(payload)
        import re
        tok_rx = re.compile(r"[^a-z0-9]+")

        def one(t):
            if not t:
                return 0
            toks = [x for x in tok_rx.sub(" ", t.lower()).split() if x]
            return lm.bits_e3(toks)

        return texts.map(one)

    return F.pandas_udf(score, LongType())(text_col)


def score_docs(docs: DataFrame, model: NGramLM,
               text_col: str = "text",
               out_col: str = "bits_per_token_e3") -> DataFrame:
    """Annotate docs with the milli-bits/token LM score."""
    return docs.withColumn(out_col, perplexity_col(model, F.col(text_col)))
