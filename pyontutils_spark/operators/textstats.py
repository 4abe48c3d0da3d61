"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All pure column expressions with documented
formulas so the DuckDB oracle can reproduce results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import h32, tokens_col

# Fixed stopword marker sets for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "with", "for", "a"],
    "de": ["der", "die", "das", "und", "ist", "mit", "von", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "avec"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "con", "por"],
}


def token_count(text_col) -> Column:
    """Whitespace-ish token count (size of the deterministic token set)."""
    return F.size(tokens_col(text_col))


def word_token_count(text_col) -> Column:
    """BPE-ish subword proxy: alnum runs + standalone punctuation marks
    both count (regexp token model)."""
    return F.size(F.filter(
        F.split(F.regexp_replace(
            F.lower(text_col), r"([^a-z0-9\s])", r" $1 "), r"\s+"),
        lambda t: t != ""))


def _stopword_hits(text_col, words: list[str]) -> Column:
    toks = tokens_col(text_col)
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_scores(text_col) -> dict[str, Column]:
    n = F.greatest(token_count(text_col), F.lit(1))
    return {lang: _stopword_hits(text_col, ws) / n
            for lang, ws in STOPWORDS.items()}


def lang_id(text_col) -> Column:
    """Argmax of stopword-hit ratio; 'und' (undetermined) when every
    ratio is zero.  Ties break in fixed key order en>de>fr>es."""
    scores = lang_scores(text_col)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in ("es", "fr", "de", "en"):  # reverse priority: later wins ties
        s = scores[lang]
        cond = s >= best_score
        # strictly-greater-than-zero requirement for a claim
        best_lang = F.when((s > 0) & cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio features + a composite
    quality score in [0,1].  Formula (documented for the oracle):
      len_score  = least(n_tokens/100, 1.0)
      punct_ratio = punct_chars / chars
      stop_ratio = en-stopword hits / tokens
      score = 0.5*len_score + 0.3*least(stop_ratio*5,1) +
              0.2*(1 - least(punct_ratio*10,1))
    """
    t = F.col(text_col)
    n_tokens = token_count(t)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_ratio = _stopword_hits(t, STOPWORDS["en"]) / \
        F.greatest(n_tokens, F.lit(1))
    len_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    score = (F.lit(0.5) * len_score
             + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
             + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10,
                                                  F.lit(1.0))))
    return (docs
            .withColumn("n_tokens", n_tokens)
            .withColumn("n_chars_measured", n_chars)
            .withColumn("punct_ratio", punct_ratio)
            .withColumn("stopword_ratio", stop_ratio)
            .withColumn("quality_score", F.round(score, 6)))


def fingerprint(text_col, n: int = 8) -> Column:
    """Winnowing-style document fingerprint: min h32 over character
    n-gram shingles of the lowercased text (deterministic; equal for
    equal texts, robust to trailing differences)."""
    t = F.lower(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - n + 1, F.lit(1)))
    return F.array_min(F.transform(idx, lambda i: h32(t.substr(i, F.lit(n)))))


def gopher_quality_flags(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         min_tokens: int = 5, max_tokens: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_bigram_share: float = 0.30) -> DataFrame:
    """Gopher-style document quality rules (the rule family of the
    Gopher/MassiveText filtering pipeline, applied as pure relational
    ops): per document —

    - ``n_tokens`` within [min_tokens, max_tokens]
    - mean word length within [min, max]
    - top-2-gram repetition share <= max_bigram_share (boilerplate /
      degenerate repetition detector)

    Returns (id, n_tokens, mean_word_len_e4, top_bigram_share_e4,
    keep) with ratios as integer 1e4-scaled values (cross-engine
    hashable).  Plan shape: one explode + two hash aggregations (the
    bigram count and its per-doc max) then a broadcast-size join back
    — scale-safe, no window over the corpus."""
    toks = docs.select(F.col(id_col).alias("id"),
                       tokens_col(F.col(text_col)).alias("ts"))
    base = toks.select(
        "id", F.size("ts").alias("n_tokens"),
        F.round(F.aggregate("ts", F.lit(0).cast("long"),
                            lambda a, t: a + F.length(t))
                / F.greatest(F.size("ts"), F.lit(1)) * 10_000)
        .cast("long").alias("mean_word_len_e4"))
    # total generator: docs with <2 tokens yield an empty index array
    # (explode drops them) instead of relying on the n>=2 filter being
    # pushed below the Generate — element_at(ts, i+1) would throw
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode if a
    # materialization barrier ever blocked that pushdown.
    bigrams = toks.select(
        "id",
        F.explode(F.transform(
            F.when(F.size("ts") >= 2,
                   F.sequence(F.lit(1), F.size("ts") - 1))
            .otherwise(F.array().cast("array<int>")),
            _bigram_at("ts"))).alias("bg"),
        F.size("ts").alias("n"))
    top = (bigrams.filter(F.col("n") >= 2)
           .groupBy("id", "n", "bg").agg(F.count("*").alias("c"))
           .groupBy("id", "n").agg(F.max("c").alias("maxc"))
           .select("id", F.round(F.col("maxc") / (F.col("n") - 1)
                                 * 10_000).cast("long")
                   .alias("top_bigram_share_e4")))
    out = (base.join(top, "id", "left")
           .withColumn("top_bigram_share_e4",
                       F.coalesce("top_bigram_share_e4", F.lit(0))))
    keep = ((F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("mean_word_len_e4") >= int(min_mean_word_len * 10_000))
            & (F.col("mean_word_len_e4") <= int(max_mean_word_len * 10_000))
            & (F.col("top_bigram_share_e4")
               <= int(max_bigram_share * 10_000)))
    return out.withColumn("keep", keep)


def _bigram_at(ts_col: str):
    # closure factory (pyspark inspects lambda arity)
    def f(i):
        return F.concat_ws(" ", F.element_at(ts_col, i),
                           F.element_at(ts_col, i + 1))
    return f
