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
