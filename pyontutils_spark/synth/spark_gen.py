"""Distributed deterministic corpus generation.

``pages_df(spark, n)`` builds the BASELINE input table with
``spark.range(n).mapInPandas`` — each row is a pure function of its
index, so any partitioning yields identical bytes (the property the
reference's determinism tests enforce by randomizing input order,
``ttlser/test/test_ttlser.py:56-74``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .lexicon import make_lexicon
from .pages import make_page

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def pages_df(spark: SparkSession, n: int, n_terms: int = 200,
             partitions: int | None = None, scale: int = 1) -> DataFrame:
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    rng = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex = make_lexicon(n_terms)  # deterministic; cheap per task
        for pdf in batches:
            recs = [make_page(int(i), lex, scale=scale) for i in pdf["id"]]
            yield pd.DataFrame({
                "url": [r["url"] for r in recs],
                "warc_ts": [r["warc_ts"].replace(tzinfo=None) for r in recs],
                "html": [r["html"] for r in recs],
                "text": [r["text"] for r in recs],
                "lang": [r["lang"] for r in recs],
            })

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


DOCS_SCHEMA = ("doc_id long, url string, text string, lang string, "
               "source string")

_LANGS = ("en", "en", "en", "en", "de", "fr", "es")
_TRACKING = ("utm_source=soak", "utm_medium=synth", "ref=mirror",
             "fbclid=Z9", "gclid=Q4")


def documents_df(spark: SparkSession, n: int,
                 distinct_frac: float = 0.70,
                 exact_frac: float = 0.10,
                 near_frac: float = 0.10,
                 partitions: int | None = None,
                 seed: int = 7) -> DataFrame:
    """Synthetic ``documents(doc_id, url, text, lang, source)`` corpus
    with a REALISTIC duplicate mix for funnel soaks — unlike the
    dup-heavy driver testdata, most documents here are pairwise
    distinct (per-doc token sets drawn from a 6k vocab), with
    controlled strata on top of the ``distinct_frac`` base docs:

    - ``exact_frac``: byte-identical text under a different URL
      (caught by the exact-dedup stage),
    - ``near_frac``: ~4%% of tokens perturbed (caught by MinHash-LSH),
    - the remainder: same text AND same URL + tracking params / case /
      fragment junk (caught by the canonical-URL stage).

    Each row is a pure function of its index (same determinism
    contract as ``pages_df``); ~1% of base docs are degenerate
    (one-token-repeated or single-word) so the Gopher gate has real
    work.  Generation is ``spark.range -> mapInPandas`` — distributed
    and cacheable at any n."""
    import random

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    rng_df = spark.range(0, n, 1, partitions)
    n_base = max(1, int(n * distinct_frac))
    hi_exact = n_base + int(n * exact_frac)
    hi_near = hi_exact + int(n * near_frac)

    def _text(base: int) -> tuple[str, str]:
        r = random.Random((seed << 32) ^ base)
        lang = _LANGS[base % len(_LANGS)]
        if r.random() < 0.01:  # degenerate: trip the quality gate
            w = f"{lang}w{r.randrange(6000)}"
            toks = [w] * r.randrange(5, 120)
        else:
            # 65% per-doc vocab + 35% shared zipf stream: base docs
            # stay pairwise BELOW the LSH threshold (a shared template
            # would make the whole corpus one near-dup cluster) while
            # still sharing a realistic head.  Per-doc words are
            # 4-8-char letter strings from the doc's own seeded stream
            # (cross-doc collisions ~26^-5): token length stays inside
            # the Gopher mean-word-length bounds at ANY corpus size —
            # embedding the raw base id made tokens grow with doc id
            # and tripped the quality gate for high ids (r6 soak).
            k = r.randrange(80, 220)
            vocab = ["".join(r.choices("abcdefghijklmnopqrstuvwxyz",
                                       k=r.randrange(4, 9)))
                     for _ in range(60)]
            toks = [f"{lang}w{int(r.paretovariate(1.1)) % 6000}"
                    if r.random() < 0.35 else r.choice(vocab)
                    for _ in range(k)]
        return " ".join(toks), lang

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "url": [], "text": [], "lang": [],
                    "source": []}
            for i in pdf["id"]:
                i = int(i)
                if i < n_base:          # distinct base doc
                    base, kind = i, "base"
                elif i < hi_exact:      # exact text dup, new url
                    base, kind = (seed * 31 + i) % n_base, "exact"
                elif i < hi_near:       # near dup
                    base, kind = (seed * 37 + i) % n_base, "near"
                else:                   # url variant of the base
                    base, kind = (seed * 41 + i) % n_base, "url"
                text, lang = _text(base)
                url = (f"https://host{base % 997}.example.org/"
                       f"docs/{base}")
                if kind == "exact":
                    url = f"https://mirror.example.net/copy/{i}"
                elif kind == "near":
                    r = random.Random((seed << 33) ^ i)
                    toks = text.split(" ")
                    for _ in range(max(1, len(toks) // 25)):
                        toks[r.randrange(len(toks))] = \
                            f"{lang}x{r.randrange(6000)}"
                    text = " ".join(toks)
                    url = f"https://host{i % 997}.example.org/alt/{i}"
                elif kind == "url":
                    junk = _TRACKING[i % len(_TRACKING)]
                    url = (f"HTTPS://Host{base % 997}.Example.org:443/"
                           f"docs/{base}?{junk}#frag{i}")
                rows["doc_id"].append(i)
                rows["url"].append(url)
                rows["text"].append(text)
                rows["lang"].append(lang)
                rows["source"].append(kind)
            yield pd.DataFrame(rows)

    return rng_df.mapInPandas(gen, schema=DOCS_SCHEMA)


def pages_df_local(spark: SparkSession, pages: list[dict]) -> DataFrame:
    """createDataFrame from pre-built local records (pytest path)."""
    rows = [(p["url"], p["warc_ts"].replace(tzinfo=None), bytearray(p["html"]),
             p["text"], p["lang"]) for p in pages]
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)
