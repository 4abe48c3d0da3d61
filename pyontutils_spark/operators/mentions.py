"""Stage 2: ontology-term mention detection (broadcast Aho-Corasick).

Re-expresses SciGraph's annotate endpoint
(``pyontutils/scigraph_client.py:174-197``: ``longestOnly``,
``minLength``, category filters) as a Spark stage: the automaton is
built once on the driver from the lexicon (labels + synonyms degraded
via ``lower().strip()``, ``interlex_sql.py:22``), broadcast to the
executors, and applied per Arrow batch with ``mapInPandas`` — O(text)
per document, zero per-row Python calls from the JVM's perspective.

Output: one row per mention ``(url, start, end, surface, pattern_norm)``
with leftmost-longest, word-boundary, non-overlapping semantics.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernel.ac import AhoCorasick
from ..kernel.norm import local_degrade

MENTION_SCHEMA = ("url string, start int, end int, "
                  "surface string, pattern_norm string")


def build_automaton(lexicon: list[dict], min_length: int = 3,
                    types: set[str] | None = None) -> AhoCorasick:
    """Unique degraded patterns -> payload is the pattern itself (link
    candidates are resolved later by a broadcast join on pattern_norm).
    ``types`` filters lexicon categories (annotate's includeCat)."""
    pats = set()
    for t in lexicon:
        if types is not None and t.get("type") not in types:
            continue
        pats.add(t["label_norm"])
        for s in t.get("synonyms", ()):
            pats.add(local_degrade(s))
    return AhoCorasick(((p, p) for p in sorted(pats)), min_length=min_length)


def detect_mentions(pages: DataFrame, automaton_bc,
                    text_col: str = "text",
                    lang_filter: str | None = "en") -> DataFrame:
    """pages(url, text, lang, ...) -> mentions DataFrame.

    ``automaton_bc``: a Broadcast[AhoCorasick] (build once per job —
    ``spark.sparkContext.broadcast(build_automaton(lex))``).
    ``lang_filter`` prunes non-matching languages *before* the UDF
    (declarative filter -> pushed to the scan when reading parquet).
    """
    src = pages
    if lang_filter is not None:
        src = src.filter(src["lang"] == lang_filter)
    src = src.select("url", text_col)

    def find_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac = automaton_bc.value
        for pdf in batches:
            urls, starts, ends, surfaces, pats = [], [], [], [], []
            for url, text in zip(pdf["url"], pdf[text_col]):
                if not text:
                    continue
                for s, e, pat in ac.find(text, longest_only=True):
                    urls.append(url)
                    starts.append(s)
                    ends.append(e)
                    surfaces.append(text[s:e])
                    pats.append(pat)
            yield pd.DataFrame({
                "url": pd.Series(urls, dtype="object"),
                "start": pd.Series(starts, dtype="int32"),
                "end": pd.Series(ends, dtype="int32"),
                "surface": pd.Series(surfaces, dtype="object"),
                "pattern_norm": pd.Series(pats, dtype="object"),
            })

    return src.mapInPandas(find_batches, schema=MENTION_SCHEMA)


def broadcast_automaton(spark: SparkSession, lexicon: list[dict],
                        min_length: int = 3):
    return spark.sparkContext.broadcast(
        build_automaton(lexicon, min_length=min_length))
