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


def pages_df_local(spark: SparkSession, pages: list[dict]) -> DataFrame:
    """createDataFrame from pre-built local records (pytest path)."""
    rows = [(p["url"], p["warc_ts"].replace(tzinfo=None), bytearray(p["html"]),
             p["text"], p["lang"]) for p in pages]
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)
