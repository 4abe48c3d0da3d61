"""Stage 1: HTML -> text extraction (vectorized pandas UDF).

Per-row invariant (BASELINE.json:input_hint): byte-identical extracted
text per url.  The extraction function is the pure kernel
``html_to_text``; the UDF is a thin Arrow-batched wrapper, so the
invariant holds across batch boundaries, partitionings and retries.

Rows that already carry a non-null ``text`` column keep it.  The skip
happens *inside* the UDF (``coalesce`` would not short-circuit a pandas
UDF — Spark evaluates the UDF branch for every row) — at 10^12 pages,
not re-extracting pre-extracted rows is a real saving.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from ..kernel.extract import html_to_text


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda h: None if h is None else html_to_text(bytes(h)))


@F.pandas_udf(StringType())
def extract_if_missing_udf(text: pd.Series, html: pd.Series) -> pd.Series:
    out = text.copy()
    missing = text.isna()
    out[missing] = html[missing].map(
        lambda h: None if h is None else html_to_text(bytes(h)))
    return out


def with_extracted_text(pages: DataFrame, *, force: bool = False,
                        out_col: str = "text") -> DataFrame:
    """Add/replace ``out_col`` with extracted text.

    force=True re-extracts every row from html (used by the invariant
    test); default extracts only rows whose text is null.
    """
    if force or out_col not in pages.columns:
        return pages.withColumn(out_col, extract_text_udf(F.col("html")))
    return pages.withColumn(
        out_col, extract_if_missing_udf(F.col(out_col), F.col("html")))
