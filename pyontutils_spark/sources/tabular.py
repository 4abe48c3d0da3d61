"""Tabular ingestion: CSV/TSV with header normalization + sinks.

The reference's row-stream machinery (``rowParse``
``pyontutils/utils.py:551-617``, ``byCol`` ``utils.py:646-707``)
normalizes headers to python identifiers via ``python_identifier``
(``utils.py:620-643``) and exposes rows as named tuples; the Spark
equivalent is a plain DataFrame with normalized column names.

Also here:
- ``make_catalog_xml``: the protege catalog sink (``make_catalog``,
  ``pyontutils/ontload.py:88-93``) — owl:sameAs triples to a catalog
  XML string (driver-side presentation of a tiny projection).
- ``class_records_json``: the for_burak JSON export
  (``pyontutils/ontload.py:561-591``) — per-class records to JSON.
"""

from __future__ import annotations

from xml.sax.saxutils import quoteattr

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..kernel.norm import python_identifier
from ..operators import vocab


def read_table(spark: SparkSession, path: str, sep: str = ",",
               header: bool = True) -> DataFrame:
    """CSV/TSV -> DataFrame with python_identifier-normalized headers
    (byCol semantics: header -> valid identifier, collisions suffixed)."""
    df = spark.read.csv(path, sep=sep, header=header, inferSchema=False)
    seen: dict[str, int] = {}
    renames = {}
    for c in df.columns:
        base = python_identifier(c)
        n = seen.get(base, 0)
        seen[base] = n + 1
        renames[c] = base if n == 0 else f"{base}_{n}"
    return df.withColumnsRenamed(renames)


def make_catalog_xml(triples: DataFrame, base: str = "local") -> str:
    """Protege catalog-v001.xml from owl:sameAs triples
    (make_catalog ontload.py:88-93): tiny filtered projection collected
    driver-side, deterministic order."""
    rows = (triples.filter(F.col("pred") == vocab.OWL_SAMEAS)
            .select("subj", "obj").distinct()
            .orderBy("subj", "obj").collect())
    lines = ['<?xml version="1.0" encoding="UTF-8" standalone="no"?>',
             '<catalog prefer="public" '
             'xmlns="urn:oasis:names:tc:entity:xmlns:xml:catalog">']
    for r in rows:
        lines.append(
            f"    <uri id={quoteattr(base)} name={quoteattr(r.subj)} "
            f"uri={quoteattr(r.obj)}/>")
    lines.append("</catalog>")
    return "\n".join(lines) + "\n"


def class_records_json(triples: DataFrame, path: str) -> None:
    """for_burak export: per-class {iri, labels, synonyms, parents} as
    JSON lines (ontload.py:561-591)."""
    from ..operators.entities import class_records
    class_records(triples).write.mode("overwrite").json(path)
