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


def read_sql_table(spark: SparkSession, url: str, table: str,
                   dedup_key: str | None = None,
                   order_col: str | None = None,
                   partition_column: str | None = None,
                   lower_bound=None, upper_bound=None,
                   num_partitions: int | None = None,
                   **options) -> DataFrame:
    """JDBC ingestion with the reference SQL source's dedup semantics
    (``interlex_sql.py:67-128``: ``GROUP BY t.ilx`` keeping one row) —
    ``spark.read.jdbc`` then ``group_to_first(dedup_key, order_col)``.

    Scale contract: pass ``partition_column``/bounds/``num_partitions``
    so the read is a parallel range scan, not a single-connection pull
    (Spark's standard JDBC partitioning); predicates still push down to
    the database.  Requires the database's JDBC driver jar on the Spark
    classpath (none ships in this sandbox — the wrapper raises the
    driver's ClassNotFound error verbatim; the dedup semantics are
    covered engine-side by ``entities.group_to_first`` tests and the
    ``group_to_first`` oracle query)."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", table))
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions or 8)))
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    if dedup_key is not None:
        from ..operators.entities import group_to_first
        df = group_to_first(df, dedup_key,
                            order_col or dedup_key)
    return df
