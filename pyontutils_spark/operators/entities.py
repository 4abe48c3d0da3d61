"""Entity (wide-row) views over the triple table.

The reference pivots triples to a per-subject wide table in
``OntoPandas.get_sparql_dataframe`` (``ilxutils/ilxutils/ontopandas.py:
177-273``): subject -> row, predicate -> column, multi-valued cells ->
lists.  Spark expression: ``groupBy(subj).pivot(pred).agg(collect_list)``.

Also here:
- ``for_burak``-style per-class record extraction (label + synonym set +
  parents; ``pyontutils/ontload.py:561-591``)
- label->rows multimap (``get_label2rows``, ``interlex_sql.py:271-282``)
- group-to-first dedup (the SQL ``GROUP BY t.ilx`` keeping one row,
  ``interlex_sql.py:75-79``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import vocab

# The 13-synonym-predicate union of for_burak (ontload.py:562-575),
# reduced to the vocabulary our factory emits.
SYNONYM_PREDICATES = (vocab.NIFRID_SYNONYM,)


def entity_pivot(triples: DataFrame,
                 predicates: list[str] | None = None) -> DataFrame:
    """subject -> one row; each predicate -> array<string> column of its
    objects, sorted for determinism.  ``predicates`` bounds the pivot
    (explicit value list -> single-pass pivot, no extra distinct scan)."""
    if predicates is None:
        predicates = [r[0] for r in
                      triples.select("pred").distinct().collect()]
    return (triples.groupBy("subj")
            .pivot("pred", predicates)
            .agg(F.sort_array(F.collect_list("obj")))
            .withColumnsRenamed({p: _short(p) for p in predicates}))


def _short(pred_iri: str) -> str:
    for sep in "#/":
        if sep in pred_iri:
            tail = pred_iri.rsplit(sep, 1)[1]
            if tail:
                return tail
    return pred_iri


def class_records(triples: DataFrame) -> DataFrame:
    """for_burak semantics (ontload.py:561-589): per owl:Class —
    labels, synonyms, parents, curie-ready iri."""
    classes = (triples
               .filter((F.col("pred") == vocab.RDF_TYPE)
                       & (F.col("obj") == vocab.OWL_CLASS))
               .select(F.col("subj").alias("iri")))
    labels = (triples.filter(F.col("pred") == vocab.RDFS_LABEL)
              .groupBy("subj")
              .agg(F.sort_array(F.collect_set("obj")).alias("labels")))
    syns = (triples.filter(F.col("pred").isin(*SYNONYM_PREDICATES))
            .groupBy("subj")
            .agg(F.sort_array(F.collect_set("obj")).alias("synonyms")))
    parents = (triples.filter(F.col("pred") == vocab.RDFS_SUBCLASSOF)
               .groupBy("subj")
               .agg(F.sort_array(F.collect_set("obj")).alias("parents")))
    out = classes
    for d, c in ((labels, "labels"), (syns, "synonyms"), (parents, "parents")):
        out = out.join(d.withColumnRenamed("subj", "iri"), "iri", "left")
        out = out.withColumn(c, F.coalesce(F.col(c), F.array()))
    return out


def label_multimap(entity_labels: DataFrame) -> DataFrame:
    """get_label2rows (interlex_sql.py:271-282): degraded label ->
    list of rows, visited-dedup first.  entity_labels(iri, label)."""
    return (entity_labels
            .withColumn("label_norm", F.lower(F.trim("label")))
            .dropDuplicates(["label_norm", "iri"])
            .groupBy("label_norm")
            .agg(F.sort_array(F.collect_list(F.struct("iri", "label")))
                 .alias("rows"),
                 F.count("*").alias("n")))


def group_to_first(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """GROUP BY key keeping first row by order_col (interlex_sql.py:75-79
    dedup semantics made deterministic)."""
    w = Window.partitionBy(key).orderBy(order_col)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1").drop("_rn"))
