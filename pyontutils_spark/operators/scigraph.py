"""SciGraph-style JSON neighborhood export.

The reference's ``makeGraph.make_scigraph_json``
(``pyontutils/core.py:805-886``) emits the ``{nodes: [{id, lbl,
meta}], edges: [{sub, pred, obj}]}`` shape the tree-checking path
consumes.  Semantics kept:

- ``direct=True``: one edge per ``(sub, edge, obj)`` statement
  (core.py:817-846); node ids are qnames, ``lbl`` is the node's
  ``label_edge`` value (full IRI when unlabeled), ``meta`` is empty.
- ``direct=False`` (core.py:849-886): restriction lift — for each
  ``_:linker owl:onProperty <edge>``, the object is its
  ``owl:someValuesFrom`` (falling back to ``owl:allValuesFrom``) and
  the subject is the class with ``rdfs:subClassOf _:linker``;
  non-IRI objects (unionOf and other structural nodes — skolemized in
  this engine) are skipped like the reference's ``URIRef`` check
  (:857), and ``owl:deprecated`` nodes carry
  ``meta[owl:deprecated] = True`` (:864,871).
- the edge's ``pred`` field is the *caller's* edge spelling verbatim
  (curie or IRI), exactly like the reference.

Divergences (deliberate, documented):

- the reference iterates rdflib set order and takes the FIRST label —
  both nondeterministic; this export sorts edges by natsort of
  (sub, obj) qnames and takes the MINIMUM label, so output is stable
  across partitionings and runs.
- restriction mode joins ALL ``rdfs:subClassOf`` subjects of a linker
  bnode; the reference takes ``subjects[0]`` only (core.py:861) —
  which subject that is depends on rdflib set order, so when a
  restriction bnode is (illegally but parseably) shared by several
  classes the reference keeps an arbitrary one and this export keeps
  every edge.  For well-formed OWL (one subject per restriction
  bnode) the two agree.
- a linker with NEITHER ``owl:someValuesFrom`` NOR
  ``owl:allValuesFrom`` is skipped here (the coalesce + notNull
  filter); the reference raises ``IndexError`` on ``values[0]``
  (core.py:858).  Malformed restrictions drop out of the export
  instead of aborting the whole job — at corpus scale one bad
  document must not kill the export; use the strict RDF read mode to
  surface malformed input loudly.

Spark shape: predicate filters + label/deprecated joins run
distributed; the final collect is the presentation step — a
neighborhood export is driver-sized by declaration (same boundary as
the tree renderer, operators/tree.py), enforced by ``max_rows``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernel.curies import DEFAULT as DEFAULT_PREFIXES
from ..kernel.ids import SKOLEM_NS
from ..kernel.norm import natsort_key
from . import vocab
from .combinators import OWL_ON_PROPERTY, OWL_SOME_VALUES

OWL_ALL_VALUES = OWL_SOME_VALUES.replace("someValuesFrom", "allValuesFrom")


def _node_labels(triples: DataFrame, label_edge: str) -> DataFrame:
    return (triples
            .filter((F.col("pred") == label_edge) & F.col("obj_is_literal"))
            .groupBy("subj").agg(F.min("obj").alias("lbl")))


def _edge_pairs_direct(triples: DataFrame, restriction: str) -> DataFrame:
    return (triples
            .filter((F.col("pred") == restriction)
                    & ~F.col("obj_is_literal"))
            .select(F.col("subj").alias("sub"), F.col("obj").alias("obj")))


def _edge_pairs_restriction(triples: DataFrame,
                            restriction: str) -> DataFrame:
    linkers = (triples
               .filter((F.col("pred") == OWL_ON_PROPERTY)
                       & (F.col("obj") == restriction))
               .select(F.col("subj").alias("linker")))
    svf = (triples.filter(F.col("pred") == OWL_SOME_VALUES)
           .select(F.col("subj").alias("linker"),
                   F.col("obj").alias("svf")))
    avf = (triples.filter(F.col("pred") == OWL_ALL_VALUES)
           .select(F.col("subj").alias("linker"),
                   F.col("obj").alias("avf")))
    vals = (linkers.join(svf, "linker", "left").join(avf, "linker", "left")
            .select("linker", F.coalesce("svf", "avf").alias("obj"))
            .filter(F.col("obj").isNotNull())
            # structural objects (unionOf etc. — skolem/bnode ids) are
            # skipped, mirroring the reference's URIRef check
            .filter(~F.col("obj").startswith(SKOLEM_NS)
                    & ~F.col("obj").startswith("_:")))
    subs = (triples.filter(F.col("pred") == vocab.RDFS_SUBCLASSOF)
            .select(F.col("subj").alias("sub"),
                    F.col("obj").alias("linker")))
    return subs.join(vals, "linker").select("sub", "obj")


def make_scigraph_json(triples: DataFrame, edge: str,
                       label_edge: str | None = None,
                       direct: bool = False,
                       prefixes=None,
                       max_rows: int = 100_000) -> dict:
    """Export the ``edge`` neighborhood of a triple DataFrame as the
    SciGraph JSON graph shape (see module docstring; reference
    ``core.py:805-886``).  ``edge``/``label_edge`` accept a curie or a
    full IRI; ``'isDefinedBy'`` expands like the reference (:812).

    The result is collected to the driver (it feeds the driver-side
    tree renderer, like the reference's REST JSON).  ``max_rows``
    bounds that collect: a corpus-scale neighborhood raises instead of
    OOMing the driver — raise the limit explicitly if a bigger export
    is genuinely wanted."""
    pm = prefixes if prefixes is not None else DEFAULT_PREFIXES
    if label_edge is None:
        label_iri = vocab.RDFS_LABEL
    else:
        label_iri = pm.expand(label_edge)
    if edge == "isDefinedBy":
        restriction = pm.expand("rdfs:isDefinedBy")
    else:
        restriction = pm.expand(edge)

    pairs = (_edge_pairs_direct(triples, restriction) if direct
             else _edge_pairs_restriction(triples, restriction))
    labels = _node_labels(triples, label_iri)
    deprecated = (triples
                  .filter(F.col("pred") == vocab.OWL_DEPRECATED)
                  .select(F.col("subj").alias("dep_iri"))
                  .distinct())
    enriched = (pairs
                .join(labels.withColumnRenamed("subj", "sub")
                      .withColumnRenamed("lbl", "slab"), "sub", "left")
                .join(labels.withColumnRenamed("subj", "obj")
                      .withColumnRenamed("lbl", "olab"), "obj", "left")
                .join(deprecated.withColumnRenamed("dep_iri", "sub")
                      .withColumn("sdep", F.lit(True)), "sub", "left")
                .join(deprecated.withColumnRenamed("dep_iri", "obj")
                      .withColumn("odep", F.lit(True)), "obj", "left")
                .distinct())

    rows = enriched.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"make_scigraph_json: neighborhood exceeds max_rows="
            f"{max_rows} edges; this export is driver-sized by design "
            f"— filter the triples first or raise max_rows explicitly")
    qn = pm.qname
    rows.sort(key=lambda r: (natsort_key(qn(r.sub)), natsort_key(qn(r.obj))))

    json_: dict = {"nodes": [], "edges": []}
    done: set[str] = set()
    dep_key = vocab.OWL_DEPRECATED
    for r in rows:
        sub_q, obj_q = qn(r.sub), qn(r.obj)
        json_["edges"].append({"sub": sub_q, "pred": edge, "obj": obj_q})
        for node_q, iri, lbl, dep in ((sub_q, r.sub, r.slab, r.sdep),
                                      (obj_q, r.obj, r.olab, r.odep)):
            if node_q in done:
                continue
            done.add(node_q)
            meta = {dep_key: True} if (dep and not direct) else {}
            json_["nodes"].append(
                {"lbl": lbl if lbl is not None else iri,
                 "id": node_q, "meta": meta})
    return json_
