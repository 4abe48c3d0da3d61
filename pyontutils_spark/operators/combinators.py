"""OWL structural-subgraph combinators with deterministic skolem nodes.

The reference builds restrictions / RDF lists / axiom annotations with
fresh BNodes (``pyontutils/combinators.py``: ``Restriction.serialize``
:338-354, ``List.serialize`` :419-443, ``Annotation.serialize``
:499-559) and then needs a fixpoint BNode-ranking pass to order them
deterministically (``ttlser/serializers.py:312-431``).  We skolemize
instead: every structural node gets a content-hash IRI computed
JVM-side (``sha2`` over its defining content), which makes emission a
pure column expression and parsing a groupBy+pivot — no driver state,
no fixpoint (the design the reference itself points at,
``utils_extra.py:31-32``).

Emit/parse pairs round-trip exactly (the reference's own test strategy:
``Restriction.parse`` inverse of serialize, ``combinators.py:356-378``;
annotation golden test ``test/test_core.py:5-21`` asserts exactly 6
triples per annotated axiom — ours emits the same 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernel.ids import SKOLEM_NS
from . import vocab

OWL = "http://www.w3.org/2002/07/owl#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
OWL_RESTRICTION = OWL + "Restriction"
OWL_ON_PROPERTY = OWL + "onProperty"
OWL_SOME_VALUES = OWL + "someValuesFrom"
OWL_AXIOM = OWL + "Axiom"
OWL_ANN_SOURCE = OWL + "annotatedSource"
OWL_ANN_PROPERTY = OWL + "annotatedProperty"
OWL_ANN_TARGET = OWL + "annotatedTarget"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"


def _skolem(*cols) -> F.Column:
    """Deterministic skolem IRI from content columns (JVM-side)."""
    return F.concat(F.lit(SKOLEM_NS),
                    F.substring(F.sha2(F.concat_ws("\x1f", *cols), 256),
                                1, 32))


def _t(subj, pred, obj, is_literal=False):
    return [subj.alias("subj"),
            (pred if not isinstance(pred, str) else F.lit(pred))
            .alias("pred"),
            obj.alias("obj"),
            F.lit(is_literal).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang")]


def emit_restrictions(specs: DataFrame,
                      linking_pred: str = vocab.RDFS_SUBCLASSOF) -> DataFrame:
    """specs(subj, prop, filler) -> 4 triples per row via a skolemized
    restriction node (add_restriction semantics, core.py:743-757 /
    add_hierarchy core.py:725-741)."""
    sk = _skolem(F.lit("restriction"), F.col("subj"), F.lit(linking_pred),
                 F.col("prop"), F.col("filler"))
    s = specs.withColumn("_sk", sk)
    return (s.select(*_t(F.col("subj"), linking_pred, F.col("_sk")))
            .unionByName(s.select(*_t(F.col("_sk"), vocab.RDF_TYPE,
                                      F.lit(OWL_RESTRICTION))))
            .unionByName(s.select(*_t(F.col("_sk"), OWL_ON_PROPERTY,
                                      F.col("prop"))))
            .unionByName(s.select(*_t(F.col("_sk"), OWL_SOME_VALUES,
                                      F.col("filler")))))


def parse_restrictions(triples: DataFrame,
                       linking_pred: str = vocab.RDFS_SUBCLASSOF
                       ) -> DataFrame:
    """Inverse of emit_restrictions: recover (subj, prop, filler)."""
    nodes = (triples.filter((F.col("pred") == vocab.RDF_TYPE)
                            & (F.col("obj") == OWL_RESTRICTION))
             .select(F.col("subj").alias("node")))
    props = (triples.filter(F.col("pred") == OWL_ON_PROPERTY)
             .select(F.col("subj").alias("node"),
                     F.col("obj").alias("prop")))
    fillers = (triples.filter(F.col("pred") == OWL_SOME_VALUES)
               .select(F.col("subj").alias("node"),
                       F.col("obj").alias("filler")))
    owners = (triples.filter(F.col("pred") == linking_pred)
              .select(F.col("subj").alias("owner"),
                      F.col("obj").alias("node")))
    return (nodes.join(props, "node").join(fillers, "node")
            .join(owners, "node")
            .select(F.col("owner").alias("subj"), "prop", "filler"))


def emit_rdf_list(lists: DataFrame) -> DataFrame:
    """lists(list_id, items array<string>) -> rdf:first/rdf:rest chain
    with skolemized cons cells (List.serialize, combinators.py:419-443).
    Items are IRIs; the list head node is deterministic from
    (list_id, 0)."""
    exploded = lists.select(
        "list_id", F.posexplode("items").alias("pos", "item"),
        F.size("items").alias("n"))
    node = _skolem(F.lit("list"), F.col("list_id"),
                   F.col("pos").cast("string"))
    nxt = F.when(
        F.col("pos") == F.col("n") - 1, F.lit(RDF_NIL)).otherwise(
        _skolem(F.lit("list"), F.col("list_id"),
                (F.col("pos") + 1).cast("string")))
    e = exploded.withColumn("_node", node).withColumn("_next", nxt)
    firsts = e.select(*_t(F.col("_node"), RDF_FIRST, F.col("item")))
    rests = e.select(*_t(F.col("_node"), RDF_REST, F.col("_next")))
    return firsts.unionByName(rests)


def list_head(list_id_col) -> F.Column:
    """Skolem IRI of a list's head cell (to link the list elsewhere)."""
    return _skolem(F.lit("list"), list_id_col, F.lit("0"))


def decode_rdf_list(triples: DataFrame, max_len: int = 64) -> DataFrame:
    """Follow rdf:rest chains -> (head, items array in order).
    Iterative join, bounded by max_len (lists are short by construction;
    the reference's doList recursion, serializers.py:640-658)."""
    firsts = (triples.filter(F.col("pred") == RDF_FIRST)
              .select(F.col("subj").alias("node"),
                      F.col("obj").alias("item")))
    rests = (triples.filter(F.col("pred") == RDF_REST)
             .select(F.col("subj").alias("node"),
                     F.col("obj").alias("nxt")))
    # heads = list nodes that are not pointed to by any rdf:rest
    pointed = rests.select(F.col("nxt").alias("node")).distinct()
    heads = firsts.select("node").join(pointed, "node", "left_anti")

    cur = heads.select(F.col("node").alias("head"),
                       F.col("node"), F.lit(0).alias("pos"))
    acc = None
    for _ in range(max_len):
        step = (cur.join(firsts, "node")
                .select("head", "node", "pos", "item"))
        acc = step if acc is None else acc.unionByName(step)
        nxt = (cur.join(rests, "node")
               .filter(F.col("nxt") != RDF_NIL)
               .select("head", F.col("nxt").alias("node"),
                       (F.col("pos") + 1).alias("pos")))
        if nxt.isEmpty():
            break
        cur = nxt.localCheckpoint(eager=True)
    return (acc.groupBy("head")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "item"))),
                lambda s: s.item).alias("items")))


OWL_INTERSECTION_OF = OWL + "intersectionOf"
OWL_UNION_OF = OWL + "unionOf"
OWL_ONE_OF = OWL + "oneOf"
OWL_DISJOINT_UNION_OF = OWL + "disjointUnionOf"
OWL_PROPERTY_CHAIN = OWL + "propertyChainAxiom"
OWL_MEMBERS = OWL + "members"
OWL_EQUIVALENT_CLASS = OWL + "equivalentClass"
OWL_CLASS = OWL + "Class"

#: the reference's PredicateList subclasses (combinators.py:582-753):
#: intersectionOf, unionOf, oneOf, disjointUnionOf, propertyChainAxiom,
#: members.  propertyChainAxiom is ORDER-SIGNIFICANT (ttlser's
#: no-reorder list exception, serializers.py:660-673) — emit/parse here
#: always preserve item order, so every member predicate satisfies it.
PREDICATE_LIST_PREDICATES = (
    OWL_INTERSECTION_OF, OWL_UNION_OF, OWL_ONE_OF, OWL_DISJOINT_UNION_OF,
    OWL_PROPERTY_CHAIN, OWL_MEMBERS)


def _pl_list_id(list_pred: str):
    return F.concat_ws("\x1f", F.lit("pl"), F.col("subj"),
                       F.lit(list_pred), F.concat_ws("\x1e", "items"))


def emit_predicate_list(specs: DataFrame, list_pred: str,
                        linking_pred: str | None = None) -> DataFrame:
    """specs(subj, items array<string>) -> the PredicateList subgraph
    (reference ``PredicateList.serialize``, combinators.py:580-615,
    via ``List.serialize`` :419-443):

    - direct mode (``linking_pred=None``): ``subj list_pred <head>``
      plus the rdf:first/rest chain — PredicateList attached to a named
      subject.
    - blank mode: ``subj linking_pred <node>``, ``<node> a owl:Class``,
      ``<node> list_pred <head>`` — the IntersectionOfCombinator path
      where the class expression rides on a fresh (here: skolemized)
      node typed ``typeWhenSubjectIsBlank`` (combinators.py:598-603).

    Item order is preserved exactly (cons cells are position-keyed
    skolems); parse_predicate_list is the exact inverse."""
    list_id = _pl_list_id(list_pred)
    s = specs.withColumn("_lid", list_id)
    chain = emit_rdf_list(s.select(F.col("_lid").alias("list_id"), "items"))
    # empty member list -> rdf:nil head (no dangling skolem cell)
    head = F.when(F.size("items") == 0, F.lit(RDF_NIL)) \
        .otherwise(list_head(F.col("_lid")))
    if linking_pred is None:
        link = s.select(*_t(F.col("subj"), list_pred, head))
        return link.unionByName(chain)
    node = _skolem(F.lit("plnode"), F.col("subj"), F.lit(linking_pred),
                   F.lit(list_pred), F.col("_lid"))
    s = s.withColumn("_node", node)
    return (s.select(*_t(F.col("subj"), linking_pred, F.col("_node")))
            .unionByName(s.select(*_t(F.col("_node"), vocab.RDF_TYPE,
                                      F.lit(OWL_CLASS))))
            .unionByName(s.select(*_t(F.col("_node"), list_pred, head)))
            .unionByName(chain))


def parse_predicate_list(triples: DataFrame, list_pred: str,
                         linking_pred: str | None = None,
                         max_len: int = 64) -> DataFrame:
    """Inverse of emit_predicate_list: recover (subj, items array in
    emission order) for one list predicate.  In blank mode the class
    node is traversed back to the linking subject."""
    owners = (triples.filter(F.col("pred") == list_pred)
              .select(F.col("subj").alias("_o"),
                      F.col("obj").alias("head")))
    lists = decode_rdf_list(triples, max_len=max_len)
    got = (owners.filter(F.col("head") != RDF_NIL)
           .join(lists, "head")
           .select(F.col("_o").alias("subj"), "items")
           .unionByName(
               owners.filter(F.col("head") == RDF_NIL)
               .select(F.col("_o").alias("subj"),
                       F.array().cast("array<string>").alias("items"))))
    if linking_pred is None:
        return got
    links = (triples.filter(F.col("pred") == linking_pred)
             .select(F.col("subj").alias("owner"),
                     F.col("obj").alias("subj")))
    return (got.join(links, "subj")
            .select(F.col("owner").alias("subj"), "items"))


def emit_equivalent_class(specs: DataFrame,
                          operator: str = OWL_INTERSECTION_OF) -> DataFrame:
    """specs(subj, items) -> owl:equivalentClass to a skolemized class
    expression node carrying ``operator``'s member list (reference
    ``EquivalentClass.serialize``, combinators.py:655-684: subject
    equivalentClass ec_node; ec_node a owl:Class; ec_node operator
    list)."""
    return emit_predicate_list(specs, operator,
                               linking_pred=OWL_EQUIVALENT_CLASS)


def parse_equivalent_class(triples: DataFrame,
                           operator: str = OWL_INTERSECTION_OF) -> DataFrame:
    return parse_predicate_list(triples, operator,
                                linking_pred=OWL_EQUIVALENT_CLASS)


def annotate_axioms(axioms: DataFrame) -> DataFrame:
    """axioms(subj, pred, obj, ann_pred, ann_value) -> the 6-triple
    owl:Axiom reification of each annotated triple (Annotation
    combinator semantics; golden count per test/test_core.py:5-21)."""
    sk = _skolem(F.lit("axiom"), F.col("subj"), F.col("pred"),
                 F.col("obj"), F.col("ann_pred"), F.col("ann_value"))
    a = axioms.withColumn("_sk", sk)
    return (a.select(*_t(F.col("subj"), F.col("pred"), F.col("obj")))
            .unionByName(a.select(*_t(F.col("_sk"), vocab.RDF_TYPE,
                                      F.lit(OWL_AXIOM))))
            .unionByName(a.select(*_t(F.col("_sk"), OWL_ANN_SOURCE,
                                      F.col("subj"))))
            .unionByName(a.select(*_t(F.col("_sk"), OWL_ANN_PROPERTY,
                                      F.col("pred"))))
            .unionByName(a.select(*_t(F.col("_sk"), OWL_ANN_TARGET,
                                      F.col("obj"))))
            .unionByName(a.select(*_t(F.col("_sk"), F.col("ann_pred"),
                                      F.col("ann_value"), True))))


def parse_axiom_annotations(triples: DataFrame) -> DataFrame:
    """Inverse of annotate_axioms: recover (subj, pred, obj, ann_pred,
    ann_value) from the reified subgraph (Annotation.parse,
    combinators.py:520-559)."""
    ax = (triples.filter((F.col("pred") == vocab.RDF_TYPE)
                         & (F.col("obj") == OWL_AXIOM))
          .select(F.col("subj").alias("node")))

    def part(pred, name):
        return (triples.filter(F.col("pred") == pred)
                .select(F.col("subj").alias("node"),
                        F.col("obj").alias(name)))

    std = {OWL_ANN_SOURCE, OWL_ANN_PROPERTY, OWL_ANN_TARGET,
           vocab.RDF_TYPE}
    anns = (triples.join(ax, triples.subj == ax.node, "left_semi")
            .filter(~F.col("pred").isin(*std))
            .select(F.col("subj").alias("node"),
                    F.col("pred").alias("ann_pred"),
                    F.col("obj").alias("ann_value")))
    return (ax.join(part(OWL_ANN_SOURCE, "subj"), "node")
            .join(part(OWL_ANN_PROPERTY, "pred"), "node")
            .join(part(OWL_ANN_TARGET, "obj"), "node")
            .join(anns, "node")
            .select("subj", "pred", "obj", "ann_pred", "ann_value"))
