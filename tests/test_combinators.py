"""Structural combinators round-trip (the reference's own test pattern:
Restriction.parse inverse of serialize combinators.py:356-378; the
annotation golden test test/test_core.py:5-21 asserts exactly 6
triples)."""

import pytest
from pyspark.sql import functions as F

from pyontutils_spark.kernel.ids import SKOLEM_NS
from pyontutils_spark.operators.combinators import (
    annotate_axioms, decode_rdf_list, emit_rdf_list, emit_restrictions,
    list_head, parse_axiom_annotations, parse_restrictions)

SPECS = [("http://e/neuron", "http://p/hasPart", "http://e/soma"),
         ("http://e/neuron", "http://p/hasPart", "http://e/axon"),
         ("http://e/cell", "http://p/locatedIn", "http://e/brain")]


def test_restriction_roundtrip(spark):
    specs = spark.createDataFrame(
        SPECS, "subj string, prop string, filler string")
    tri = emit_restrictions(specs)
    assert tri.count() == 4 * len(SPECS)
    # all structural nodes are skolem IRIs, no bnodes anywhere
    nodes = {r.obj for r in tri.filter(
        F.col("pred").endswith("subClassOf")).collect()}
    assert all(n.startswith(SKOLEM_NS) for n in nodes)
    back = {(r.subj, r.prop, r.filler)
            for r in parse_restrictions(tri).collect()}
    assert back == set(SPECS)


def test_restriction_skolem_deterministic(spark):
    specs = spark.createDataFrame(
        SPECS, "subj string, prop string, filler string")
    t1 = {tuple(r) for r in emit_restrictions(specs).collect()}
    t2 = {tuple(r) for r in
          emit_restrictions(specs.repartition(3)).collect()}
    assert t1 == t2


LISTS = [("L1", ["http://e/a", "http://e/b", "http://e/c"]),
         ("L2", ["http://e/x"])]


def test_rdf_list_roundtrip(spark):
    lists = spark.createDataFrame(
        LISTS, "list_id string, items array<string>")
    tri = emit_rdf_list(lists)
    # n firsts + n rests per list
    assert tri.count() == 2 * (3 + 1)
    decoded = decode_rdf_list(tri)
    heads = {r[0]: r[1] for r in
             lists.select(list_head(F.col("list_id")), "items").collect()}
    got = {r.head: r.items for r in decoded.collect()}
    assert got == heads
    # order preserved (no-reorder semantics for lists like
    # owl:propertyChainAxiom, serializers.py:160)
    l1_head = lists.select(list_head(F.col("list_id"))).collect()[0][0]
    assert got[l1_head] == ["http://e/a", "http://e/b", "http://e/c"]


def test_axiom_annotation_six_triples_and_roundtrip(spark):
    ax = spark.createDataFrame(
        [("http://e/s", "http://p/p", "http://e/o",
          "http://p/evidence", "strong")],
        "subj string, pred string, obj string, ann_pred string, "
        "ann_value string")
    tri = annotate_axioms(ax)
    assert tri.count() == 6  # golden count, test_core.py:5-21
    back = parse_axiom_annotations(tri).collect()
    assert len(back) == 1
    r = back[0]
    assert (r.subj, r.pred, r.obj, r.ann_pred, r.ann_value) == \
        ("http://e/s", "http://p/p", "http://e/o",
         "http://p/evidence", "strong")


PL_SPECS = [("http://e/A", ["http://e/x", "http://e/y", "http://e/z"]),
            ("http://e/B", ["http://e/q"])]


def _pl_df(spark):
    return spark.createDataFrame(PL_SPECS,
                                 "subj string, items array<string>")


def test_predicate_list_direct_roundtrip(spark):
    from pyontutils_spark.operators.combinators import (
        OWL_INTERSECTION_OF, emit_predicate_list, parse_predicate_list)
    specs = _pl_df(spark)
    tri = emit_predicate_list(specs, OWL_INTERSECTION_OF)
    # 1 link + (n firsts + n rests) per list
    assert tri.count() == (1 + 2 * 3) + (1 + 2 * 1)
    got = {r.subj: r.items
           for r in parse_predicate_list(tri, OWL_INTERSECTION_OF).collect()}
    assert got == dict(PL_SPECS)
    # partitioning-invariant emission (deterministic skolems)
    t2 = {tuple(r) for r in
          emit_predicate_list(specs.repartition(5),
                              OWL_INTERSECTION_OF).collect()}
    assert t2 == {tuple(r) for r in tri.collect()}


def test_property_chain_preserves_order(spark):
    """propertyChainAxiom is the no-reorder list (ttlser
    serializers.py:660-673) — items must come back in emission order."""
    from pyontutils_spark.operators.combinators import (
        OWL_PROPERTY_CHAIN, emit_predicate_list, parse_predicate_list)
    chain = [("http://e/P", ["http://p/c", "http://p/a", "http://p/b"])]
    specs = spark.createDataFrame(chain, "subj string, items array<string>")
    tri = emit_predicate_list(specs, OWL_PROPERTY_CHAIN)
    got = parse_predicate_list(tri, OWL_PROPERTY_CHAIN).collect()
    assert got[0].items == ["http://p/c", "http://p/a", "http://p/b"]


def test_equivalent_class_expression_roundtrip(spark):
    from pyontutils_spark.operators.combinators import (
        OWL_CLASS, OWL_EQUIVALENT_CLASS, emit_equivalent_class,
        parse_equivalent_class)
    from pyontutils_spark.operators import vocab
    specs = _pl_df(spark)
    tri = emit_equivalent_class(specs)
    rows = {(r.subj, r.pred, r.obj) for r in tri.collect()}
    # subj equivalentClass node; node a owl:Class (typeWhenSubjectIsBlank)
    ec_nodes = {o for s, p, o in rows if p == OWL_EQUIVALENT_CLASS}
    assert len(ec_nodes) == 2
    for n in ec_nodes:
        assert (n, vocab.RDF_TYPE, OWL_CLASS) in rows
    got = {r.subj: r.items for r in parse_equivalent_class(tri).collect()}
    assert got == dict(PL_SPECS)


def test_predicate_lists_coexist_and_filter_by_predicate(spark):
    """Two different list predicates in one graph parse independently."""
    from pyontutils_spark.operators.combinators import (
        OWL_ONE_OF, OWL_UNION_OF, emit_predicate_list,
        parse_predicate_list)
    u = emit_predicate_list(_pl_df(spark), OWL_UNION_OF)
    o = emit_predicate_list(
        spark.createDataFrame([("http://e/C", ["http://e/m"])],
                              "subj string, items array<string>"),
        OWL_ONE_OF)
    both = u.unionByName(o)
    assert {r.subj for r in parse_predicate_list(both, OWL_UNION_OF)
            .collect()} == {"http://e/A", "http://e/B"}
    assert {r.subj for r in parse_predicate_list(both, OWL_ONE_OF)
            .collect()} == {"http://e/C"}
