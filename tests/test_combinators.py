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
