"""SciGraph-JSON neighborhood export golden tests (reference
make_scigraph_json, pyontutils/core.py:805-886): direct mode, the
restriction-lift mode with someValuesFrom/allValuesFrom fallback,
skipped structural objects, deprecated meta, label fallback, and the
handoff into the tree renderer."""

from pyontutils_spark.kernel.ids import SKOLEM_NS
from pyontutils_spark.operators import vocab
from pyontutils_spark.operators.scigraph import make_scigraph_json

PART_OF = "http://purl.obolibrary.org/obo/BFO_0000050"
L1 = SKOLEM_NS + "linker1"
L2 = SKOLEM_NS + "linker2"
L3 = SKOLEM_NS + "linker3"


def _t(s, p, o, lit=False):
    return (s, p, o, lit, None, None)


def _restriction_fixture(spark):
    rows = [
        # sub1 subClassOf [onProperty partOf; someValuesFrom obj1]
        _t("http://e/sub1", vocab.RDFS_SUBCLASSOF, L1),
        _t(L1, "http://www.w3.org/2002/07/owl#onProperty", PART_OF),
        _t(L1, "http://www.w3.org/2002/07/owl#someValuesFrom",
           "http://e/obj1"),
        # sub2 subClassOf [onProperty partOf; allValuesFrom obj2]
        _t("http://e/sub2", vocab.RDFS_SUBCLASSOF, L2),
        _t(L2, "http://www.w3.org/2002/07/owl#onProperty", PART_OF),
        _t(L2, "http://www.w3.org/2002/07/owl#allValuesFrom",
           "http://e/obj2"),
        # structural (unionOf-style skolem) object: skipped like the
        # reference's URIRef check
        _t("http://e/sub3", vocab.RDFS_SUBCLASSOF, L3),
        _t(L3, "http://www.w3.org/2002/07/owl#onProperty", PART_OF),
        _t(L3, "http://www.w3.org/2002/07/owl#someValuesFrom",
           SKOLEM_NS + "union1"),
        # labels + deprecation
        _t("http://e/sub1", vocab.RDFS_LABEL, "sub one label", True),
        _t("http://e/obj1", vocab.RDFS_LABEL, "obj one label", True),
        _t("http://e/obj1", vocab.OWL_DEPRECATED, "true", True),
    ]
    return spark.createDataFrame(rows, vocab.TRIPLE_SCHEMA)


def test_restriction_mode_golden(spark):
    out = make_scigraph_json(_restriction_fixture(spark), PART_OF)
    assert out["edges"] == [
        {"sub": "http://e/sub1", "pred": PART_OF, "obj": "http://e/obj1"},
        {"sub": "http://e/sub2", "pred": PART_OF, "obj": "http://e/obj2"},
    ]
    assert out["nodes"] == [
        {"lbl": "sub one label", "id": "http://e/sub1", "meta": {}},
        {"lbl": "obj one label", "id": "http://e/obj1",
         "meta": {vocab.OWL_DEPRECATED: True}},
        {"lbl": "http://e/sub2", "id": "http://e/sub2", "meta": {}},
        {"lbl": "http://e/obj2", "id": "http://e/obj2", "meta": {}},
    ]


def test_direct_mode_with_curie_edge_and_qnames(spark):
    rows = [
        _t("http://www.w3.org/2002/07/owl#Sub",
           vocab.RDFS_SUBCLASSOF, "http://www.w3.org/2002/07/owl#Sup"),
        _t("http://www.w3.org/2002/07/owl#Sub", vocab.RDFS_LABEL,
           "the sub", True),
        # literal object on the edge predicate: ignored in direct mode
        _t("http://e/x", vocab.RDFS_SUBCLASSOF, "not a node", True),
    ]
    tdf = spark.createDataFrame(rows, vocab.TRIPLE_SCHEMA)
    out = make_scigraph_json(tdf, "rdfs:subClassOf", direct=True)
    # pred carries the CALLER's spelling; ids are qnames
    assert out["edges"] == [
        {"sub": "owl:Sub", "pred": "rdfs:subClassOf", "obj": "owl:Sup"}]
    assert out["nodes"] == [
        {"lbl": "the sub", "id": "owl:Sub", "meta": {}},
        {"lbl": "http://www.w3.org/2002/07/owl#Sup", "id": "owl:Sup",
         "meta": {}},
    ]


def test_deterministic_under_repartition(spark):
    tdf = _restriction_fixture(spark)
    a = make_scigraph_json(tdf, PART_OF)
    b = make_scigraph_json(tdf.repartition(7), PART_OF)
    assert a == b


def test_max_rows_guard(spark):
    """Corpus-scale neighborhoods must raise instead of collecting an
    unbounded edge set to the driver."""
    import pytest
    tdf = _restriction_fixture(spark)
    with pytest.raises(ValueError, match="max_rows"):
        make_scigraph_json(tdf, PART_OF, max_rows=1)
    # a sufficient limit still works
    out = make_scigraph_json(tdf, PART_OF, max_rows=2)
    assert len(out["edges"]) == 2


def test_feeds_tree_renderer(spark):
    """The exported edges drive render_tree exactly like the reference's
    tree-checking path consumes make_scigraph_json output."""
    from pyontutils_spark.operators.tree import render_tree
    out = make_scigraph_json(_restriction_fixture(spark), PART_OF)
    edges = [(e["sub"], e["obj"]) for e in out["edges"]]
    lbl = {n["id"]: n["lbl"] for n in out["nodes"]}
    txt = render_tree(edges, "http://e/obj1", label=lbl)
    assert "obj one label" in txt and "sub one label" in txt
