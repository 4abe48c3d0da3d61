"""RDF-XML + JSON-LD writers: exact round-trip through the engine's
own parsers over the full nasty.ttl adversarial graph (the reference's
serializer torture fixture), plus edge-case vectors and the ttlfmt
output-format switch (closing the write-side format gap vs the
reference's rdflib serialize, ttlser/ttlfmt.py:78-100)."""

import json

import pytest

from pyontutils_spark.kernel.jsonld import parse_jsonld, serialize_jsonld
from pyontutils_spark.kernel.rdfxml import (
    RdfXmlError, parse_rdfxml, serialize_rdfxml)

NASTY = "/root/reference/ttlser/test/nasty.ttl"


@pytest.fixture(scope="module")
def nasty_rows():
    from pyontutils_spark.kernel.ttl import parse_turtle_document
    with open(NASTY) as f:
        src = f.read()
    rows, _prefixes, _base = parse_turtle_document(src, NASTY)
    return set(map(tuple, rows))


EDGE_ROWS = [
    ("http://e/s", "http://p/plain", "plain text", True, None, None),
    ("http://e/s", "http://p/lang", "tagged", True, None, "en-GB"),
    ("http://e/s", "http://p/dt", "5",
     True, "http://www.w3.org/2001/XMLSchema#integer", None),
    ("http://e/s", "http://p/empty", "", True, None, None),
    ("http://e/s", "http://p/markup", '<b>&"bold"</b>', True, None, None),
    ("http://e/s", "http://p/ws", "  leading\nand trailing  ",
     True, None, None),
    ("http://e/s", "http://p/cr", "carriage\rreturn", True, None, None),
    ("http://e/s", "http://p#frag", "http://e/o", False, None, None),
    ("http://e/o", "http://p/rel", "http://e/s", False, None, None),
]


def test_rdfxml_roundtrip_nasty(nasty_rows):
    text = serialize_rdfxml(nasty_rows)
    assert set(map(tuple, parse_rdfxml(text))) == nasty_rows


def test_jsonld_roundtrip_nasty(nasty_rows):
    text = serialize_jsonld(nasty_rows)
    assert set(map(tuple, parse_jsonld(text))) == nasty_rows


def test_rdfxml_roundtrip_edges():
    text = serialize_rdfxml(EDGE_ROWS)
    assert set(map(tuple, parse_rdfxml(text))) == set(EDGE_ROWS)


def test_jsonld_roundtrip_edges():
    text = serialize_jsonld(EDGE_ROWS)
    assert set(map(tuple, parse_jsonld(text))) == set(EDGE_ROWS)


def test_rdfxml_deterministic_and_prefixed():
    a = serialize_rdfxml(EDGE_ROWS)
    b = serialize_rdfxml(list(reversed(EDGE_ROWS)))
    assert a == b
    # preferred prefixes adopted when provided
    c = serialize_rdfxml(EDGE_ROWS, {"p": "http://p/"})
    assert "xmlns:p=" in c and "<p:plain" in c
    assert set(map(tuple, parse_rdfxml(c))) == set(EDGE_ROWS)


def test_jsonld_deterministic_expanded():
    a = serialize_jsonld(EDGE_ROWS)
    assert a == serialize_jsonld(list(reversed(EDGE_ROWS)))
    doc = json.loads(a)
    assert set(doc) == {"@graph"}  # expanded form: no @context


def test_rdfxml_unsplittable_predicate_raises():
    with pytest.raises(RdfXmlError, match="local name"):
        serialize_rdfxml([("http://e/s", "http://p/ends/in/slash/",
                           "x", True, None, None)])


def test_bnode_label_rows_emit_nodeid():
    rows = [("_:b1", "http://p/x", "_:b2", False, None, None)]
    text = serialize_rdfxml(rows)
    assert 'rdf:nodeID="b1"' in text and 'rdf:nodeID="b2"' in text
    back = parse_rdfxml(text)
    # re-parse re-labels (skolemizes) — structure preserved
    assert len(back) == 1 and back[0][1] == "http://p/x"


def test_spark_writers_and_ttlfmt_switch(spark, tmp_path):
    from pyontutils_spark.operators import vocab
    from pyontutils_spark.plans.tools import ttlfmt
    from pyontutils_spark.sources.rdf import (
        write_jsonld_string, write_rdfxml_string)
    rows = [
        ("http://e/b", vocab.RDF_TYPE, vocab.OWL_CLASS, False, None, None),
        ("http://e/b", vocab.RDFS_LABEL, "thing b", True, None, None),
        ("http://e/a9", vocab.RDFS_LABEL, "tagged", True, None, "en"),
    ]
    tdf = spark.createDataFrame(rows, vocab.TRIPLE_SCHEMA)
    xml = write_rdfxml_string(tdf)
    assert set(map(tuple, parse_rdfxml(xml))) == set(rows)
    jld = write_jsonld_string(tdf)
    assert set(map(tuple, parse_jsonld(jld))) == set(rows)
    # ttlfmt converts a turtle file to both formats (and re-reads them)
    src = tmp_path / "in.ttl"
    src.write_text(
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "<http://e/b> a owl:Class ; rdfs:label \"thing b\" .\n")
    out_xml = ttlfmt(spark, str(src), str(tmp_path / "out.rdf"),
                     out_format="rdfxml")
    assert "<rdf:RDF" in out_xml
    out_jld = ttlfmt(spark, str(src), str(tmp_path / "out.jsonld"),
                     out_format="json-ld")
    assert "@graph" in out_jld
    with pytest.raises(ValueError, match="unknown out_format"):
        ttlfmt(spark, str(src), out_format="bogus")
