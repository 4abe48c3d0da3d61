"""TriG reader/writer: named-graph Turtle (the document analog of
N-Quads), closing the last read/write format gap vs the reference's
any-rdflib-format ``ttlfmt`` (ttlser/ttlfmt.py:78-100; rdflib ships
trig).  Kernel grammar + skolemization tests, the Turtle-superset
property over the reference's nasty.ttl torture fixture, exact
round-trip through the engine's own parser, and the Spark
read/write/dispatch surfaces."""

import pytest

from pyontutils_spark.kernel.curies import DEFAULT
from pyontutils_spark.kernel.trig import (
    parse_trig, parse_trig_document, serialize_trig)
from pyontutils_spark.kernel.ttl import TurtleError, parse_turtle

NASTY = "/root/reference/ttlser/test/nasty.ttl"

DOC = """@prefix ex: <http://example.org/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .

ex:a rdfs:label "default graph"@en .

GRAPH ex:g1 {
  ex:b a ex:Thing ;
       rdfs:label "b" .
  ex:c ex:p 3.14
}

ex:g2 { ex:d ex:p "x\\n" ; ex:q true . }

{ ex:e ex:p ex:f . }

graph _:gb { _:n1 ex:p [ ex:q "nested" ] . _:gb ex:self true }
"""

EX = "http://example.org/"


@pytest.fixture(scope="module")
def doc_quads():
    return parse_trig(DOC, "test.trig")


def test_graph_contexts(doc_quads):
    by_graph = {}
    for q in doc_quads:
        by_graph.setdefault(q[6], []).append(q)
    named = {g for g in by_graph if g and g.startswith(EX)}
    assert named == {EX + "g1", EX + "g2"}
    # default graph collects bare triples AND the anonymous { } block
    objs = {q[2] for q in by_graph[None]}
    assert "default graph" in objs and EX + "f" in objs
    assert len(by_graph[EX + "g1"]) == 3  # ';' chain + optional final .
    assert len(by_graph[EX + "g2"]) == 2


def test_bnode_graph_label_skolemized_consistently(doc_quads):
    skolem_graphs = [g for g in {q[6] for q in doc_quads}
                     if g and not g.startswith(EX)]
    assert len(skolem_graphs) == 1
    (gb,) = skolem_graphs
    # _:gb used as graph label AND as a subject inside its own block
    # resolves to the same skolem IRI
    assert any(q[0] == gb and q[1] == EX + "self" for q in doc_quads)


def test_graph_keyword_case_insensitive():
    for kw in ("GRAPH", "graph", "Graph"):
        q = parse_trig(
            f'{kw} <http://g/> {{ <http://s> <http://p> <http://o> . }}',
            "k")
        assert q == [("http://s", "http://p", "http://o",
                      False, None, None, "http://g/")]


def test_turtle_superset_nasty():
    with open(NASTY) as f:
        src = f.read()
    triples = parse_turtle(src, "nasty")
    quads = parse_trig(src, "nasty")
    assert [q[:6] for q in quads] == triples
    assert all(q[6] is None for q in quads)


def test_roundtrip_exact(doc_quads):
    text = serialize_trig(doc_quads, DEFAULT)
    assert set(parse_trig(text, "test.trig")) == set(
        map(tuple, doc_quads))


def test_roundtrip_nasty_in_named_graph():
    with open(NASTY) as f:
        src = f.read()
    quads = [t + ("http://g/nasty",) for t in parse_turtle(src, "nasty")]
    text = serialize_trig(quads, DEFAULT)
    assert set(parse_trig(text, "nasty")) == set(map(tuple, quads))


def test_serialize_deterministic(doc_quads):
    a = serialize_trig(doc_quads, DEFAULT)
    b = serialize_trig(list(reversed(doc_quads)), DEFAULT)
    assert a == b


def test_document_prefixes():
    _quads, prefixes, _base = parse_trig_document(DOC, "test.trig")
    assert prefixes["ex"] == EX


def test_unterminated_block_raises():
    with pytest.raises(TurtleError, match="unterminated graph block"):
        parse_trig("<http://g> { <http://s> <http://p> <http://o> .", "k")


def test_spark_read_write_and_dispatch(spark, tmp_path):
    from pyontutils_spark.plans.tools import ttlfmt
    from pyontutils_spark.sources.rdf import (
        read_rdf, read_trig, write_trig_string)
    p1 = tmp_path / "a.trig"
    p1.write_text(DOC)
    p2 = tmp_path / "b.trig"
    p2.write_text('<http://g9/> { <http://s9> <http://p9> "v9" . }\n')
    df = read_trig(spark, str(tmp_path / "*.trig"))
    assert df.columns == ["subj", "pred", "obj", "obj_is_literal",
                          "obj_datatype", "obj_lang", "src_graph"]
    rows = {tuple(r) for r in df.collect()}
    want = {tuple(q) for q in parse_trig(DOC, "file://" + str(p1))} | {
        ("http://s9", "http://p9", "v9", True, None, None, "http://g9/")}
    assert rows == want
    # extension dispatch keeps the graph column
    assert "src_graph" in read_rdf(spark, str(p2)).columns
    # Spark-side writer round-trips through the kernel parser
    text = write_trig_string(df)
    assert {q[:3] + q[6:] for q in parse_trig(text, "rt")} == {
        r[:3] + r[6:] for r in rows}
    out = ttlfmt(spark, str(p2), str(tmp_path / "out.trig"),
                 out_format="trig")
    assert "{" in out and "<http://s9>" in out
