"""Turtle parser: grammar coverage on a nasty.ttl-style fixture
(ttlser/test/nasty.ttl shapes), writer->parser round-trip, Spark source
read, and ttlfmt-style format fallback dispatch."""

import pytest
from pyspark.sql import functions as F

from pyontutils_spark.kernel.curies import PrefixMap
from pyontutils_spark.kernel.ttl import TurtleError, parse_turtle
from pyontutils_spark.operators import vocab
from pyontutils_spark.operators.combinators import (
    RDF_FIRST, RDF_NIL)
from pyontutils_spark.sources.rdf import (
    read_rdf, read_turtle, write_ntriples, write_turtle_string)

NASTY_TTL = """
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://ex.org/> .
@base <http://base.org/dir/> .
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>

# comment line
ex:a10 a owl:Class ;
    rdfs:label "thing one", "chose une"@fr ;
    ex:count 42 ;
    ex:score 2.5 ;
    ex:big 1.5e10 ;
    ex:flag true ;
    ex:typed "2020-01-01"^^xsd:date ;
    ex:rel <relative/path> ;
    ex:esc "has \\"quotes\\" and \\\\slash\\n" .

ex:b ex:list ( ex:x 1 "two" ) ;
    ex:empty () ;
    ex:anon [ a owl:Restriction ; owl:onProperty ex:p ] .

_:lbl ex:p ex:a10 .
[] ex:standalone "v" .
ex:weird.name ex:p ex:other .
ex:c rdfs:comment \"\"\"multi
line "q" string\"\"\" .
"""


def test_parse_nasty_fixture_shapes():
    ts = parse_turtle(NASTY_TTL, "doc1")
    by = {}
    for s, p, o, il, dt, lg in ts:
        by.setdefault((s, p), []).append((o, il, dt, lg))
    a10 = "http://ex.org/a10"
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert (vocab.OWL_CLASS, False, None, None) in by[(a10, vocab.RDF_TYPE)]
    labels = by[(a10, "http://www.w3.org/2000/01/rdf-schema#label")]
    assert ("thing one", True, None, None) in labels
    assert ("chose une", True, None, "fr") in labels
    assert by[(a10, "http://ex.org/count")] == \
        [("42", True, xsd + "integer", None)]
    assert by[(a10, "http://ex.org/score")] == \
        [("2.5", True, xsd + "decimal", None)]
    assert by[(a10, "http://ex.org/big")] == \
        [("1.5e10", True, xsd + "double", None)]
    assert by[(a10, "http://ex.org/flag")] == \
        [("true", True, xsd + "boolean", None)]
    # @base resolution of a relative IRI
    assert by[(a10, "http://ex.org/rel")] == \
        [("http://base.org/dir/relative/path", False, None, None)]
    # escape handling
    assert by[(a10, "http://ex.org/esc")] == \
        [('has "quotes" and \\slash\n', True, None, None)]
    # collection decodes to first/rest cells ending in nil; empty -> nil
    firsts = [o for (s, p), objs in by.items() if p == RDF_FIRST
              for o, *_ in objs]
    assert "http://ex.org/x" in firsts and "1" in firsts and "two" in firsts
    assert by[("http://ex.org/b", "http://ex.org/empty")] == \
        [(RDF_NIL, False, None, None)]
    # bnodes are skolemized deterministically per document
    lbl_subjs = [s for s, p, *_ in ts if p == "http://ex.org/p"
                 and "skolem/ttl/" in s]
    assert lbl_subjs and parse_turtle(NASTY_TTL, "doc1") == ts
    # dot inside a pname local survives; trailing dot terminates
    assert ("http://ex.org/weird.name", "http://ex.org/p",
            "http://ex.org/other", False, None, None) in ts
    # multiline literal
    assert ("http://ex.org/c", "http://www.w3.org/2000/01/rdf-schema#comment",
            'multi\nline "q" string', True, None, None) in ts


def test_parse_errors_raise():
    with pytest.raises(TurtleError):
        parse_turtle("ex:a ex:b ex:c .", "d")  # undefined prefix
    with pytest.raises(TurtleError):
        parse_turtle("@prefix ex: <http://e/> .\nex:a ex:b", "d")  # no dot


TRIPLES = [
    ("http://e/b", vocab.RDF_TYPE, vocab.OWL_CLASS, False, None, None),
    ("http://e/b", vocab.RDFS_LABEL, "thing b", True, None, None),
    ("http://e/a10", vocab.RDFS_LABEL, 'has "quotes" and \\slash', True,
     None, None),
    ("http://e/a9", vocab.RDFS_LABEL, "tagged", True, None, "en"),
    ("http://e/a9", vocab.RDFS_SUBCLASSOF, "http://e/b", False, None, None),
]


def test_writer_parser_roundtrip(spark):
    """write_turtle_string -> parse_turtle recovers the exact triple set
    (the ttlfmt round-trip property, ttlser/ttlfmt.py:78-100)."""
    tdf = spark.createDataFrame(TRIPLES, vocab.TRIPLE_SCHEMA)
    ttl = write_turtle_string(tdf, PrefixMap())
    back = set(parse_turtle(ttl, "rt"))
    assert back == set(TRIPLES)


def test_read_turtle_spark_source(spark, tmp_path):
    tdf = spark.createDataFrame(TRIPLES, vocab.TRIPLE_SCHEMA)
    p = tmp_path / "g.ttl"
    p.write_text(write_turtle_string(tdf, PrefixMap()))
    got = {tuple(r) for r in read_turtle(spark, str(p)).collect()}
    assert got == set(TRIPLES)


def test_read_rdf_dispatch_and_fallback(spark, tmp_path):
    tdf = spark.createDataFrame(TRIPLES, vocab.TRIPLE_SCHEMA)
    ttl_p = tmp_path / "g.ttl"
    ttl_p.write_text(write_turtle_string(tdf, PrefixMap()))
    nt_dir = str(tmp_path / "g.nt")
    write_ntriples(tdf, nt_dir)
    by_ext = {tuple(r) for r in read_rdf(spark, str(ttl_p)).collect()}
    assert by_ext == set(TRIPLES)
    nt = {tuple(r) for r in read_rdf(spark, nt_dir).collect()}
    assert nt == set(TRIPLES)
    # extensionless turtle file -> fallback chain must still parse it
    noext = tmp_path / "mystery"
    noext.write_text(ttl_p.read_text())
    assert {tuple(r) for r in read_rdf(spark, str(noext)).collect()} \
        == set(TRIPLES)


RDFXML_DOC = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:ex="http://ex.org/">
  <owl:Class rdf:about="http://e/b">
    <rdfs:label>thing b</rdfs:label>
    <rdfs:label xml:lang="en">tagged</rdfs:label>
    <ex:n rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">5</ex:n>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://e/p"/>
      </owl:Restriction>
    </rdfs:subClassOf>
    <ex:members rdf:parseType="Collection">
      <rdf:Description rdf:about="http://e/m1"/>
      <rdf:Description rdf:about="http://e/m2"/>
    </ex:members>
  </owl:Class>
</rdf:RDF>"""

JSONLD_DOC = """{
  "@context": {"rdfs": "http://www.w3.org/2000/01/rdf-schema#",
               "owl": "http://www.w3.org/2002/07/owl#",
               "e": "http://e/",
               "sub": {"@id": "http://www.w3.org/2000/01/rdf-schema#subClassOf",
                       "@type": "@id"}},
  "@graph": [{"@id": "e:b", "@type": "owl:Class",
              "rdfs:label": ["thing b",
                             {"@value": "tagged", "@language": "en"}],
              "sub": "e:a"}]
}"""


def test_parse_rdfxml_shapes():
    from pyontutils_spark.kernel.rdfxml import RdfXmlError, parse_rdfxml
    ts = parse_rdfxml(RDFXML_DOC, "d")
    got = {(s, p, o, il, dt, lg) for s, p, o, il, dt, lg in ts}
    assert ("http://e/b", vocab.RDF_TYPE, vocab.OWL_CLASS,
            False, None, None) in got
    assert ("http://e/b", vocab.RDFS_LABEL, "thing b",
            True, None, None) in got
    assert ("http://e/b", vocab.RDFS_LABEL, "tagged",
            True, None, "en") in got
    assert ("http://e/b", "http://ex.org/n", "5", True,
            "http://www.w3.org/2001/XMLSchema#integer", None) in got
    # nested restriction node is skolemized and typed
    restr = [s for s, p, o, *_ in ts
             if p == vocab.RDF_TYPE and o.endswith("Restriction")]
    assert restr and "skolem/xml/" in restr[0]
    # collection decodes to a first/rest chain ending in nil
    firsts = [o for s, p, o, *_ in ts if p == RDF_FIRST]
    assert firsts == ["http://e/m1", "http://e/m2"]
    assert parse_rdfxml(RDFXML_DOC, "d") == ts  # deterministic
    with pytest.raises(RdfXmlError):
        parse_rdfxml("not xml", "d")


def test_parse_jsonld_shapes():
    from pyontutils_spark.kernel.jsonld import JsonLdError, parse_jsonld
    ts = parse_jsonld(JSONLD_DOC, "d")
    got = {(s, p, o, il, lg) for s, p, o, il, dt, lg in ts}
    assert ("http://e/b", vocab.RDF_TYPE, vocab.OWL_CLASS,
            False, None) in got
    assert ("http://e/b", vocab.RDFS_LABEL, "thing b", True, None) in got
    assert ("http://e/b", vocab.RDFS_LABEL, "tagged", True, "en") in got
    assert ("http://e/b", vocab.RDFS_SUBCLASSOF, "http://e/a",
            False, None) in got
    with pytest.raises(JsonLdError):
        parse_jsonld('{"@context": "http://remote.ctx"}', "d")


def test_read_rdf_all_formats_one_triple_set(spark, tmp_path):
    """The same graph in ttl / nt / rdf-xml / json-ld reads back
    identically through read_rdf (the ttlfmt format-equivalence
    property)."""
    tdf = spark.createDataFrame(TRIPLES, vocab.TRIPLE_SCHEMA)
    ttl_p = tmp_path / "g.ttl"
    ttl_p.write_text(write_turtle_string(tdf, PrefixMap()))
    expected = set(TRIPLES)
    xml_p = tmp_path / "g.owl"
    xml_p.write_text(RDFXML_DOC)
    json_p = tmp_path / "g.jsonld"
    json_p.write_text(JSONLD_DOC)
    ttl = {tuple(r) for r in read_rdf(spark, str(ttl_p)).collect()}
    assert ttl == expected
    xml_got = {(r.subj, r.pred, r.obj) for r in
               read_rdf(spark, str(xml_p)).collect()}
    assert ("http://e/b", vocab.RDFS_LABEL, "thing b") in xml_got
    js_got = {(r.subj, r.pred, r.obj) for r in
              read_rdf(spark, str(json_p)).collect()}
    assert ("http://e/b", vocab.RDFS_SUBCLASSOF, "http://e/a") in js_got
    # extensionless rdf-xml exercises the full 4-format fallback chain;
    # skolem IRIs embed the source path (deterministic per document), so
    # normalize the doc hash away before comparing across files
    import re as _re

    def norm(rows):
        return {tuple(_re.sub(r"skolem/xml/[0-9a-f]+/", "skolem/xml/D/",
                              x) for x in r) for r in rows}
    noext = tmp_path / "mystery_xml"
    noext.write_text(RDFXML_DOC)
    fb = {(r.subj, r.pred, r.obj) for r in
          read_rdf(spark, str(noext)).collect()}
    assert norm(fb) == norm(xml_got)


def test_sparql_style_decl_whitespace_and_empty_prefix():
    """PREFIX/BASE followed by tab/newline (any whitespace) and the
    empty-prefix form ':local' are valid Turtle."""
    ts = parse_turtle(
        "PREFIX\tex: <http://e/>\nBASE\n<http://b/>\nex:a ex:p <rel> .",
        "d")
    assert ts == [("http://e/a", "http://e/p", "http://b/rel",
                   False, None, None)]
    ts2 = parse_turtle("@prefix : <http://d/> .\n:a :p :o .", "d")
    assert ts2 == [("http://d/a", "http://d/p", "http://d/o",
                    False, None, None)]


def test_review_fixes_parsers():
    """Round-2 review regressions: bnode trailing dot, relative IRI
    with '?', JSON-LD native @value types, term-def without @id."""
    from pyontutils_spark.kernel.jsonld import JsonLdError, parse_jsonld
    # bnode immediately followed by the statement terminator
    ts = parse_turtle("@prefix ex: <http://e/> .\nex:s ex:p _:b1.", "d")
    assert len(ts) == 1 and "skolem" in ts[0][2]
    # relative IRI containing ':' after '?' still resolves against base
    ts2 = parse_turtle("@base <http://e/> .\n<s> <p> <foo?x:y> .", "d")
    assert ts2[0][2] == "http://e/foo?x:y"
    # @value-wrapped natives == bare natives (lexical + datatype)
    doc = ('{"@context": {"ex": "http://e/"}, "@id": "ex:s", '
           '"ex:a": {"@value": true}, "ex:b": true, '
           '"ex:c": {"@value": 7}, "ex:d": 7}')
    ts3 = parse_jsonld(doc, "d")
    vals = {p: (o, dt) for s, p, o, il, dt, lg in ts3}
    assert vals["http://e/a"] == vals["http://e/b"] == \
        ("true", "http://www.w3.org/2001/XMLSchema#boolean")
    assert vals["http://e/c"] == vals["http://e/d"] == \
        ("7", "http://www.w3.org/2001/XMLSchema#integer")
    # context term definition without @id -> declared error type
    import pytest as _pt
    with _pt.raises(JsonLdError):
        parse_jsonld('{"@context": {"foo": {"@type": "@id"}}, '
                     '"@id": "http://e/s", "foo": "http://e/o"}', "d")
    # skolem namespace is the shared kernel constant
    from pyontutils_spark.kernel.ids import SKOLEM_NS
    assert ts[0][2].startswith(SKOLEM_NS)


def test_ttlfmt_idempotent(spark, tmp_path):
    """The defining ttlfmt property: canonicalizing a canonical file is
    a byte-level no-op (ttlser's round-trip discipline)."""
    from pyontutils_spark.plans.tools import ttlfmt
    src = tmp_path / "in.ttl"
    src.write_text(NASTY_TTL)
    once_p = tmp_path / "once.ttl"
    once = ttlfmt(spark, str(src), str(once_p))
    twice = ttlfmt(spark, str(once_p))
    assert once == twice
    assert once_p.read_text() == once
    # prefix block is culled + sorted (only used prefixes appear)
    header = [line for line in once.splitlines()
              if line.startswith("@prefix")]
    assert header == sorted(header)
    # nt output path
    nt_dir = str(tmp_path / "out.nt")
    assert ttlfmt(spark, str(src), nt_dir, out_format="nt") == nt_dir
    from pyontutils_spark.sources.rdf import read_ntriples
    assert read_ntriples(spark, nt_dir).count() > 0


def test_doubled_semicolons_legal():
    """predicateObjectList allows empty items between ';' — doubled
    (and tripled) semicolons parse."""
    from pyontutils_spark.kernel.ttl import parse_turtle
    text = ("@prefix ex: <http://ex.org/> .\n"
            "ex:s ex:p ex:o ;; ex:p2 ex:o2 ;;; ex:p3 ex:o3 .\n")
    rows = parse_turtle(text)
    preds = sorted(r[1] for r in rows)
    assert preds == ["http://ex.org/p", "http://ex.org/p2",
                     "http://ex.org/p3"]


def test_extract_ontology_header_bounded():
    """Header scan parses only the directive block + ontology stanza."""
    from pyontutils_spark.kernel.ttl import (
        extract_ontology_header, parse_turtle_header)
    text = ("@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
            "@prefix ex: <http://ex.org/> .\n"
            "ex:ont a owl:Ontology ;\n"
            "    owl:imports ex:other .\n"
            "ex:body a owl:Class .\n" * 1000)
    header = extract_ontology_header(text)
    assert header.endswith("owl:imports ex:other .")
    assert "ex:body" not in header
    rows = parse_turtle_header(text)
    subjects = {r[0] for r in rows}
    assert subjects == {"http://ex.org/ont"}
    preds = {r[1] for r in rows}
    assert "http://www.w3.org/2002/07/owl#imports" in preds
    # no ontology header -> empty
    assert parse_turtle_header("@prefix ex: <http://e/> .\n"
                               "ex:a ex:p ex:b .\n") == []


def test_read_ontology_headers_source(spark, tmp_path):
    from pyontutils_spark.sources.rdf import read_ontology_headers
    (tmp_path / "a.ttl").write_text(
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
        "@prefix ex: <http://ex.org/> .\n"
        "ex:onta a owl:Ontology .\n"
        "ex:classa a owl:Class .\n")
    (tmp_path / "b.ttl").write_text(
        "@prefix ex: <http://ex.org/> .\n"
        "ex:noheader ex:p ex:q .\n")
    rows = read_ontology_headers(spark, str(tmp_path)).collect()
    assert {r.subj for r in rows} == {"http://ex.org/onta"}


def test_ontology_section_rewrite(spark, tmp_path):
    """ontologySection (ontutils.py:93-113): edit only the part before
    the first '###'; the rest of the file is byte-untouched."""
    from pyontutils_spark.plans.tools import ontology_section, ttlfmt
    src = tmp_path / "o.ttl"
    src.write_text(
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
        "@prefix ex: <http://ex.org/> .\n"
        "ex:ont a owl:Ontology .\n"
        "ex:c a owl:Class ;\n"
        "    ex:p \"body stays\" .\n")
    ttlfmt(spark, str(src), str(src))  # nifttl layout with ### sections
    before = src.read_text()
    rest_before = before.split("###", 1)[1]
    with ontology_section(str(src)) as sec:
        sec.rows.append((
            "http://ex.org/ont",
            "http://www.w3.org/2002/07/owl#versionInfo",
            "v2", True, None, None))
    after = src.read_text()
    assert 'owl:versionInfo "v2"' in after.split("###", 1)[0]
    assert after.split("###", 1)[1] == rest_before
    # and it still parses as one document
    from pyontutils_spark.kernel.ttl import parse_turtle
    assert any(p.endswith("versionInfo") for _, p, *_ in
               parse_turtle(after))


def test_ontology_section_no_separator(tmp_path):
    """A file without the '###' section comment must fail with a
    descriptive error, not a bare unpack ValueError."""
    from pyontutils_spark.plans.tools import ontology_section
    p = tmp_path / "nosec.ttl"
    p.write_text("@prefix : <http://x/> .\n:a :b :c .\n")
    with pytest.raises(ValueError, match="section separator"):
        ontology_section(str(p))
