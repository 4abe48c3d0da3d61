"""Pure-kernel tests: N-Triples parse/format round-trip, canonical
turtle formatting, OBO stanza parse -> triples -> format round-trip."""

from pyontutils_spark.kernel.curies import PrefixMap
from pyontutils_spark.kernel.obo import (
    format_obo_stanza, id_fix, parse_obo, stanza_triples)
from pyontutils_spark.kernel.rdfio import (
    format_ntriple, format_turtle, parse_ntriple)


def test_ntriples_roundtrip():
    cases = [
        ("http://a/s", "http://a/p", "http://a/o", False, None, None),
        ("http://a/s", "http://a/p", "plain lit", True, None, None),
        ("http://a/s", "http://a/p", "typed",
         True, "http://www.w3.org/2001/XMLSchema#string", None),
        ("http://a/s", "http://a/p", "tagged", True, None, "en"),
        ("http://a/s", "http://a/p", 'quotes " and \\ and\nnewline',
         True, None, None),
    ]
    for t in cases:
        line = format_ntriple(*t)
        assert parse_ntriple(line) == t, line


def test_ntriples_parse_edge_cases():
    assert parse_ntriple("") is None
    assert parse_ntriple("# comment") is None
    assert parse_ntriple("not a triple") is None
    got = parse_ntriple(
        '<http://a/s> <http://a/p> "hi"@en-GB .')
    assert got == ("http://a/s", "http://a/p", "hi", True, None, "en-GB")


def test_turtle_canonical_format():
    pm = PrefixMap({"ex": "http://e/", "rdf":
                    "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
                    "owl": "http://www.w3.org/2002/07/owl#"})
    triples = [
        ("http://e/a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://www.w3.org/2002/07/owl#Class", False, None, None),
        ("http://e/a", "http://e/label", "A thing", True, None, None),
        ("http://e/a", "http://e/label", "Second label", True, None, None),
        ("http://e/b", "http://e/label", "B", True, None, "en"),
    ]
    ttl = format_turtle(triples, pm)
    assert "@prefix ex: <http://e/> ." in ttl
    assert "@prefix owl: <http://www.w3.org/2002/07/owl#> ." in ttl
    assert "ex:a\n    a owl:Class" in ttl
    assert 'ex:label "A thing",\n        "Second label" .' in ttl
    assert '"B"@en' in ttl
    # deterministic: same input -> same bytes
    assert format_turtle(triples, pm) == ttl


OBO = """format-version: 1.2
ontology: test

[Term]
id: GO:0000001
name: mitochondrion inheritance
namespace: biological_process
def: "The distribution of mitochondria." [GOC:mcc]
synonym: "mitochondrial inheritance" EXACT []
is_a: GO:0048308 ! organelle inheritance
xref: Wikipedia:Mito

[Term]
id: GO:0000002
name: obsolete thing
is_obsolete: true
replaced_by: GO:0000001

[Typedef]
id: part_of
name: part of
"""


def test_obo_parse():
    doc = parse_obo(OBO)
    assert doc["header"]["format-version"] == ["1.2"]
    assert len(doc["stanzas"]) == 3
    t1 = doc["stanzas"][0]
    assert t1["id"] == ["GO:0000001"]
    assert t1["is_a"] == ["GO:0048308"]


def test_obo_id_fix():
    assert id_fix("GO:0000001") == "http://purl.obolibrary.org/obo/GO_0000001"
    assert id_fix("http://x/y") == "http://x/y"


def test_obo_stanza_triples():
    doc = parse_obo(OBO)
    t1 = set(stanza_triples(doc["stanzas"][0]))
    subj = "http://purl.obolibrary.org/obo/GO_0000001"
    assert (subj, "http://www.w3.org/2000/01/rdf-schema#label",
            "mitochondrion inheritance", True) in t1
    assert (subj, "http://www.w3.org/2000/01/rdf-schema#subClassOf",
            "http://purl.obolibrary.org/obo/GO_0048308", False) in t1
    assert (subj,
            "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym",
            "mitochondrial inheritance", True) in t1
    assert (subj, "http://purl.obolibrary.org/obo/IAO_0000115",
            "The distribution of mitochondria.", True) in t1
    t2 = set(stanza_triples(doc["stanzas"][1]))
    assert ("http://purl.obolibrary.org/obo/GO_0000002",
            "http://www.w3.org/2002/07/owl#deprecated", "true", True) in t2
    assert ("http://purl.obolibrary.org/obo/GO_0000002",
            "http://purl.obolibrary.org/obo/IAO_0100001",
            "http://purl.obolibrary.org/obo/GO_0000001", False) in t2
    t3 = set(stanza_triples(doc["stanzas"][2]))
    assert ("http://purl.obolibrary.org/obo/part_of",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://www.w3.org/2002/07/owl#ObjectProperty", False) in t3


def test_obo_format_roundtrip():
    doc = parse_obo(OBO)
    text = format_obo_stanza(doc["stanzas"][0])
    re1 = parse_obo(text)["stanzas"][0]
    assert re1["id"] == ["GO:0000001"]
    assert re1["is_a"] == ["GO:0048308"]
    assert re1 == {k: v for k, v in doc["stanzas"][0].items()}


OBO_FULL = """format-version: 1.2
ontology: go
data-version: releases/2024-01-01
default-namespace: gene_ontology
import: http://purl.obolibrary.org/obo/ro.owl
remark: test remark

[Term]
id: GO:0000001
name: mito inheritance
alt_id: GO:9999999
def: "The dist of mito \\"quoted\\"" [GOC:mcc]
subset: goslim_yeast
synonym: "mitochondrial inheritance" EXACT []
synonym: "broad syn" BROAD []
synonym: "narrow syn" NARROW []
xref: Reactome:R-HSA-123
is_a: GO:0048308 ! parent comment
relationship: part_of GO:0048311
intersection_of: GO:0048308
intersection_of: part_of GO:0048311
disjoint_from: GO:0000002
property_value: IAO:0000412 "some literal"
created_by: jdoe
creation_date: 2024-01-01T00:00:00Z

[Term]
id: GO:0000002
name: dead term
is_obsolete: true
replaced_by: GO:0000003
consider: GO:0000004

[Typedef]
id: part_of
name: part of
is_transitive: true
inverse_of: has_part
domain: GO:0000001
range: GO:0000002
"""


def test_obo_full_tagset_triples():
    from pyontutils_spark.kernel import obo as O
    doc = O.parse_obo(OBO_FULL)
    hdr = list(O.header_triples(doc["header"]))
    ont = "http://purl.obolibrary.org/obo/go.owl"
    assert (ont, O.RDF_TYPE, O.OWL_ONTOLOGY, False) in hdr
    assert (ont, O.OWL_IMPORTS,
            "http://purl.obolibrary.org/obo/ro.owl", False) in hdr
    assert (ont, O.OWL_VERSION_INFO, "releases/2024-01-01", True) in hdr
    assert (ont, O.OIO_DEFAULT_NAMESPACE, "gene_ontology", True) in hdr
    assert (ont, O.RDFS_COMMENT, "test remark", True) in hdr

    by_stanza = {s["id"][0]: set(O.stanza_triples(s))
                 for s in doc["stanzas"]}
    g1 = "http://purl.obolibrary.org/obo/GO_0000001"
    t1 = by_stanza["GO:0000001"]
    assert (g1, O.OIO_ALT_ID, "GO:9999999", True) in t1
    assert (g1, O.IAO_DEFINITION, 'The dist of mito "quoted"', True) in t1
    assert (g1, O.OIO_IN_SUBSET,
            "http://purl.obolibrary.org/obo/goslim_yeast", False) in t1
    assert (g1, O.OIO_HASEXACTSYN, "mitochondrial inheritance", True) in t1
    assert (g1, O.OIO_HASBROADSYN, "broad syn", True) in t1
    assert (g1, O.OIO_HASNARROWSYN, "narrow syn", True) in t1
    assert (g1, O.RDFS_SUBCLASSOF,
            "http://purl.obolibrary.org/obo/GO_0048308", False) in t1
    assert (g1, "http://purl.obolibrary.org/obo/part_of",
            "http://purl.obolibrary.org/obo/GO_0048311", False) in t1
    assert (g1, O.OWL_DISJOINT_WITH,
            "http://purl.obolibrary.org/obo/GO_0000002", False) in t1
    assert (g1, "http://purl.obolibrary.org/obo/IAO_0000412",
            "some literal", True) in t1
    assert (g1, O.OIO_CREATED_BY, "jdoe", True) in t1

    t2 = by_stanza["GO:0000002"]
    assert (("http://purl.obolibrary.org/obo/GO_0000002",
             O.OWL_DEPRECATED, "true", True)) in t2
    assert (("http://purl.obolibrary.org/obo/GO_0000002", O.OIO_CONSIDER,
             "http://purl.obolibrary.org/obo/GO_0000004", False)) in t2

    tp = by_stanza["part_of"]
    po = "http://purl.obolibrary.org/obo/part_of"
    assert (po, O.RDF_TYPE, O.OWL_OBJPROP, False) in tp
    assert (po, O.RDF_TYPE, O.OWL + "TransitiveProperty", False) in tp
    assert (po, O.OWL_INVERSE_OF,
            "http://purl.obolibrary.org/obo/has_part", False) in tp
    assert (po, O.RDFS_DOMAIN,
            "http://purl.obolibrary.org/obo/GO_0000001", False) in tp


def test_obo_full_roundtrip_stable():
    from pyontutils_spark.kernel import obo as O
    doc = O.parse_obo(OBO_FULL)
    text2 = "\n".join(O.format_obo_stanza(s) for s in doc["stanzas"])
    doc2 = O.parse_obo(text2)
    t1 = [set(O.stanza_triples(s)) for s in doc["stanzas"]]
    t2 = [set(O.stanza_triples(s)) for s in doc2["stanzas"]]
    assert t1 == t2


def test_obo_union_of_flat_not_equivalence():
    """union_of must NOT assert per-member equivalentClass (that would
    entail the members are equivalent to each other)."""
    from pyontutils_spark.kernel import obo as O
    doc = O.parse_obo(
        "[Term]\nid: X:1\nunion_of: X:2\nunion_of: X:3\n")
    ts = set(O.stanza_triples(doc["stanzas"][0]))
    u = "http://www.w3.org/2002/07/owl#unionOf"
    x = "http://purl.obolibrary.org/obo/X_"
    assert (x + "1", u, x + "2", False) in ts
    assert (x + "1", u, x + "3", False) in ts
    assert not any(p == O.OWL_EQUIVALENT_CLASS for s, p, o, il in ts)


def test_obo_bang_inside_quotes_preserved():
    """'!' inside a quoted value is data, not a comment
    (comment stripping is quote-aware); '!' outside quotes still
    strips, and backslash-escaped '!' survives."""
    from pyontutils_spark.kernel.obo import parse_obo, stanza_triples
    text = """[Term]
id: X:1
name: thing ! this is a comment
property_value: IAO:0000112 "use this! carefully"
def: "a def with bang! inside" [ref]
"""
    doc = parse_obo(text)
    st = doc["stanzas"][0]
    assert st["name"] == ["thing"]
    assert st["property_value"] == ['IAO:0000112 "use this! carefully"']
    triples = list(stanza_triples(st))
    pv = [t for t in triples if t[1].endswith("IAO_0000112")]
    assert pv and pv[0][2] == "use this! carefully"
    d = [t for t in triples if t[1].endswith("IAO_0000115")]
    assert d and d[0][2] == "a def with bang! inside"


def test_obo_trailing_modifiers():
    """The reference's modifier-parsing vectors
    (test/test_oboio.py:13-21): braces/commas inside quoted values are
    data; the block is the last unquoted brace pair."""
    from pyontutils_spark.kernel.obo import (
        parse_obo, parse_trailing_modifiers, stanza_triples)
    vectors = [
        ('relationship: part_of UBERON:0000949 '
         '{source="AAO", source="FMA", source="XAO"} ! endocrine system',
         (("source", "AAO"), ("source", "FMA"), ("source", "XAO"))),
        ('{oh="look", a="thing!"}', (("oh", "look"), ("a", "thing!"))),
        ('some randome values {oh="look", a="thing!"} ! yay!',
         (("oh", "look"), ("a", "thing!"))),
        ('some rando}me values {oh="l{ook", a="t{hing!"} ! yay!',
         (("oh", "l{ook"), ("a", "t{hing!"))),
        ('some rando}me values {oh="l{ook", a="t}hing!"} ! yay!',
         (("oh", "l{ook"), ("a", "t}hing!"))),
    ]
    for line, want in vectors:
        got, _s, _e = parse_trailing_modifiers(line)
        assert got == want, (line, got)
    # end-to-end: modifiers stripped from relationship values so the
    # target id parses clean
    doc = parse_obo(
        "[Term]\nid: X:1\n"
        'relationship: part_of UBERON:0000949 '
        '{source="AAO"} ! endocrine system\n')
    st = doc["stanzas"][0]
    assert st["relationship"] == ["part_of UBERON:0000949"]
    rel = [t for t in stanza_triples(st)
           if t[1].endswith("part_of")]
    assert rel and rel[0][2].endswith("UBERON_0000949")
    # braces inside a quoted def are preserved
    doc2 = parse_obo('[Term]\nid: X:2\ndef: "has {braces} inside" [r]\n')
    d = [t for t in stanza_triples(doc2["stanzas"][0])
         if t[1].endswith("IAO_0000115")]
    assert d and d[0][2] == "has {braces} inside"
