"""Byte-parity of the nifttl writer with the reference's golden files —
the ttlser crown-jewel test (ttlser/test/test_ttlser.py:197-202: parse
nasty.ttl under randomized bnode/prefix order, serialize, byte-compare
to good.ttl after dropping the trailing version comment).

Here the parse side is this engine's own turtle parser, so the whole
path (tokenizer -> skolemized triples -> fixed-point bnode ranking ->
writer) is exercised end-to-end with zero rdflib involvement.
"""

import random
from pathlib import Path

import pytest

from pyontutils_spark.kernel.nifttl import serialize_nifttl
from pyontutils_spark.kernel.ttl import parse_turtle_document

REF = Path("/root/reference/ttlser/test")

needs_ref = pytest.mark.skipif(not REF.exists(),
                               reason="reference golden files not present")


def _roundtrip(nasty_name: str) -> tuple[str, list, dict]:
    text = (REF / nasty_name).read_text()
    rows, prefixes, _base = parse_turtle_document(text, nasty_name)
    return serialize_nifttl(rows, prefixes), rows, prefixes


def _body(out: str) -> str:
    # the same comparison the reference test does (test_ttlser.py:126):
    # drop the trailing version-comment line and its newline
    return out.rsplit("\n", 2)[0]


@needs_ref
@pytest.mark.parametrize("nasty,good", [
    ("nasty.ttl", "good.ttl"),
    ("list-nasty.ttl", "list-good.ttl"),
])
def test_byte_identical_to_golden(nasty, good):
    out, _, _ = _roundtrip(nasty)
    assert _body(out).encode() == (REF / good).read_bytes()


REF2 = Path("/root/reference/test")


@pytest.mark.skipif(not REF2.exists(), reason="reference not present")
@pytest.mark.parametrize("name", ["prefix.ttl", "example_neurons.ttl"])
def test_byte_identical_on_reference_serialized_files(name):
    """The reference repo's own ttlser-serialized files (written by the
    'nifstd custom serializer') must round-trip byte-identically:
    prefix.ttl is a 26k-statement longest-prefix stress test with 26
    nested namespaces and empty local names; example_neurons.ttl has
    deeply nested equivalentClass/intersectionOf/unionOf bnodes and a
    symmetric disjointWith on a bnode object."""
    text = (REF2 / name).read_text()
    rows, prefixes, _ = parse_turtle_document(text, name)
    out = serialize_nifttl(rows, prefixes)
    assert _body(out) == text.rsplit("\n", 2)[0]


@needs_ref
def test_deterministic_under_shuffle():
    """Shuffled triple-row order, shuffled prefix-dict order, and a
    different skolem document key must all produce identical bytes
    (the reference randomizes bnodes + prefixes 5x)."""
    text = (REF / "nasty.ttl").read_text()
    rows, prefixes, _ = parse_turtle_document(text, "nasty.ttl")
    ref = serialize_nifttl(rows, prefixes)
    for seed in range(3):
        r = list(rows)
        random.Random(seed).shuffle(r)
        pk = list(prefixes.items())
        random.Random(seed + 99).shuffle(pk)
        assert serialize_nifttl(r, dict(pk)) == ref
    rows2, p2, _ = parse_turtle_document(text, "other-skolem-key")
    assert serialize_nifttl(rows2, p2) == ref


@needs_ref
def test_idempotent():
    """parse(serialize(g)) -> serialize byte-equals serialize(g)."""
    out, _, _ = _roundtrip("nasty.ttl")
    rows, prefixes, _ = parse_turtle_document(out, "round2")
    assert serialize_nifttl(rows, prefixes) == out


def test_small_graph_layout():
    """Self-contained layout check (no reference needed): sections,
    predicate order, 'a' keyword, object-list + restriction shape."""
    src = """@prefix ex: <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
ex:B a owl:Class ;
    rdfs:subClassOf ex:A, [ a owl:Restriction ;
        owl:onProperty ex:p ; owl:someValuesFrom ex:A ] ;
    rdfs:label "b class" .
ex:A a owl:Class .
"""
    rows, prefixes, _ = parse_turtle_document(src, "small")
    out = serialize_nifttl(rows, prefixes)
    expected = """@prefix ex: <http://example.org/> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xml: <http://www.w3.org/XML/1998/namespace> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

### Classes

ex:A a owl:Class .

ex:B a owl:Class ;
    rdfs:label "b class" ;
    rdfs:subClassOf ex:A,
        [ a owl:Restriction ;
            owl:onProperty ex:p ;
            owl:someValuesFrom ex:A ] .
"""
    assert _body(out) == expected


def test_literal_normalization_and_order():
    """Typed literal lexical normalization (double -> e-notation,
    dateTime -> isoformat) and litsort ordering: bool < numeric <
    datetime < strings."""
    src = """@prefix ex: <http://example.org/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:x rdfs:label "b", 2, 1e0, true, 0.5, "A",
    "2020-01-02T03:04:05-00"^^xsd:dateTime .
"""
    rows, prefixes, _ = parse_turtle_document(src, "lits")
    out = serialize_nifttl(rows, prefixes)
    stanza = out[out.index("ex:x"):]
    order = ["true", "0.5", "1e+00", "2",
             '"2020-01-02T03:04:05+00:00"^^xsd:dateTime', '"A"', '"b"']
    pos = [stanza.index(tok) for tok in order]
    assert pos == sorted(pos), stanza


@needs_ref
def test_compact_serializer_roundtrip_and_determinism():
    """CompactTurtleSerializer semantics (serializers.py:833-882):
    symbol prefixes for frequent IRIs, one statement per line.
    Round-trip invariant: the output is a fixpoint — parse(compact(g))
    re-serializes byte-identically (the first pass applies the same
    normalizations as nifttl: literal lexical forms, disjointWith
    orientation, rdf:List flattening)."""
    import random
    from pyontutils_spark.kernel.nifttl import serialize_compact
    text = (REF / "nasty.ttl").read_text()
    rows, prefixes, _ = parse_turtle_document(text, "nasty.ttl")
    out = serialize_compact(rows, prefixes)
    # symbol prefixes bound to FULL IRIs (empty local names in use)
    assert "@prefix A: <" in out
    # compact: predicate groups and object lists stay on one line
    # (the only embedded newlines come from triple-quoted literals)
    assert ";\n" not in out and ",\n" not in out
    import re
    assert re.search(r"sco:0 a \w+:; owl:imports sco:1 \.", out)
    # determinism under shuffle
    r2 = list(rows)
    random.Random(3).shuffle(r2)
    assert serialize_compact(r2, prefixes) == out
    # fixpoint: parse our own compact output -> identical bytes
    rows2, p2, _ = parse_turtle_document(out, "rt")
    assert serialize_compact(rows2, p2) == out


def test_make_symbol_prefixes():
    from pyontutils_spark.kernel.nifttl import make_symbol_prefixes
    syms = list(make_symbol_prefixes(80))
    assert len(syms) == len(set(syms)) == 80
    assert syms[:3] == ["A", "B", "C"]
    # every prefix starts with a letter (most-significant digit rule)
    assert all(s[0].isalpha() for s in syms)


@needs_ref
def test_uncompact_and_det_serializers():
    """uncmpttl: one-line statements with FULL prefixes (no symbols);
    det (hashing layout): qname-only predicate order, raw sortkey —
    both deterministic fixpoints like the others."""
    from pyontutils_spark.kernel.nifttl import (
        serialize_det, serialize_uncompact)
    text = (REF / "nasty.ttl").read_text()
    rows, prefixes, _ = parse_turtle_document(text, "nasty.ttl")
    from pyontutils_spark.kernel.nifttl import (
        serialize_compact, serialize_nifttl)
    un = serialize_uncompact(rows, prefixes)
    # no symbol prefixes: same prefix block as nifttl, fewer than compact
    n_pfx = serialize_nifttl(rows, prefixes).count("@prefix")
    assert un.count("@prefix") == n_pfx
    assert serialize_compact(rows, prefixes).count("@prefix") > n_pfx
    assert ";\n" not in un and ",\n" not in un
    r2, p2, _ = parse_turtle_document(un, "rt")
    assert serialize_uncompact(r2, p2) == un  # fixpoint
    det = serialize_det(rows, prefixes)
    # no curated order: rdf:type ('a') is NOT forced first — e.g. the
    # axiom stanzas start with their lowest-qname predicate
    assert det != un
    r3, p3, _ = parse_turtle_document(det, "rt")
    assert serialize_det(r3, p3) == det


@needs_ref
def test_racket_serializer_header_and_fixpoint():
    """rktttl (RacketTurtleSerializer, serializers.py:827-831): the
    plain nifttl document preceded by exactly one `#lang rdf/turtle`
    line; body bytes identical to nifttl; deterministic fixpoint (the
    header is not turtle, so the fixpoint strips it before reparse —
    same as Racket's reader would)."""
    import random
    from pyontutils_spark.kernel.nifttl import (
        serialize_nifttl, serialize_racket)
    text = (REF / "nasty.ttl").read_text()
    rows, prefixes, _ = parse_turtle_document(text, "nasty.ttl")
    out = serialize_racket(rows, prefixes)
    header, _, body = out.partition("\n")
    assert header == "#lang rdf/turtle"
    assert body == serialize_nifttl(rows, prefixes)
    r2 = list(rows)
    random.Random(5).shuffle(r2)
    assert serialize_racket(r2, prefixes) == out
    rows2, p2, _ = parse_turtle_document(body, "rt")
    assert serialize_racket(rows2, p2) == out


def test_html_serializer_byte_golden():
    """HtmlTtlSerializer byte-parity against the audited golden
    (tests/golden/html_small.golden.html — derived once from the
    reference's documented structure: HtmlTurtleSerializer
    serializers.py:781-824 + htmlfn.atag htmlfn/__init__.py:47-60,
    each construct hand-checked: &lt;-escaped plain prefix block,
    ###+NBSP section headers, NBSP structural spaces/indent, <br>\\n
    newlines, tooltip-div atags for labeled nodes, bare plain-typed
    literals, linkified datatype qnames, full-IRI anchor text for
    unprefixable datatypes, escaped <>-bracket anchor text for
    unprefixable nodes, NBSP-dot stanza ends).  Also asserts the
    output is stable under shuffled input like every serializer in
    the family."""
    import pathlib
    import random
    from pyontutils_spark.kernel.nifttl import serialize_html
    ns = {"ex": "http://ex.org/",
          "owl": "http://www.w3.org/2002/07/owl#"}
    rows = [
        ("http://ex.org/a",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://www.w3.org/2002/07/owl#Class", False, None, None),
        ("http://ex.org/a", "http://www.w3.org/2000/01/rdf-schema#label",
         "Alpha", True, None, None),
        ("http://ex.org/a",
         "http://www.w3.org/2000/01/rdf-schema#subClassOf",
         "http://ex.org/b", False, None, None),
        ("http://ex.org/a", "http://ex.org/count", "5", True,
         "http://www.w3.org/2001/XMLSchema#integer", None),
        ("http://ex.org/a", "http://ex.org/note", "tok", True,
         "http://www.w3.org/2001/XMLSchema#token", None),
        ("http://ex.org/a", "http://ex.org/other", "x", True,
         "http://other.org/dt", None),
        ("http://nope.example/raw1", "http://ex.org/p",
         "hallo", True, None, "de"),
    ]
    golden = (pathlib.Path(__file__).parent / "golden"
              / "html_small.golden.html").read_text(encoding="utf-8")
    out = serialize_html(rows, ns, labels={"http://ex.org/b": "Beta ext"})
    assert out == golden
    r2 = list(rows)
    random.Random(11).shuffle(r2)
    assert serialize_html(r2, ns,
                          labels={"http://ex.org/b": "Beta ext"}) == golden


def test_scottl_supers_before_subs():
    """scottl: a superclass/superproperty/imported ontology statement
    appears before any of its subs within a section; cycles don't
    hang (sco:6 subClassOf sco:6)."""
    from pyontutils_spark.kernel.nifttl import serialize_scottl
    src = """@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix sco: <http://sco.lol/> .
sco:0 a owl:Ontology ; owl:imports sco:1 .
sco:1 a owl:Ontology .
sco:7 a owl:Class ; rdfs:subClassOf sco:8 .
sco:8 a owl:Class .
sco:6 a owl:Class ; rdfs:subClassOf sco:6 .
sco:2 a owl:AnnotationProperty ; rdfs:subPropertyOf sco:3 .
sco:3 a owl:AnnotationProperty .
"""
    rows, prefixes, _ = parse_turtle_document(src, "sco")
    out = serialize_scottl(rows, prefixes)
    # imported ontology before the importer; superclass before sub;
    # superproperty before sub (each within its own section)
    assert out.index("sco:1 a owl:Ontology") < out.index(
        "sco:0 a owl:Ontology")
    assert out.index("sco:8 a owl:Class") < out.index(
        "sco:7 a owl:Class")
    assert out.index("sco:3 a owl:AnnotationProperty") < out.index(
        "sco:2 a owl:AnnotationProperty")
    # self-cycle present and did not hang
    assert "sco:6" in out
    # deterministic under shuffle
    import random as _r
    rs = list(rows)
    _r.Random(5).shuffle(rs)
    assert serialize_scottl(rs, prefixes) == out
