"""Deterministic minting (neurondm/core.py:1885-1891 semantics) and
order-invariant graph checksum (utils_extra.py:23-67 semantics)."""

from pyontutils_spark.kernel.ids import (
    content_fragment, graph_checksum, mint_entity_iri, page_iri,
    skolem_iri, triple_bytes)


def test_fragment_order_insensitive():
    assert content_fragment(["b:2", "a:10", "a:9"]) == \
        content_fragment(["a:9", "a:10", "b:2"])


def test_fragment_natsort_readable():
    # natsort: a-9 before a-10; ':' degraded to '-'
    assert content_fragment(["a:10", "a:9"], readable=True) == "a-9-a-10"


def test_mint_deterministic():
    assert mint_entity_iri(["x", "y"]) == mint_entity_iri(["y", "x"])
    assert mint_entity_iri(["x"]) != mint_entity_iri(["y"])
    assert mint_entity_iri(["x"]).startswith("http://uri.interlex.org/temp/uris/")


def test_skolem_distinct_ns():
    assert skolem_iri("a").startswith(
        "http://uri.interlex.org/temp/uris/skolem/")


def test_page_iri_stable():
    assert page_iri("http://x.example/1") == page_iri("http://x.example/1")
    assert page_iri("http://x.example/1") != page_iri("http://x.example/2")


def test_graph_checksum_order_invariant():
    t1 = triple_bytes("s1", "p", "o", False)
    t2 = triple_bytes("s2", "p", "lit", True, "dt", "en")
    t3 = triple_bytes("s3", "p", "o2", False)
    assert graph_checksum([t1, t2, t3]) == graph_checksum([t3, t1, t2])
    # set semantics: duplicates collapse (rdflib Graph is a set)
    assert graph_checksum([t1, t1, t2, t3]) == graph_checksum([t1, t2, t3])
    assert graph_checksum([t1, t2]) != graph_checksum([t1, t3])


def test_triple_bytes_literal_iri_distinct():
    assert triple_bytes("s", "p", "x", True) != triple_bytes("s", "p", "x", False)
