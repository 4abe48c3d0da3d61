"""CURIE/qname round-trip vectors mirroring makeGraph.expand/qname guard
semantics (reference pyontutils/core.py:630-653, 796-803) and
cull_prefixes longest-match + separator rules (core.py:898-929)."""

import pytest

from pyontutils_spark.kernel.curies import (
    DEFAULT, InjectivityError, PrefixMap, check_injective)


def test_expand_basic():
    assert DEFAULT.expand("rdf:type") == \
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert DEFAULT.expand("ILX:0101431") == \
        "http://uri.interlex.org/base/ilx_0101431"


def test_expand_uriref_passthrough():
    iri = "http://example.org/x"
    assert DEFAULT.expand(iri) == iri


def test_expand_space_in_prefix_valueerror():
    with pytest.raises(ValueError):
        DEFAULT.expand("bad prefix:x")


def test_expand_unknown_prefix_keyerror():
    with pytest.raises(KeyError):
        DEFAULT.expand("NOPE:123")


def test_coerce_check_thing_semantics():
    # expansion failure + http-no-space -> IRI (core.py:647-650)
    v, is_iri = DEFAULT.coerce("http://unknown.example/x y".replace(" y", ""))
    assert is_iri
    # expansion failure + not-http -> literal
    v, is_iri = DEFAULT.coerce("just a label")
    assert not is_iri and v == "just a label"
    # curie expands
    v, is_iri = DEFAULT.coerce("owl:Class")
    assert is_iri and v.endswith("#Class")


def test_qname_longest_prefix_wins():
    # NLXSUB namespace (nlx_subcell_) is longer than NLX (nlx_): the
    # longest-first rule of cull_prefixes (core.py:915) must pick NLXSUB.
    assert DEFAULT.qname(
        "http://uri.neuinfo.org/nif/nifstd/nlx_subcell_090901"
    ) == "NLXSUB:090901"
    assert DEFAULT.qname(
        "http://uri.neuinfo.org/nif/nifstd/nlx_12345") == "NLX:12345"
    assert DEFAULT.qname(
        "http://uri.neuinfo.org/nif/nifstd/nlx_anat_090901") == "NLXANAT:090901"


def test_qname_separator_guard():
    # '/' after the matched namespace blocks the match (core.py:919)
    iri = "http://uri.neuinfo.org/nif/nifstd/deep/path_1"
    assert DEFAULT.qname(iri) == iri


def test_qname_no_separator_prefix_sao():
    # 'SAO' maps to ...nifstd/sao with NO trailing separator
    # (ontutils.py:568-570 style) — suffix concatenates directly.
    assert DEFAULT.qname("http://uri.neuinfo.org/nif/nifstd/sao1770195789") \
        == "SAO:1770195789"


def test_qname_unmatched_returns_iri():
    iri = "http://totally.unknown.example.org/thing#x"
    assert DEFAULT.qname(iri) == iri


def test_roundtrip_expand_qname():
    for curie in ["rdf:type", "rdfs:label", "owl:Class", "ILX:0101431",
                  "NLXSUB:090901", "SAO:1770195789", "BIRNLEX:796",
                  "definition:", "TEMP:abc123", "oboInOwl:hasExactSynonym"]:
        iri = DEFAULT.expand(curie)
        assert DEFAULT.qname(iri) == curie, curie


def test_cull_prefixes():
    iris = [
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://uri.interlex.org/base/ilx_0101431",
        "http://ontology.example.org/import.owl",   # skipped (.owl)
        "http://ontology.example.org/file.ttl",     # skipped (.ttl)
    ]
    culled = DEFAULT.cull(iris)
    assert set(culled) == {"rdf", "ILX"}


def test_empty_prefix_banned():
    with pytest.raises(ValueError):
        PrefixMap({"": "http://x.example/"})


def test_injectivity_enforced():
    with pytest.raises(InjectivityError):
        check_injective({"a": "http://same/", "b": "http://same/"})
    with pytest.raises(InjectivityError):
        PrefixMap({"a": "http://same/", "b": "http://same/"})


def test_roundtrip_every_vendored_prefix():
    """expand -> qname must round-trip for EVERY prefix in the full
    vendored table (curie_map.yaml + _loadPrefixes extras), with both
    a non-empty suffix and the empty suffix (readable-predicate
    curies).  The suffix 'q0' is chosen so no expansion extends into a
    longer sibling namespace (e.g. NLX:q0 must not become NLXQUAL)."""
    from pyontutils_spark.kernel.curies import DEFAULT_PREFIXES
    assert len(DEFAULT_PREFIXES) >= 153
    for p in DEFAULT_PREFIXES:
        for suffix in ("q0", ""):
            curie = f"{p}:{suffix}"
            iri = DEFAULT.expand(curie)
            assert iri == DEFAULT_PREFIXES[p] + suffix
            assert DEFAULT.qname(iri) == curie, (curie, iri)


def test_reference_alias_shadowing():
    """An id-namespace spelling whose expansion lands exactly on a
    readable-predicate alias qnames back as the ALIAS (longest
    namespace wins) — the reference's namespaces.py aliasing."""
    iri = DEFAULT.expand("RO:0000087")
    assert iri == "http://purl.obolibrary.org/obo/RO_0000087"
    assert DEFAULT.qname(iri) == "hasRole:"
    # but a plain RO id with no alias keeps the RO spelling
    assert DEFAULT.qname("http://purl.obolibrary.org/obo/RO_0009999") \
        == "RO:0009999"


def test_nested_chebi_namespaces():
    """chebi1 (...chebi#2) nests inside chebi2 (...chebi#): longest
    match wins and the separator guard still applies."""
    assert DEFAULT.qname("http://purl.obolibrary.org/obo/chebi#23") \
        == "chebi1:3"
    assert DEFAULT.qname("http://purl.obolibrary.org/obo/chebi#4") \
        == "chebi2:4"
