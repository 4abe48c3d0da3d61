"""Property-based tests (hypothesis) over the pure kernels: sort-key
encodings must reproduce tuple order, line/document formats must
round-trip arbitrary content, similarity must stay bounded/symmetric.
No Spark session needed — these guard the broadcast-safe primitives
every operator builds on."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pyontutils_spark.kernel.norm import (
    local_degrade, natsort_key, natsort_tuple, token_set_ratio)
from pyontutils_spark.kernel.rdfio import format_ntriple, parse_ntriple

# strings with digit runs mixed in (the natsort-relevant shapes)
_natty = st.text(
    alphabet=st.sampled_from("abcXYZ0123456789_.-/ "), max_size=30)


@given(_natty, _natty)
@settings(max_examples=300)
def test_natsort_key_order_matches_tuple_order(a, b):
    ka, kb = natsort_key(a), natsort_key(b)
    ta, tb = natsort_tuple(a), natsort_tuple(b)
    # tuple comparison can raise on int-vs-str at same position ONLY for
    # different shapes; natsort_key linearizes those with a type tag,
    # which is exactly the property we rely on: where the tuple order
    # IS defined, the key order must agree.
    try:
        if ta < tb:
            assert ka < kb
        elif tb < ta:
            assert kb < ka
        else:
            assert ka == kb
    except TypeError:
        pass  # incomparable tuples — key order defines a total order


@given(_natty)
@settings(max_examples=200)
def test_natsort_key_deterministic_and_case_insensitive(s):
    assert natsort_key(s) == natsort_key(s)
    assert natsort_key(s.upper()) == natsort_key(s.lower())


_literal = st.text(max_size=60)
_iri_part = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                           blacklist_characters='<>"{}|^`\\'),
    min_size=1, max_size=40)


@given(_iri_part, _iri_part, _literal,
       st.sampled_from([None, "en", "fr-CA"]))
@settings(max_examples=300)
def test_ntriple_literal_roundtrip(subj, pred, lit, lang):
    line = format_ntriple("http://s/" + subj, "http://p/" + pred, lit,
                          True, None, lang)
    parsed = parse_ntriple(line)
    assert parsed is not None, line
    s, p, o, is_lit, dt, lg = parsed
    assert (s, p, o, is_lit, lg) == ("http://s/" + subj,
                                     "http://p/" + pred, lit, True, lang)


@given(_iri_part, _iri_part, _iri_part)
@settings(max_examples=200)
def test_ntriple_iri_roundtrip(a, b, c):
    line = format_ntriple("http://s/" + a, "http://p/" + b,
                          "http://o/" + c, False)
    parsed = parse_ntriple(line)
    assert parsed == ("http://s/" + a, "http://p/" + b,
                      "http://o/" + c, False, None, None)


@given(_literal)
@settings(max_examples=200)
def test_turtle_literal_roundtrip(lit):
    """Any literal written by the canonical writer must parse back
    byte-identically through the Turtle parser."""
    from pyontutils_spark.kernel.curies import PrefixMap
    from pyontutils_spark.kernel.rdfio import format_turtle
    from pyontutils_spark.kernel.ttl import parse_turtle
    triples = [("http://e/s", "http://p/p", lit, True, None, None)]
    ttl = format_turtle(triples, PrefixMap())
    back = parse_turtle(ttl, "prop")
    assert back == triples


@given(st.text(max_size=40), st.text(max_size=40))
@settings(max_examples=300)
def test_token_set_ratio_bounded_and_symmetric(a, b):
    r = token_set_ratio(a, b)
    assert 0.0 <= r <= 1.0
    assert r == token_set_ratio(b, a)
    toks = set(local_degrade(a).split())
    if toks and toks == set(local_degrade(b).split()):
        assert r == 1.0
