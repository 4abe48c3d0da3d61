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


# --- nifttl writer properties (no Spark, pure kernel) ---------------------

def _nifttl_strategies():
    from hypothesis import strategies as st
    uri = st.sampled_from(
        [f"http://ex.org/t{i}" for i in range(12)]
        + [f"http://other.org/deep/x{i}" for i in range(4)])
    pred = st.sampled_from(
        ["http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://www.w3.org/2000/01/rdf-schema#label",
         "http://www.w3.org/2000/01/rdf-schema#subClassOf",
         "http://ex.org/p1", "http://ex.org/p2"])
    lit_text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=12)
    xsd = "http://www.w3.org/2001/XMLSchema#"
    literal = st.one_of(
        st.tuples(lit_text, st.none(), st.none()),
        st.tuples(lit_text, st.none(), st.just("en")),
        st.tuples(st.integers(-99, 99).map(str), st.just(xsd + "integer"),
                  st.none()),
        st.tuples(st.sampled_from(["1.5", "0.25", "2.0"]),
                  st.just(xsd + "decimal"), st.none()),
        st.tuples(st.sampled_from(["true", "false"]),
                  st.just(xsd + "boolean"), st.none()))
    row = st.one_of(
        st.tuples(uri, pred, uri).map(
            lambda t: (t[0], t[1], t[2], False, None, None)),
        st.tuples(uri, pred, literal).map(
            lambda t: (t[0], t[1], t[2][0], True, t[2][1], t[2][2])))
    return st.lists(row, min_size=1, max_size=30)


def test_nifttl_deterministic_and_fixpoint_property():
    """For arbitrary small uri/literal graphs: serialization is
    shuffle-invariant and a parse->serialize fixpoint (idempotent)."""
    import random as _random

    from hypothesis import given, settings

    from pyontutils_spark.kernel.nifttl import serialize_nifttl
    from pyontutils_spark.kernel.ttl import parse_turtle_document

    ns = {"ex": "http://ex.org/"}

    @settings(max_examples=60, deadline=None)
    @given(_nifttl_strategies())
    def _prop(rows):
        out = serialize_nifttl(rows, ns)
        shuffled = list(rows)
        _random.Random(11).shuffle(shuffled)
        assert serialize_nifttl(shuffled, ns) == out
        rows2, p2, _ = parse_turtle_document(out, "fixpoint")
        assert serialize_nifttl(rows2, p2) == out

    _prop()
