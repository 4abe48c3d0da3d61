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


# ---------------------------------------------------------------------------
# N-Quads line grammar (the JVM scan regex, exercised here via Python re —
# the same pattern string; Java and Python agree on every construct used)
# ---------------------------------------------------------------------------

_BN_LABEL = st.from_regex(r"[A-Za-z][A-Za-z0-9._-]{0,10}[A-Za-z0-9]",
                          fullmatch=True)
_IRI_ST = st.from_regex(r"http://[a-z]{1,8}\.example/[A-Za-z0-9_#/-]{0,12}",
                        fullmatch=True)
_NODE_ST = st.one_of(_IRI_ST, _BN_LABEL.map(lambda s: "_:" + s))
_LIT_ST = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    max_size=24)


def _nq_term(node: str) -> str:
    return node if node.startswith("_:") else f"<{node}>"


def _nq_escape(lex: str) -> str:
    return (lex.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r")
            .replace("\t", "\\t"))


@settings(max_examples=150, deadline=None)
@given(subj=_NODE_ST, pred=_IRI_ST,
       obj=st.one_of(_NODE_ST, _LIT_ST),
       obj_is_node=st.booleans(),
       lang=st.one_of(st.none(),
                      st.from_regex(r"[a-z]{2}(-[A-Za-z0-9]{1,4})?",
                                    fullmatch=True)),
       graph=st.one_of(st.none(), _NODE_ST))
def test_nq_regex_parses_generated_lines(subj, pred, obj, obj_is_node,
                                         lang, graph):
    """Round-trip property for the N-Quads scan grammar: any line built
    from valid terms (IRIs, _: bnodes in subj/obj/graph position,
    escaped literals, lang tags) must match _NQ_REGEX with the right
    capture groups — the fuzzing counterpart of the fixture tests for
    the bnode extension."""
    import re

    from pyontutils_spark.sources.rdf import (
        _G_GRAPH_BN, _G_GRAPH_IRI, _G_LANG, _G_LIT, _G_OBJ_BN,
        _G_OBJ_IRI, _G_PRED, _G_SUBJ_BN, _G_SUBJ_IRI, _NQ_REGEX)
    if obj_is_node:
        obj_txt = _nq_term(obj) if (obj.startswith("_:")
                                    or obj.startswith("http")) else None
        if obj_txt is None:
            return  # literal drawn for a node slot — skip
        expect_lit = None
    else:
        if obj.startswith("_:") or obj.startswith("http"):
            return
        obj_txt = '"%s"' % _nq_escape(obj)
        if lang:
            obj_txt += "@" + lang
        expect_lit = _nq_escape(obj)
    line = f"{_nq_term(subj)} <{pred}> {obj_txt}"
    if graph is not None:
        line += f" {_nq_term(graph)}"
    line += " ."
    m = re.match(_NQ_REGEX, line)
    assert m, line
    got_subj = m.group(_G_SUBJ_IRI) or m.group(_G_SUBJ_BN)
    assert got_subj == subj
    assert m.group(_G_PRED) == pred
    if expect_lit is None:
        got_obj = m.group(_G_OBJ_IRI) or m.group(_G_OBJ_BN)
        assert got_obj == obj
    else:
        assert m.group(_G_LIT) == expect_lit
        if lang:
            assert m.group(_G_LANG) == lang
    if graph is not None:
        got_g = m.group(_G_GRAPH_IRI) or m.group(_G_GRAPH_BN)
        assert got_g == graph
    else:
        assert not (m.group(_G_GRAPH_IRI) or m.group(_G_GRAPH_BN))
