"""HTML extractor determinism + Aho-Corasick mention semantics
(SciGraph annotate longestOnly/minLength, scigraph_client.py:174-197)."""

from pyontutils_spark.kernel.ac import AhoCorasick
from pyontutils_spark.kernel.extract import html_to_text


HTML = b"""<html><head><title>T</title><style>p{color:red}</style>
<script>var x = 'hippocampus';</script></head>
<body><h1>The  Hippocampus</h1>
<p>Purkinje cell &amp; granule cell studies.</p>
<div>nested <b>inline bold</b> stays <i>on one line</i></div>
<noscript>hidden</noscript>
<ul><li>item a9</li><li>item a10</li></ul>
</body></html>"""


def test_extract_drops_script_style_noscript():
    t = html_to_text(HTML)
    assert "var x" not in t
    assert "color:red" not in t
    assert "hidden" not in t


def test_extract_entities_and_blocks():
    t = html_to_text(HTML)
    assert "Purkinje cell & granule cell studies." in t
    assert "The Hippocampus" in t          # whitespace collapsed
    assert "nested inline bold stays on one line" in t
    lines = t.split("\n")
    assert "item a9" in lines and "item a10" in lines


def test_extract_deterministic_bytes():
    outs = {html_to_text(HTML).encode("utf-8") for _ in range(5)}
    assert len(outs) == 1


def test_extract_str_and_bytes_agree():
    assert html_to_text(HTML) == html_to_text(HTML.decode("utf-8"))


def _ac(patterns, **kw):
    return AhoCorasick([(p, p) for p in patterns], **kw)


def test_ac_basic_match():
    ac = _ac(["hippocampus", "purkinje cell"])
    hits = ac.find("the hippocampus and the Purkinje Cell")
    assert [(s, e) for s, e, _ in hits] == [(4, 15), (24, 37)]


def test_ac_leftmost_longest():
    # 'granule cell' and 'cell' both present: longestOnly keeps the longer
    # leftmost match only (scigraph_client.py:181 semantics).
    ac = _ac(["granule cell", "cell"])
    hits = ac.find("a granule cell here")
    assert [h[2] for h in hits] == ["granule cell"]
    # without longest_only both surface
    hits = ac.find("a granule cell here", longest_only=False)
    assert {h[2] for h in hits} == {"granule cell", "cell"}


def test_ac_word_boundaries():
    ac = _ac(["campus", "cell"])
    hits = ac.find("hippocampus cellular cell")
    # 'campus' inside 'hippocampus' and 'cell' inside 'cellular' rejected
    assert [h[2] for h in hits] == ["cell"]
    assert hits[0][0] == len("hippocampus cellular ")


def test_ac_min_length():
    ac = AhoCorasick([("ca", "x"), ("long enough", "y")], min_length=3)
    hits = ac.find("ca and long enough")
    assert [h[2] for h in hits] == ["y"]


def test_ac_case_fold_offsets():
    ac = _ac(["hippocampus"])
    text = "The HIPPOCAMPUS region"
    hits = ac.find(text)
    (s, e, _), = hits
    assert text[s:e] == "HIPPOCAMPUS"


def test_ac_non_overlapping_sequence():
    ac = _ac(["ab", "abc", "cd"])
    # leftmost-longest: 'abc' wins at 0, then 'cd' can't start before 3
    hits = ac.find("abc cd", longest_only=True)
    assert [h[2] for h in hits] == ["abc", "cd"]


def test_regex_matcher_equivalent_to_ac():
    """RegexMatcher must produce identical results to AhoCorasick on the
    synthetic corpus (same leftmost-longest + boundary semantics)."""
    from pyontutils_spark.kernel.ac import RegexMatcher
    from pyontutils_spark.synth.lexicon import (
        MIN_LENGTH, make_lexicon, match_entries)
    from pyontutils_spark.synth.pages import make_pages

    lex = make_lexicon()
    pats = sorted({p for p, _ in match_entries(lex)})
    ac = AhoCorasick([(p, p) for p in pats], min_length=MIN_LENGTH)
    rx = RegexMatcher([(p, p) for p in pats], min_length=MIN_LENGTH)
    for page in make_pages(60, lex):
        t = page["golden_text"]
        assert rx.find(t) == ac.find(t), page["url"]
    # boundary nuances: underscore is NOT alnum (both must match here)
    for text in ["_hippocampus_", "xhippocampus", "hippocampus9",
                 "the hippocampus.", "HIPPOCAMPUS"]:
        assert rx.find(text) == ac.find(text), text


def test_fast_extractor_equals_reference_on_corpus():
    from pyontutils_spark.kernel.extract import (
        html_to_text, html_to_text_reference)
    from pyontutils_spark.synth.pages import make_pages
    for page in make_pages(80):
        fast = html_to_text(page["html"])
        ref = html_to_text_reference(page["html"])
        assert fast == ref == page["golden_text"], page["url"]
    assert html_to_text(HTML) == html_to_text_reference(HTML)
    # entity-encoded tags must survive as literal text in both
    tricky = b"<p>a &lt;script&gt; b</p><div>x<br>y</div>"
    assert html_to_text(tricky) == html_to_text_reference(tricky)
