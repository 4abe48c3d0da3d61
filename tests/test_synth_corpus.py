"""Consistency of the synthetic corpus ground truth with the kernel:
- extractor(html) must equal golden_text byte-for-byte per url
  (BASELINE.json:input_hint per-row invariant)
- AC over golden_text must find exactly the planted mentions
- generation must be a pure function of the index (partition-order free)
"""

from pyontutils_spark.kernel.ac import AhoCorasick
from pyontutils_spark.kernel.extract import html_to_text
from pyontutils_spark.synth.golden import corpus_triples, build_link_index
from pyontutils_spark.synth.lexicon import MIN_LENGTH, make_lexicon, match_entries
from pyontutils_spark.synth.pages import make_page, make_pages

N = 120

LEX = make_lexicon()
PAGES = make_pages(N, LEX)


def _automaton():
    pats = sorted({p for p, _ in match_entries(LEX)})
    return AhoCorasick([(p, p) for p in pats], min_length=MIN_LENGTH)


def test_extraction_matches_golden_bytes():
    for page in PAGES:
        got = html_to_text(page["html"])
        assert got.encode("utf-8") == page["golden_text"].encode("utf-8"), \
            page["url"]


def test_text_column_when_present_matches_golden():
    some = [p for p in PAGES if p["text"] is not None]
    assert some
    for p in some:
        assert p["text"] == p["golden_text"]


def test_ac_finds_exactly_planted_mentions():
    ac = _automaton()
    for page in PAGES:
        found = ac.find(page["golden_text"], longest_only=True)
        got = [(s, e, page["golden_text"][s:e].lower() if False else pat)
               for s, e, pat in found]
        want = [(s, e, pat) for s, e, _, pat in page["mentions"]]
        assert got == want, (page["url"], got[:5], want[:5])


def test_mention_offsets_point_at_surface():
    for page in PAGES:
        for s, e, surface, pat in page["mentions"]:
            assert page["golden_text"][s:e] == surface


def test_generation_is_pure():
    assert make_page(17, LEX) == make_page(17, LEX)
    assert make_page(17, LEX)["html"] == PAGES[17]["html"]


def test_skew_head_entity_share():
    n_head = sum(1 for p in PAGES
                 if any(pat == "hippocampus" for *_, pat in p["mentions"]))
    assert 0.08 <= n_head / N <= 0.45  # ~20% target, loose band


def test_non_english_pages_have_no_mentions():
    non_en = [p for p in PAGES if p["lang"] != "en"]
    assert non_en
    for p in non_en:
        assert p["mentions"] == []


def test_golden_triples_shape():
    triples = corpus_triples(PAGES, LEX)
    preds = {p for _, p, _, _ in triples}
    assert "http://uri.interlex.org/base/ilx_0381385" in preds  # ilx.isAbout
    assert "http://www.w3.org/2000/01/rdf-schema#label" in preds
    # duplicate-label 'cortex' must link to exactly one canonical candidate
    idx = build_link_index(LEX)
    from pyontutils_spark.synth.golden import link_pattern
    tid = link_pattern("cortex", idx)
    assert tid == 1  # BIRNLEX:100001 natsorts before NLX:100002
