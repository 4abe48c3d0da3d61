"""Deterministic Common-Crawl-style pages generator + ground truth.

Produces the input table of BASELINE.json:input_hint —
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
— as a pure function of the page index, so pytest builds it locally and
bench builds it distributed (``spark.range(n).mapInPandas``) with
identical bytes.

Because the generator *plants* every mention, it knows the ground truth:
expected extracted text (the per-url byte-identical invariant), expected
mentions (leftmost-longest over planted surfaces), and expected linked
entities — from which the golden triple set is derived (FIXTURES.md §4-5).

Adversarial content per FIXTURES.md §1: near-miss strings (label glued to
a suffix — no word boundary), a below-minLength label token, nested and
inline tags, entity escapes, script/style/noscript payloads containing
lexicon words (must NOT be extracted), irregular whitespace, and ~20%
head-entity skew (lexicon term 0) to exercise salted aggregation.
"""

from __future__ import annotations

import html as _html
import random
from datetime import datetime, timedelta, timezone

from ..kernel.norm import local_degrade
from .lexicon import MIN_LENGTH, make_lexicon

# Filler vocabulary — DISJOINT from lexicon._ADJ/_NOUN and from every
# special label token; mention ground truth depends on this.
FILLER_EN = [
    "the", "during", "study", "we", "observed", "robust", "signal",
    "within", "regions", "of", "interest", "subjects", "showed",
    "increased", "activity", "compared", "with", "controls", "these",
    "findings", "suggest", "a", "role", "for", "this", "structure",
    "in", "memory", "and", "learning", "processes", "overall",
    "results", "were", "consistent", "across", "sessions", "measured",
    "values", "are", "reported", "below", "threshold", "analysis",
]
FILLER_DE = ["der", "die", "das", "und", "ist", "ein", "mit", "von",
             "nicht", "auf", "wir", "haben", "wurde", "werden", "durch"]
FILLER_FR = ["le", "la", "les", "et", "est", "un", "une", "avec", "dans",
             "nous", "avons", "par", "pour", "sur", "pas"]

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

HEAD_ENTITY_P = 0.20  # skew: term 0 appears in ~20% of pages


def _surface_variant(pattern: str, rnd: random.Random) -> str:
    """Length-preserving case variant of a planted pattern."""
    r = rnd.random()
    if r < 0.5:
        return pattern
    if r < 0.75:
        return pattern[0].upper() + pattern[1:]
    return pattern.title()


class PageRecord(dict):
    """dict with keys: url, warc_ts, html, text, lang, golden_text,
    mentions [(start, end, surface, pattern_norm)], planted_term_ids."""


def make_page(i: int, lexicon: list[dict] | None = None,
              scale: int = 1) -> PageRecord:
    """``scale`` multiplies the sentence count (heavier pages for
    compute-bound benchmarking); scale=1 is the test corpus."""
    if lexicon is None:
        lexicon = make_lexicon()
    rnd = random.Random(f"page-{i}")
    url = f"https://example.org/d{i % 997}/page{i}"
    warc_ts = _EPOCH + timedelta(seconds=i * 37 % 31_536_000)

    if i % 23 == 0:
        lang, filler = "de", FILLER_DE
    elif i % 29 == 0:
        lang, filler = "fr", FILLER_FR
    else:
        lang, filler = "en", FILLER_EN

    title_line = f"Document {i} report"
    lines: list[str] = [title_line]
    mentions: list[tuple[int, int, str, str]] = []  # on final joined text
    pos = len(title_line) + 1  # +1 for the joining '\n'

    n_sent = (2 + rnd.randrange(4)) * scale
    # head-entity skew decided once per page (~20% of pages)
    head_sentence = rnd.randrange(n_sent) if rnd.random() < HEAD_ENTITY_P \
        else -1
    for sent_i in range(n_sent):
        tokens: list[tuple[str, str | None]] = []  # (token, pattern_norm|None)
        n_tok = 4 + rnd.randrange(8)
        for _ in range(n_tok):
            tokens.append((filler[rnd.randrange(len(filler))], None))
        if lang == "en":
            # plant 0-2 mentions per sentence, separated by filler
            for _ in range(rnd.randrange(3)):
                t = lexicon[rnd.randrange(len(lexicon))]
                surfaces = [s for s in [t["label"]] + t["synonyms"]
                            if len(local_degrade(s)) >= MIN_LENGTH]
                if not surfaces:
                    continue  # e.g. the below-minLength 'ca' term
                pat = surfaces[rnd.randrange(len(surfaces))]
                surface = _surface_variant(local_degrade(pat), rnd) \
                    if pat == t["label"] else pat
                slot = rnd.randrange(len(tokens) + 1)
                tokens.insert(slot, (surface, local_degrade(surface)))
            # head-entity skew
            if sent_i == head_sentence:
                tokens.insert(rnd.randrange(len(tokens) + 1),
                              ("hippocampus", "hippocampus"))
            # near-miss: label glued to suffix -> no word boundary
            if rnd.random() < 0.3:
                t = lexicon[rnd.randrange(20)]
                tokens.append((t["label"].replace(" ", "") + "oid", None))
            # below-minLength label as a bare token (pattern was dropped)
            if rnd.random() < 0.2:
                tokens.append(("ca", None))

        # assemble the line, recording mention offsets
        parts = []
        cursor = pos
        for k, (tok, pat) in enumerate(tokens):
            if k:
                cursor += 1  # single space
            if pat is not None:
                mentions.append((cursor, cursor + len(tok), tok, pat))
            parts.append(tok)
            cursor += len(tok)
        line = " ".join(parts)
        lines.append(line)
        pos = cursor + 1  # '\n'

    golden_text = "\n".join(lines)

    # ---- html construction (extraction must yield golden_text) --------
    body_parts = [f"<h1>{_html.escape(title_line)}</h1>"]
    for li, line in enumerate(lines[1:]):
        toks = line.split(" ")
        html_toks = []
        for k, tok in enumerate(toks):
            esc = _html.escape(tok)
            r = rnd.random()
            if r < 0.15:
                esc = f"<b>{esc}</b>"
            elif r < 0.25:
                esc = f"<i>{esc}</i>"
            html_toks.append(esc)
        sep_pool = [" ", "  ", " \t ", "\xa0"]
        joined = ""
        for k, ht in enumerate(html_toks):
            if k:
                joined += sep_pool[rnd.randrange(len(sep_pool))]
            joined += ht
        tag = "p" if li % 3 else "div"
        body_parts.append(f"<{tag}>{joined}</{tag}>")
    # decoys inside dropped subtrees: lexicon words must NOT leak out
    head = ("<head><title>site nav</title>"
            "<style>p{color:red} .hippocampus{display:none}</style>"
            "<script>var hippocampus = 'granule cell';</script></head>")
    noscript = "<noscript>cortex purkinje cell</noscript>"
    page_html = ("<html>" + head + "<body>"
                 + "".join(body_parts) + noscript + "</body></html>")

    # leftmost-longest selection over planted mentions (same-sentence
    # plants can nest only if one pattern is a prefix of another planted
    # at the same slot — impossible here since plants are separate tokens;
    # still, sort+sweep for safety)
    mentions.sort(key=lambda m: (m[0], -(m[1] - m[0])))
    sel, cur_end = [], -1
    for m in mentions:
        if m[0] >= cur_end:
            sel.append(m)
            cur_end = m[1]

    return PageRecord(
        url=url, warc_ts=warc_ts,
        html=page_html.encode("utf-8"),
        text=golden_text if i % 3 == 0 else None,
        lang=lang,
        golden_text=golden_text,
        mentions=sel,
    )


def make_pages(n: int, lexicon: list[dict] | None = None) -> list[PageRecord]:
    lex = lexicon or make_lexicon()
    return [make_page(i, lex) for i in range(n)]
