"""Deterministic HTML -> text extraction (pure function, stdlib only).

The per-row invariant of the engine (BASELINE.json:input_hint) is
"byte-identical extracted text per url": the same html bytes must produce
the same utf-8 text on every executor, across Arrow batches, partitionings
and re-runs.  Determinism comes from using a single pure function with no
locale/environment dependence — the same property the reference enforces
for its serializer via fresh-subprocess byte-comparison tests
(``ttlser/test/test_ttlser.py:129-173``).

Rules (fixed, documented, versioned):
- ``<script> <style> <noscript> <template> <head>`` subtree content dropped
- comments, processing instructions, declarations dropped
- block-level elements (p, div, br, li, tr, h1-h6, ...) break lines
- character/entity references decoded (``&amp;`` -> ``&``)
- whitespace: runs collapse to one space inside a line; lines stripped;
  empty lines dropped; lines joined with ``\\n``; no trailing newline
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .encoding import decode_html

EXTRACTOR_VERSION = "1"

_SKIP_SUBTREE = {"script", "style", "noscript", "template", "head", "svg"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "section",
    "article", "header", "footer", "nav", "aside", "figure", "figcaption",
    "hr", "dt", "dd", "dl", "form", "fieldset", "main", "body", "html",
    "title",
}
_WS = re.compile(r"[ \t\r\f\v\xa0]+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        elif tag in _BLOCK:
            self._chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREE:
            if self._skip_depth > 0:
                self._skip_depth -= 1
        elif tag in _BLOCK:
            self._chunks.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK:
            self._chunks.append("\n")

    def handle_data(self, data):
        if self._skip_depth == 0:
            self._chunks.append(data)

    def text(self) -> str:
        raw = "".join(self._chunks)
        lines = []
        for line in raw.split("\n"):
            line = _WS.sub(" ", line).strip()
            if line:
                lines.append(line)
        return "\n".join(lines)


def html_to_text_reference(html: bytes | str) -> str:
    """Reference extractor (event-driven HTMLParser).  Pure and
    deterministic; the per-url byte-identical invariant is defined
    against THIS function."""
    if isinstance(html, (bytes, bytearray)):
        html = decode_html(html)
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()


# --- fast path: compiled-regex pipeline (C-speed) -------------------------
# Equivalent to the reference extractor on well-formed html (verified by
# corpus-equality tests).  Known divergence: a literal '>' inside an
# attribute value breaks the generic tag strip — rare in practice and
# absent from the test corpora; the reference extractor remains available
# for exact-parity needs.

import html as _htmlmod

_RX_COMMENT = re.compile(r"<!--.*?-->", re.S)
_RX_SUBTREE = re.compile(
    r"<(script|style|noscript|template|head|svg)\b[^>]*>.*?</\1\s*>",
    re.S | re.I)
_BLOCK_ALT = "|".join(sorted(_BLOCK - {"h1", "h2", "h3", "h4", "h5", "h6"})) \
    + "|h[1-6]"
_RX_BLOCK = re.compile(rf"</?(?:{_BLOCK_ALT})\b[^>]*/?>", re.I)
_RX_TAG = re.compile(r"<[^>]+>")
_RX_DECL = re.compile(r"<![^>]*>")


def html_to_text(html: bytes | str) -> str:
    """Fast extractor: same rules as ``html_to_text_reference`` via
    compiled regexes (the hot path for 10^12 pages)."""
    if isinstance(html, (bytes, bytearray)):
        html = decode_html(html)
    s = _RX_COMMENT.sub("", html)
    s = _RX_SUBTREE.sub("", s)
    s = _RX_BLOCK.sub("\n", s)
    s = _RX_TAG.sub("", s)
    s = _RX_DECL.sub("", s)
    s = _htmlmod.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _WS.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
