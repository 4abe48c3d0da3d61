"""HTML charset sniffing + decoding (WHATWG-style, pure stdlib).

Common-Crawl-style corpora carry pages as raw bytes (``html:binary``);
5-10% of the real web is not UTF-8.  This module implements the
practical core of the WHATWG encoding-sniffing algorithm
(https://html.spec.whatwg.org/multipage/parsing.html#determining-the-character-encoding
— public spec) so the extract stage decodes those pages correctly
instead of littering them with U+FFFD:

1. byte-order mark (UTF-8 / UTF-16 LE/BE),
2. transport-layer charset (the HTTP ``Content-Type`` header, available
   from the WARC reader),
3. ``<meta charset=...>`` / ``<meta http-equiv=Content-Type ...>``
   scanned in the first 1024 bytes (ASCII-compatible byte regexes, like
   the spec's prescan),
4. strict UTF-8 probe (a page that decodes cleanly as UTF-8 *is* UTF-8
   — this keeps the byte-identical invariant for every existing
   corpus),
5. windows-1252 fallback (the spec's default for most locales; a
   superset of latin-1 that never fails to decode).

Labels are normalized per the WHATWG encoding registry's alias table
for the labels that actually occur at crawl scale (latin-1 family ->
windows-1252, gb2312 -> gb18030 superset, etc.); unknown or
python-unsupported labels fall through to the next sniffing step rather
than raising.  Everything is deterministic and executor-safe (no
locale, no network).
"""

from __future__ import annotations

import codecs
import re

__all__ = ["sniff_charset", "decode_html", "normalize_label"]

# WHATWG label -> python codec, for the aliases that differ from
# python's own alias table or that WHATWG maps to a superset.
_LABEL_MAP = {
    # the spec maps the whole latin-1/ascii family to windows-1252
    "iso-8859-1": "windows-1252", "latin1": "windows-1252",
    "latin-1": "windows-1252", "l1": "windows-1252",
    "us-ascii": "windows-1252", "ascii": "windows-1252",
    "iso8859-1": "windows-1252", "iso_8859-1": "windows-1252",
    "cp819": "windows-1252", "x-cp1252": "windows-1252",
    # gb2312/gbk label decodes as the gb18030 superset
    "gb2312": "gb18030", "gbk": "gb18030", "gb_2312-80": "gb18030",
    "csgb2312": "gb18030", "x-gbk": "gb18030",
    "shift-jis": "shift_jis", "sjis": "shift_jis",
    "x-sjis": "shift_jis", "ms_kanji": "shift_jis",
    "euc-kr": "cp949", "korean": "cp949", "ksc_5601": "cp949",
    "unicode-1-1-utf-8": "utf-8", "utf8": "utf-8", "x-utf-8": "utf-8",
    "iso-8859-9": "windows-1254", "latin5": "windows-1254",
    "tis-620": "cp874", "iso-8859-11": "cp874",
}


def normalize_label(label: str) -> str | None:
    """WHATWG-normalize a charset label to a python codec name, or None
    if the label names no codec this interpreter supports."""
    lab = label.strip().strip("\"'").lower()
    if not lab:
        return None
    lab = _LABEL_MAP.get(lab, lab)
    # x-user-defined has no python codec; single-byte passthrough intent
    if lab == "x-user-defined":
        lab = "windows-1252"
    try:
        name = codecs.lookup(lab).name
    except LookupError:
        return None
    # a BOM-less page labeled utf-16 is handled as the spec says:
    # treat as utf-8 would mojibake; python's utf-16 guesses LE —
    # keep it, the BOM branch already caught marked files.
    return name


# spec prescan: byte regexes over the first 1024 bytes
_RX_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)""", re.I)
_RX_CT_CHARSET = re.compile(
    rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)""", re.I)


def sniff_charset(payload: bytes, content_type: str | None = None) -> str:
    """Return the python codec name for an HTML byte payload."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if payload[:2] == b"\xff\xfe" and payload[2:4] != b"\x00\x00":
        return "utf-16-le"
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be"
    if content_type:
        m = _RX_CT_CHARSET.search(content_type.encode("ascii", "ignore"))
        if m:
            name = normalize_label(m.group(1).decode("ascii", "ignore"))
            if name:
                return name
    head = payload[:1024]
    m = _RX_META_CHARSET.search(head)
    if m:
        name = normalize_label(m.group(1).decode("ascii", "ignore"))
        # a meta lying 'utf-16' about a byte stream we can already see
        # is ASCII-compatible is read as utf-8 (spec step 15.2)
        if name in ("utf-16-le", "utf-16-be", "utf-16"):
            name = "utf-8"
        if name:
            return name
    try:
        payload.decode("utf-8", errors="strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_html(payload: bytes | str, content_type: str | None = None
                ) -> str:
    """Decode an HTML payload with the sniffed charset.

    ``errors='replace'`` still applies after sniffing (a declared
    charset can disagree with the bytes); str input passes through so
    callers can be payload-type agnostic.
    """
    if isinstance(payload, str):
        return payload
    codec = sniff_charset(bytes(payload), content_type)
    out = bytes(payload).decode(codec, errors="replace")
    # utf-16 decodes keep the BOM as U+FEFF; it is markup noise here
    return out[1:] if out[:1] == "\ufeff" else out
