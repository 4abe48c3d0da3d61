"""Sitemap parsing (sitemaps.org protocol, pure stdlib).

Completes the crawl-frontier pair with :mod:`.robots` (robots.txt
surfaces ``Sitemap:`` lines; this module reads what they point to).
Implements the public sitemaps.org 0.9 protocol:

- ``<urlset>`` documents: loc (required), lastmod, changefreq,
  priority per ``<url>`` entry;
- ``<sitemapindex>`` documents: nested (loc, lastmod) sitemap refs —
  surfaced as data, NOT fetched (no network in this engine; the caller
  feeds child documents back in);
- namespace-tolerant (matches on local tag names — real-world sitemaps
  mix default/prefixed/absent namespaces);
- gzip payloads auto-detected (``.xml.gz`` is the protocol's own
  transport) via the multi-member-safe gunzip already used for WARC;
- plain-text sitemaps (one URL per line) per the protocol's text
  format.

Entries beyond the protocol's 50k-per-file cap are parsed anyway
(lenient read, strict write is not our job).  Deterministic: document
order is preserved.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .warc import _gunzip_members

__all__ = ["parse_sitemap", "SitemapDoc"]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _text(el) -> str | None:
    return el.text.strip() if el.text and el.text.strip() else None


class SitemapDoc:
    """Parsed sitemap: either url entries or child-sitemap refs."""

    __slots__ = ("kind", "urls", "children")

    def __init__(self, kind: str, urls: list, children: list):
        self.kind = kind               # 'urlset' | 'sitemapindex' | 'text'
        self.urls = urls               # [(loc, lastmod, changefreq, prio)]
        self.children = children       # [(loc, lastmod)] for indexes


def parse_sitemap(payload: bytes | str) -> SitemapDoc:
    """Parse one sitemap document (XML, gzipped XML, or plain text)."""
    if isinstance(payload, str):
        data = payload.encode("utf-8")
    else:
        data = bytes(payload)
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    stripped = data.lstrip()
    if not stripped.startswith(b"<"):
        urls = [(line.strip(), None, None, None)
                for line in data.decode("utf-8", "replace").splitlines()
                if line.strip() and not line.lstrip().startswith("#")]
        return SitemapDoc("text", urls, [])

    root = ET.fromstring(data)
    kind = _local(root.tag)
    urls: list = []
    children: list = []
    if kind == "urlset":
        for u in root:
            if _local(u.tag) != "url":
                continue
            loc = lastmod = changefreq = prio = None
            for f in u:
                name = _local(f.tag)
                if name == "loc":
                    loc = _text(f)
                elif name == "lastmod":
                    lastmod = _text(f)
                elif name == "changefreq":
                    changefreq = _text(f)
                elif name == "priority":
                    t = _text(f)
                    try:
                        prio = float(t) if t is not None else None
                    except ValueError:
                        prio = None
            if loc:
                urls.append((loc, lastmod, changefreq, prio))
    elif kind == "sitemapindex":
        for s in root:
            if _local(s.tag) != "sitemap":
                continue
            loc = lastmod = None
            for f in s:
                name = _local(f.tag)
                if name == "loc":
                    loc = _text(f)
                elif name == "lastmod":
                    lastmod = _text(f)
            if loc:
                children.append((loc, lastmod))
    else:
        raise ValueError(f"not a sitemap document (root <{kind}>)")
    return SitemapDoc(kind, urls, children)
