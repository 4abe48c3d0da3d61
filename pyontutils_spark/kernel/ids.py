"""Deterministic identifier minting and graph checksums.

The reference mints content-derived IRIs by joining the *natsort-sorted*
bag of content fragments and namespacing the result under ``TEMP:``
(``neurondm/neurondm/core.py:1885-1891``; fragment shape
``neurondm/core.py:1475-1478``).  It also hashes graphs by sha256 over
sorted triple byte-tuples (``OrderInvariantHash``,
``pyontutils/utils_extra.py:23-67``) — noting that BNodes must first be
"converted to ints in a deterministic manner" (``utils_extra.py:31-32``).
We satisfy that precondition by *never creating runtime BNodes*: every
structural node gets a content-hash skolem IRI, so graph hashes and
ordering are direct.

All functions are pure; no driver state, no counters — safe at any
parallelism.
"""

from __future__ import annotations

import hashlib

from .norm import natsort_key

TEMP_NS = "http://uri.interlex.org/temp/uris/"
SKOLEM_NS = TEMP_NS + "skolem/"
PAGE_NS = "https://page.example.org/"


def content_fragment(frags, readable: bool = False) -> str:
    """Join sorted content fragments into one deterministic fragment.

    Sort is natsort (the reference sorts phenotype frags with a natsort
    key, neurondm/core.py:1885-1891); ':' is degraded to '-' like the
    reference's qname degrade (neurondm/core.py:1475-1478)."""
    cleaned = sorted((str(f).replace(":", "-") for f in frags),
                     key=natsort_key)
    joined = "-".join(cleaned)
    if readable:
        return joined
    return hashlib.sha256(joined.encode("utf-8")).hexdigest()[:32]


def mint_entity_iri(frags) -> str:
    """TEMP:-namespaced content-derived entity IRI."""
    return TEMP_NS + content_fragment(frags)


def skolem_iri(*frags) -> str:
    """Deterministic replacement for a BNode: content-hash skolem IRI."""
    return SKOLEM_NS + content_fragment(frags)


def page_iri(url: str) -> str:
    """Stable page IRI minted from the url (sha256; urls are not always
    valid IRI characters, and the hash keys the per-url invariant)."""
    return PAGE_NS + hashlib.sha256(url.encode("utf-8")).hexdigest()[:32]


def triple_bytes(subj: str, pred: str, obj: str, is_literal: bool,
                 datatype: str = "", lang: str = "") -> bytes:
    """Canonical byte form of one triple for order-invariant hashing."""
    tag = "L" if is_literal else "I"
    return ("\x1d".join((subj, pred, tag, obj, datatype or "", lang or ""))
            ).encode("utf-8")


def graph_checksum(triples) -> str:
    """OrderInvariantHash semantics (utils_extra.py:23-67): sha256 over the
    sorted byte forms.  ``triples``: iterable of byte strings from
    ``triple_bytes``."""
    h = hashlib.sha256()
    for tb in sorted(set(triples)):
        h.update(tb)
        h.update(b"\x1e")
    return h.hexdigest()
