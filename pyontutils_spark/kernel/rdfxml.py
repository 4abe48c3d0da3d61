"""RDF/XML parser (pure Python, ElementTree — W3C RDF/XML subset).

Completes the reference's format-fallback list: ``ttlfmt`` tries
``('turtle', 'json-ld', ..., 'nt', 'rdf-xml')`` in order
(``ttlser/ttlser/ttlfmt.py:75,78-100``).  Covers the constructs OWL
tooling actually emits: ``rdf:RDF`` roots, ``rdf:Description`` and
typed node elements, ``rdf:about``/``rdf:ID``/``rdf:nodeID``/
``rdf:resource``, nested node elements, ``rdf:parseType`` of
``Resource``, ``Collection`` and ``Literal``, property attributes,
``xml:lang`` inheritance, ``rdf:datatype``, and ``xml:base``
resolution.

Blank nodes are skolemized like the Turtle parser (kernel/ttl.py):
``SKOLEM_NS + xml/<doc-hash>/<label-or-counter>`` — deterministic per
(document, position), no runtime BNodes anywhere in the engine.

Output rows: ``(subj, pred, obj, is_literal, datatype, lang)``.
"""

from __future__ import annotations

import hashlib
import re
import xml.etree.ElementTree as ET
from urllib.parse import urljoin

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

from .ids import SKOLEM_NS as _SKOLEM_NS

#: element/attribute names that never become predicates
_SYNTAX_ATTRS = {RDF_NS + a for a in
                 ("about", "ID", "nodeID", "resource", "datatype",
                  "parseType")}
_SYNTAX_ELEMS = {RDF_NS + "RDF", RDF_NS + "Description"}


class RdfXmlError(ValueError):
    pass


def _split(tag: str) -> str:
    """ElementTree gives '{ns}local' — to an IRI."""
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns + local
    return tag


class _Parser:
    def __init__(self, bnode_prefix: str = ""):
        self._doc = hashlib.md5(
            (bnode_prefix or "").encode()).hexdigest()[:12]
        self._anon = 0
        self.triples: list[tuple] = []

    def _bnode(self, label: str | None = None) -> str:
        if label is None:
            self._anon += 1
            label = f"anon{self._anon}"
        return f"{_SKOLEM_NS}xml/{self._doc}/{label}"

    def _emit(self, s, p, o, lit, dt, lang):
        self.triples.append((s, p, o, lit, dt, lang))

    def _resolve(self, iri: str, base: str | None) -> str:
        head = iri.split("/")[0].split("#")[0].split("?")[0]
        if base and ":" not in head:
            return urljoin(base, iri)
        return iri

    # -- node elements -------------------------------------------------
    def _node(self, el: ET.Element, base: str | None,
              lang: str | None) -> str:
        base = el.get(f"{{{XML_NS}}}base", base)
        lang = el.get(f"{{{XML_NS}}}lang", lang)
        about = el.get(f"{{{RDF_NS}}}about")
        rid = el.get(f"{{{RDF_NS}}}ID")
        node_id = el.get(f"{{{RDF_NS}}}nodeID")
        if about is not None:
            subj = self._resolve(about, base)
        elif rid is not None:
            subj = self._resolve("#" + rid, base)
        elif node_id is not None:
            subj = self._bnode(node_id)
        else:
            subj = self._bnode()
        tag = _split(el.tag)
        if tag not in _SYNTAX_ELEMS:  # typed node element
            self._emit(subj, RDF_TYPE, tag, False, None, None)
        # property attributes (non-syntax, non-xml attrs are literal props)
        for k, v in el.attrib.items():
            iri = _split(k)
            if iri in _SYNTAX_ATTRS or iri.startswith(XML_NS):
                continue
            if iri == RDF_TYPE:
                self._emit(subj, RDF_TYPE, self._resolve(v, base),
                           False, None, None)
            else:
                self._emit(subj, iri, v, True, None, lang)
        for child in el:
            self._property(subj, child, base, lang)
        return subj

    # -- property elements ----------------------------------------------
    def _property(self, subj: str, el: ET.Element, base: str | None,
                  lang: str | None):
        base = el.get(f"{{{XML_NS}}}base", base)
        lang = el.get(f"{{{XML_NS}}}lang", lang)
        pred = _split(el.tag)
        parse_type = el.get(f"{{{RDF_NS}}}parseType")
        resource = el.get(f"{{{RDF_NS}}}resource")
        node_id = el.get(f"{{{RDF_NS}}}nodeID")
        datatype = el.get(f"{{{RDF_NS}}}datatype")

        if parse_type == "Resource":
            node = self._bnode()
            self._emit(subj, pred, node, False, None, None)
            for child in el:
                self._property(node, child, base, lang)
            return
        if parse_type == "Collection":
            cells = [self._bnode() for _ in el]
            if not cells:
                self._emit(subj, pred, RDF_NIL, False, None, None)
                return
            self._emit(subj, pred, cells[0], False, None, None)
            for cell, child in zip(cells, el):
                item = self._node(child, base, lang)
                self._emit(cell, RDF_FIRST, item, False, None, None)
            for a, b in zip(cells, cells[1:]):
                self._emit(a, RDF_REST, b, False, None, None)
            self._emit(cells[-1], RDF_REST, RDF_NIL, False, None, None)
            return
        if parse_type == "Literal":
            # XML literal: serialize inner content verbatim
            text = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in el)
            self._emit(subj, pred, text, True,
                       RDF_NS + "XMLLiteral", None)
            return
        if resource is not None:
            self._emit(subj, pred, self._resolve(resource, base),
                       False, None, None)
            return
        if node_id is not None:
            self._emit(subj, pred, self._bnode(node_id), False, None, None)
            return
        children = list(el)
        if children:
            if len(children) != 1:
                raise RdfXmlError(
                    f"rdfxml: property {pred} has {len(children)} node "
                    "children (expected 1)")
            obj = self._node(children[0], base, lang)
            self._emit(subj, pred, obj, False, None, None)
            return
        # literal property element
        self._emit(subj, pred, el.text or "", True, datatype,
                   None if datatype else lang)


_NCNAME_START = re.compile(r"[A-Za-z_À-￿]")
_NCNAME_CHAR = re.compile(r"[A-Za-z0-9_.·À-￿-]")


def _split_pred(iri: str) -> tuple[str, str]:
    """Split a predicate IRI into (namespace, NCName local part) for an
    XML element name — walk back from the end over NCName characters,
    then forward to a valid NCName START char (same walk-back idea as
    the qname split in kernel/nifttl).  Raises when no non-empty local
    part exists (e.g. an IRI ending in '/')."""
    i = len(iri)
    while i > 0 and _NCNAME_CHAR.match(iri[i - 1]):
        i -= 1
    while i < len(iri) and not _NCNAME_START.match(iri[i]):
        i += 1
    local = iri[i:]
    if not local:
        raise RdfXmlError(
            f"rdfxml: predicate {iri!r} has no XML-serializable local "
            "name (ends in a non-NCName character)")
    return iri[:i], local


def _xml_escape(s: str, attr: bool = False) -> str:
    s = (s.replace("&", "&amp;").replace("<", "&lt;")
         .replace(">", "&gt;"))
    # \r is normalized away by XML parsers unless character-referenced
    s = s.replace("\r", "&#13;")
    if attr:
        s = s.replace('"', "&quot;").replace("\n", "&#10;") \
             .replace("\t", "&#9;")
    return s


def serialize_rdfxml(rows, namespaces: dict | None = None) -> str:
    """Engine triple rows -> deterministic RDF/XML text.

    Write-side complement of :func:`parse_rdfxml`, closing the format
    gap vs the reference's ``graph.serialize(format='xml')`` path
    (``ttlser/ttlfmt.py:78-100`` convert targets).  Exact round-trip:
    ``parse_rdfxml(serialize_rdfxml(rows))`` returns the same row SET —
    skolemized blank nodes are plain IRIs in this engine, so they pass
    through ``rdf:about``/``rdf:resource`` untouched.  Lexical
    ``_:label`` nodes (N-Triples reads) are emitted as ``rdf:nodeID``,
    which any conforming parser (including ours) re-labels.

    Shape: one ``rdf:Description`` per subject (sorted), explicit
    ``rdf:type`` property elements (no typed node elements — keeps the
    writer total over predicates), namespace declarations computed
    from the predicate split; ``namespaces`` (prefix->ns) only
    supplies PREFERRED prefix names, never filters."""
    rows = sorted(set(tuple(r) for r in rows),
                  key=lambda r: (r[0], r[1], str(r[2]),
                                 r[4] or "", r[5] or ""))
    ns_prefix: dict[str, str] = {RDF_NS: "rdf"}
    preferred = {v: k for k, v in (namespaces or {}).items()}
    splits: dict[str, tuple[str, str]] = {}
    for r in rows:
        if r[1] not in splits:
            splits[r[1]] = _split_pred(r[1])
    for ns, _ in sorted(splits.values()):
        if ns in ns_prefix:
            continue
        want = preferred.get(ns)
        if want and re.fullmatch(r"[A-Za-z_][\w.-]*", want) \
                and want not in ns_prefix.values():
            ns_prefix[ns] = want
        else:
            n = len(ns_prefix)
            while f"n{n}" in ns_prefix.values():
                n += 1
            ns_prefix[ns] = f"n{n}"
    decls = "".join(
        f'\n         xmlns:{p}="{_xml_escape(ns, attr=True)}"'
        for ns, p in sorted(ns_prefix.items(), key=lambda kv: kv[1]))
    out = [f"<rdf:RDF{decls}>"]
    by_subj: dict[str, list] = {}
    for r in rows:
        by_subj.setdefault(r[0], []).append(r)
    for subj in sorted(by_subj):
        if subj.startswith("_:"):
            sattr = f'rdf:nodeID="{_xml_escape(subj[2:], attr=True)}"'
        else:
            sattr = f'rdf:about="{_xml_escape(subj, attr=True)}"'
        out.append(f"  <rdf:Description {sattr}>")
        for _, pred, obj, lit, dt, lang in by_subj[subj]:
            ns, local = splits[pred]
            tag = f"{ns_prefix[ns]}:{local}"
            if not lit:
                if obj.startswith("_:"):
                    oattr = (f'rdf:nodeID='
                             f'"{_xml_escape(obj[2:], attr=True)}"')
                else:
                    oattr = f'rdf:resource="{_xml_escape(obj, attr=True)}"'
                out.append(f"    <{tag} {oattr}/>")
            else:
                attrs = ""
                if lang:
                    attrs += f' xml:lang="{_xml_escape(lang, attr=True)}"'
                if dt:
                    attrs += (f' rdf:datatype='
                              f'"{_xml_escape(dt, attr=True)}"')
                out.append(f"    <{tag}{attrs}>"
                           f"{_xml_escape(obj)}</{tag}>")
        out.append("  </rdf:Description>")
    out.append("</rdf:RDF>\n")
    return "\n".join(out)


def parse_rdfxml(text: str, bnode_prefix: str = "") -> list[tuple]:
    """RDF/XML document text -> list of engine triple rows."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise RdfXmlError(f"rdfxml: not well-formed XML: {e}") from e
    p = _Parser(bnode_prefix)
    root_tag = _split(root.tag)
    base = root.get(f"{{{XML_NS}}}base")
    lang = root.get(f"{{{XML_NS}}}lang")
    if root_tag == RDF_NS + "RDF":
        for child in root:
            p._node(child, base, lang)
    else:  # a single node element as document root is legal
        p._node(root, base, lang)
    if not p.triples and not re.search(r"rdf|RDF", text):
        raise RdfXmlError("rdfxml: no RDF content found")
    return p.triples
