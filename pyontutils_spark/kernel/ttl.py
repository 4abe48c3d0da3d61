"""Turtle parser (pure Python, W3C Turtle subset).

The reference's primary interchange format is Turtle: ``ttlfmt`` tries
``('turtle', 'json-ld', ..., 'nt', 'rdf-xml')`` in order
(``ttlser/ttlser/ttlfmt.py:75,78-100``) and every golden test file is
.ttl.  This parser covers the full grammar the canonical writer emits
plus what real reference ontologies use: @prefix/@base and SPARQL-style
PREFIX/BASE, prefixed names (with dot/escape locals), ``a``, ``;``/``,``
chains, quoted/triple-quoted literals with ``@lang`` / ``^^datatype``,
numeric + boolean shorthand, blank node labels and property lists
``[ ... ]``, and collections ``( ... )``.

Blank nodes never survive parsing: every bnode becomes a deterministic
skolem IRI (kernel/ids.py design — the reference itself notes bnodes
must be "converted to ints in a deterministic manner",
``pyontutils/utils_extra.py:31-32``).  Labels hash to
``SKOLEM_NS + ttl/<doc-hash>/<label>``; anonymous nodes use a per-parse
counter — stable for a given (document, position).

Output rows: ``(subj, pred, obj, is_literal, datatype, lang)`` — the
engine triple schema (operators/vocab.TRIPLE_SCHEMA).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin

from .rdfio import _unescape

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_TYPE = RDF_NS + "type"

from .ids import SKOLEM_NS as _SKOLEM_NS

# local-name chars: dot allowed only when followed by another name char
# (a trailing '.' is the statement terminator); %-encoded and \-escaped
# chars pass through.
_PN_LOCAL = r"(?:[A-Za-z0-9_\-%]|\\[~.!$&'()*+,;=/?#@%_\-]|\.(?=[A-Za-z0-9_\-%.\\]))*"

_TOKEN = re.compile(
    r"""(?P<ws>\s+|\#[^\n]*)
      | (?P<tdq>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
      | (?P<tsq>'''(?:[^'\\]|\\.|'(?!''))*''')
      | (?P<dq>"(?:[^"\\\n]|\\.)*")
      | (?P<sq>'(?:[^'\\\n]|\\.)*')
      | (?P<iri><[^<>"{}|^`\\\x00-\x20]*>)
      | (?P<decl>@prefix\b|@base\b|(?i:PREFIX)(?=\s)|(?i:BASE)(?=\s))
      | (?P<lang>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
      | (?P<dt>\^\^)
      | (?P<bnode>_:[A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?)
      | (?P<num>[+-]?(?:\d+\.\d+[eE][+-]?\d+|\.\d+[eE][+-]?\d+
                       |\d+[eE][+-]?\d+|\d*\.\d+|\d+))
      | (?P<punct>[;,.\[\]()])
      | (?P<pname>(?:[A-Za-z][A-Za-z0-9_.\-]*)?:""" + _PN_LOCAL + r""")
      | (?P<kw>\b(?:a|true|false)\b)
    """, re.VERBOSE)


class TurtleError(ValueError):
    pass


def _tokenize(text: str):
    toks = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN.match(text, pos)
        if m is None:
            raise TurtleError(
                f"turtle: unexpected input at {pos}: {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group()))
    return toks


class _Parser:
    def __init__(self, text: str, bnode_prefix: str = ""):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.triples: list[tuple] = []
        self._doc = hashlib.md5(
            (bnode_prefix or "").encode()).hexdigest()[:12]
        self._anon = 0

    # -- token stream ------------------------------------------------
    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, value):
        kind, v = self._next()
        if v != value:
            raise TurtleError(f"turtle: expected {value!r}, got {v!r}")

    # -- term helpers -------------------------------------------------
    def _iri(self, raw: str) -> str:
        body = _unescape(raw[1:-1])
        # relative iff no scheme before the first /, ?, or # (RFC 3986:
        # scheme chars exclude those, so 'foo?x:y' is relative)
        head = body.split("/")[0].split("#")[0].split("?")[0]
        if self.base and ":" not in head:
            return urljoin(self.base, body)
        return body

    def _pname(self, raw: str) -> str:
        pfx, _, local = raw.partition(":")
        if pfx not in self.prefixes:
            raise TurtleError(f"turtle: undefined prefix {pfx!r}:")
        local = re.sub(r"\\(.)", r"\1", local)
        return self.prefixes[pfx] + local

    def _bnode(self, label: str | None = None) -> str:
        if label is None:
            self._anon += 1
            label = f"anon{self._anon}"
        return f"{_SKOLEM_NS}ttl/{self._doc}/{label}"

    # -- grammar ------------------------------------------------------
    def parse(self):
        while self._peek()[0] is not None:
            kind, v = self._peek()
            if kind == "decl":
                self._directive()
            else:
                self._triples_block()
        return self.triples

    def _directive(self):
        _, decl = self._next()
        d = decl.strip().lower()
        if d == "@prefix" or d == "prefix":
            kind, pn = self._next()
            if kind != "pname" or not pn.endswith(":"):
                raise TurtleError(f"turtle: bad prefix decl at {pn!r}")
            kind, iri = self._next()
            if kind != "iri":
                raise TurtleError("turtle: prefix needs an IRI")
            self.prefixes[pn[:-1]] = self._iri(iri)
            if d == "@prefix":
                self._expect(".")
        else:  # @base / BASE
            kind, iri = self._next()
            if kind != "iri":
                raise TurtleError("turtle: base needs an IRI")
            self.base = self._iri(iri)
            if d == "@base":
                self._expect(".")

    def _triples_block(self):
        kind, v = self._peek()
        if v == "[":
            self._next()
            subj = self._bnode_property_list()
            # a bare [ ... ] . statement needs no predicate list
            if self._peek()[1] == ".":
                self._next()
                return
        else:
            subj = self._subject()
        self._predicate_object_list(subj)
        self._expect(".")

    def _subject(self) -> str:
        kind, v = self._next()
        if kind == "iri":
            return self._iri(v)
        if kind == "pname":
            return self._pname(v)
        if kind == "bnode":
            return self._bnode(v[2:])
        if v == "(":
            return self._collection()
        raise TurtleError(f"turtle: bad subject {v!r}")

    def _predicate_object_list(self, subj: str):
        while True:
            kind, v = self._next()
            if kind == "iri":
                pred = self._iri(v)
            elif kind == "pname":
                pred = self._pname(v)
            elif kind == "kw" and v == "a":
                pred = RDF_TYPE
            else:
                raise TurtleError(f"turtle: bad predicate {v!r}")
            while True:
                self._object(subj, pred)
                if self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[1] == ";":
                # consume runs of ';' — the grammar allows empty items
                # between semicolons ('s p o ;; p2 o2 .')
                while self._peek()[1] == ";":
                    self._next()
                # trailing ';' before '.' or ']' is legal
                if self._peek()[1] in (".", "]", None):
                    return
                continue
            return

    def _object(self, subj: str, pred: str):
        kind, v = self._next()
        if kind == "iri":
            self._emit(subj, pred, self._iri(v), False, None, None)
        elif kind == "pname":
            self._emit(subj, pred, self._pname(v), False, None, None)
        elif kind == "bnode":
            self._emit(subj, pred, self._bnode(v[2:]), False, None, None)
        elif v == "[":
            node = self._bnode_property_list()
            self._emit(subj, pred, node, False, None, None)
        elif v == "(":
            self._emit(subj, pred, self._collection(), False, None, None)
        elif kind in ("dq", "sq", "tdq", "tsq"):
            q = 3 if kind in ("tdq", "tsq") else 1
            lex = _unescape(v[q:-q])
            lang = dtype = None
            nk, nv = self._peek()
            if nk == "lang":
                self._next()
                lang = nv[1:]
            elif nk == "dt":
                self._next()
                dk, dv = self._next()
                if dk == "iri":
                    dtype = self._iri(dv)
                elif dk == "pname":
                    dtype = self._pname(dv)
                else:
                    raise TurtleError(f"turtle: bad datatype {dv!r}")
            self._emit(subj, pred, lex, True, dtype, lang)
        elif kind == "num":
            if "e" in v.lower():
                dt = XSD_NS + "double"
            elif "." in v:
                dt = XSD_NS + "decimal"
            else:
                dt = XSD_NS + "integer"
            self._emit(subj, pred, v, True, dt, None)
        elif kind == "kw" and v in ("true", "false"):
            self._emit(subj, pred, v, True, XSD_NS + "boolean", None)
        else:
            raise TurtleError(f"turtle: bad object {v!r}")

    def _bnode_property_list(self) -> str:
        # '[' already consumed by the caller
        node = self._bnode()
        if self._peek()[1] != "]":
            self._predicate_object_list(node)
        self._expect("]")
        return node

    def _collection(self) -> str:
        # '(' already consumed by caller
        items_subj_pred: list[str] = []
        nodes: list[str] = []
        while self._peek()[1] != ")":
            if self._peek()[0] is None:
                raise TurtleError("turtle: unterminated collection")
            node = self._bnode()
            nodes.append(node)
            self._object(node, RDF_FIRST)
        self._next()  # ')'
        if not nodes:
            return RDF_NIL
        for a, b in zip(nodes, nodes[1:]):
            self._emit(a, RDF_REST, b, False, None, None)
        self._emit(nodes[-1], RDF_REST, RDF_NIL, False, None, None)
        del items_subj_pred
        return nodes[0]

    def _emit(self, s, p, o, is_lit, dt, lang):
        self.triples.append((s, p, o, is_lit, dt, lang))


def parse_turtle(text: str, bnode_prefix: str = "") -> list[tuple]:
    """Turtle document text -> list of engine triple rows.

    ``bnode_prefix`` keys the skolem namespace for this document (use
    the file path / url) so bnode IRIs are globally unique yet
    deterministic per document."""
    return _Parser(text, bnode_prefix).parse()


def extract_ontology_header(text: str) -> str:
    """Bounded ontology-header scan: the prefix of the document up to
    the end of the first stanza mentioning ``owl:Ontology`` — the
    reference streams a remote file in 4096-byte chunks ONLY until the
    header stanza completes (``pyontutils/core.py:298-379``, turtle
    start/stop markers ``' owl:Ontology'``/``' .\\n'``; its own FIXME
    notes the stop can be fooled by a literal containing ' .\\n' — same
    caveat here).  In Spark the IO unit is the file, so the win is
    bounding the PARSE: only this prefix is ever tokenized.  Returns
    '' when the document has no ontology header."""
    i = text.find(" owl:Ontology")
    if i == -1:
        i = text.find("http://www.w3.org/2002/07/owl#Ontology>")
    if i == -1:
        return ""
    stop = text.find(" .\n", i)
    if stop == -1:
        stop = text.find(" .", i)
        if stop == -1:
            return ""
    return text[:stop + 2]


def parse_turtle_header(text: str, bnode_prefix: str = "") -> list[tuple]:
    """Parse ONLY the ontology header (directives + first owl:Ontology
    stanza) of a turtle document — the bounded-scan read path."""
    header = extract_ontology_header(text)
    return _Parser(header, bnode_prefix).parse() if header else []


def parse_turtle_document(text: str, bnode_prefix: str = ""):
    """Like ``parse_turtle`` but also returns the document's prefix
    declarations and base: ``(triples, prefixes, base)``.  The nifttl
    writer needs the declared prefix block (the reference serializer
    emits every bound namespace, used or not — see list-good.ttl)."""
    p = _Parser(text, bnode_prefix)
    triples = p.parse()
    return triples, dict(p.prefixes), p.base
