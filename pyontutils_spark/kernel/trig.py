"""TriG parser + serializer (pure Python, W3C TriG subset).

TriG is Turtle plus named-graph blocks — the document analog of
N-Quads, and the last member of the reference's rdflib format family
(``ttlser/ttlser/ttlfmt.py:78-100`` parses/serializes any rdflib
format; rdflib ships a trig parser/serializer) not yet covered by the
engine's read/write paths.  Grammar covered on top of the full
kernel/ttl.py Turtle subset:

- ``GRAPH <label> { ... }`` (keyword case-insensitive, per spec),
- ``<label> { ... }`` sugar (label = IRI, prefixed name, or blank
  node label),
- anonymous default-graph blocks ``{ ... }``,
- bare top-level triples (default graph),
- the optional final ``.`` inside a graph block.

Every Turtle document is a valid TriG document; ``parse_trig`` on
turtle text yields the same triples with a NULL graph (tested).

BNodes are skolemized exactly as in kernel/ttl.py (deterministic per
(document, label)); a blank-node GRAPH label skolemizes through the
same map, so a bnode used both as graph label and subject stays one
node.

Output rows: ``(subj, pred, obj, is_literal, datatype, lang,
graph)`` — the engine triple schema plus the nullable graph IRI
(NULL = default graph), matching the N-Quads reader's ``src_graph``.
"""

from __future__ import annotations

import re

from .rdfio import _term
from .ttl import _PN_LOCAL, TurtleError, _Parser

_TRIG_TOKEN = re.compile(
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
      | (?P<punct>[;,.\[\](){}])
      | (?P<pname>(?:[A-Za-z][A-Za-z0-9_.\-]*)?:""" + _PN_LOCAL + r""")
      | (?P<kw>\b(?:a|true|false|(?i:GRAPH))\b)
    """, re.VERBOSE)


class _TrigParser(_Parser):
    def __init__(self, text: str, bnode_prefix: str = ""):
        super().__init__("", bnode_prefix)
        toks = []
        pos = 0
        n = len(text)
        while pos < n:
            m = _TRIG_TOKEN.match(text, pos)
            if m is None:
                raise TurtleError(
                    f"trig: unexpected input at {pos}: "
                    f"{text[pos:pos + 40]!r}")
            pos = m.end()
            if m.lastgroup != "ws":
                toks.append((m.lastgroup, m.group()))
        self.toks = toks
        self._graph: str | None = None
        self.quads: list[tuple] = []

    # every triple the inherited Turtle grammar emits lands here with
    # the current graph context attached
    def _emit(self, s, p, o, is_lit, dt, lang):
        self.quads.append((s, p, o, is_lit, dt, lang, self._graph))

    def parse(self):
        while self._peek()[0] is not None:
            kind, v = self._peek()
            if kind == "decl":
                self._directive()
            elif kind == "kw" and v.lower() == "graph":
                self._next()
                label = self._graph_label()
                self._wrapped_graph(label)
            elif v == "{":
                self._wrapped_graph(None)
            elif kind in ("iri", "pname", "bnode"):
                # labelOrSubject: one-token lookahead decides graph
                # block vs plain triples (term parsing is side-effect
                # free for these three kinds, so rewinding is safe)
                save = self.i
                label = self._graph_label()
                if self._peek()[1] == "{":
                    self._wrapped_graph(label)
                else:
                    self.i = save
                    self._graph = None
                    self._triples_block()
            else:
                self._graph = None
                self._triples_block()
        return self.quads

    def _graph_label(self) -> str:
        kind, v = self._next()
        if kind == "iri":
            return self._iri(v)
        if kind == "pname":
            return self._pname(v)
        if kind == "bnode":
            return self._bnode(v[2:])
        raise TurtleError(f"trig: bad graph label {v!r}")

    def _wrapped_graph(self, label: str | None):
        self._expect("{")
        self._graph = label
        while self._peek()[1] != "}":
            if self._peek()[0] is None:
                raise TurtleError("trig: unterminated graph block")
            self._triples_block(in_graph=True)
        self._next()  # '}'
        self._graph = None

    def _triples_block(self, in_graph: bool = False):
        kind, v = self._peek()
        if v == "[":
            self._next()
            subj = self._bnode_property_list()
            if self._peek()[1] == ".":
                self._next()
                return
            if in_graph and self._peek()[1] == "}":
                return
        else:
            subj = self._subject()
        self._predicate_object_list(subj)
        # inside a graph block the final statement's '.' is optional
        # (TriG: triplesBlock ::= triples ('.' triplesBlock?)?)
        if in_graph and self._peek()[1] == "}":
            return
        self._expect(".")


def parse_trig(text: str, bnode_prefix: str = "") -> list[tuple]:
    """TriG document text -> list of engine quad rows
    ``(subj, pred, obj, is_literal, datatype, lang, graph)`` with
    graph = None for default-graph statements.  ``bnode_prefix`` keys
    the skolem namespace exactly as in :func:`kernel.ttl.parse_turtle`."""
    return _TrigParser(text, bnode_prefix).parse()


def parse_trig_document(text: str, bnode_prefix: str = ""):
    """Like :func:`parse_trig` but also returns the document's prefix
    declarations and base: ``(quads, prefixes, base)``."""
    p = _TrigParser(text, bnode_prefix)
    quads = p.parse()
    return quads, dict(p.prefixes), p.base


def serialize_trig(quads, prefix_map) -> str:
    """Deterministic TriG text: culled+sorted ``@prefix`` block, the
    default graph's triples first as bare statements, then one
    ``<graph> { ... }`` block per named graph in sorted graph order;
    subjects/predicates/objects sorted lexicographically within each
    graph.  Round-trip property: ``parse_trig(serialize_trig(q)) ==
    q`` as a row set (bnodes already skolem IRIs).  ``quads``:
    iterable of 7-tuples as produced by :func:`parse_trig`;
    ``prefix_map``: kernel.curies.PrefixMap."""
    rows = sorted(set(tuple(q) for q in quads),
                  key=lambda q: (q[6] or "", q[0], q[1], q[3],
                                 q[2], q[4] or "", q[5] or ""))
    used = []
    for s, p, o, is_lit, dt, lang, g in rows:
        used += [s, p]
        used += [dt] if is_lit and dt else ([] if is_lit else [o])
        if g:
            used.append(g)
    culled = prefix_map.cull(u for u in used if u)
    out = [f"@prefix {p}: <{ns}> ." for p, ns in sorted(culled.items())]
    qn = prefix_map.qname

    def name(iri: str) -> str:
        q = qn(iri)
        return q if q != iri else f"<{iri}>"

    cur_graph: str | None = None
    in_block = False
    first = True
    for s, p, o, is_lit, dt, lang, g in rows:
        if first or g != cur_graph:
            if in_block:
                out.append("}")
            out.append("")
            if g is not None:
                out.append(f"{name(g)} {{")
            in_block = g is not None
            cur_graph = g
            first = False
        pterm = "a" if qn(p) == "rdf:type" else name(p)
        indent = "    " if in_block else ""
        out.append(f"{indent}{name(s)} {pterm} "
                   f"{_term(o, is_lit, dt, lang, qn)} .")
    if in_block:
        out.append("}")
    return "\n".join(out) + "\n"
