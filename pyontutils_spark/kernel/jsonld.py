"""JSON-LD parser (pure Python — the compacted/expanded subset).

Completes ``ttlfmt``'s format list (``ttlser/ttlser/ttlfmt.py:75``:
``('turtle', 'json-ld', ..., 'nt', 'rdf-xml')``).  Supported: top-level
``@context`` with prefix and term definitions (string or
``{"@id": ..., "@type": "@id"}`` forms), ``@graph`` arrays, node
objects with ``@id``/``@type``, value objects (``@value`` +
``@language``/``@type``), ``@list``, compact IRIs, nested node
objects, and arrays.  Remote contexts are NOT fetched (no I/O in a
parser) — unresolvable terms raise.

Blank nodes (``_:label`` or anonymous nested objects) are skolemized
per document like the Turtle/RDF-XML parsers.
"""

from __future__ import annotations

import hashlib
import json

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

from .ids import SKOLEM_NS as _SKOLEM_NS
_KEYWORDS = {"@id", "@type", "@value", "@language", "@list", "@graph",
             "@context"}


class JsonLdError(ValueError):
    pass


class _Parser:
    def __init__(self, bnode_prefix: str = ""):
        self._doc = hashlib.md5(
            (bnode_prefix or "").encode()).hexdigest()[:12]
        self._anon = 0
        self.ctx: dict[str, dict] = {}
        self.triples: list[tuple] = []

    def _bnode(self, label: str | None = None) -> str:
        if label is None:
            self._anon += 1
            label = f"anon{self._anon}"
        return f"{_SKOLEM_NS}jsonld/{self._doc}/{label}"

    def _emit(self, s, p, o, lit, dt, lang):
        self.triples.append((s, p, o, lit, dt, lang))

    # -- context ---------------------------------------------------------
    def _load_context(self, ctx):
        if ctx is None:
            return
        if isinstance(ctx, list):
            for c in ctx:
                self._load_context(c)
            return
        if isinstance(ctx, str):
            raise JsonLdError(
                f"jsonld: remote context not supported: {ctx}")
        for term, defn in ctx.items():
            if term.startswith("@"):
                continue
            if isinstance(defn, str):
                self.ctx[term] = {"@id": defn}
            elif isinstance(defn, dict):
                self.ctx[term] = defn
            else:
                raise JsonLdError(f"jsonld: bad term definition {term!r}")

    def _expand(self, term: str) -> str:
        """Term or compact IRI -> IRI."""
        if term in self.ctx:
            defn = self.ctx[term]
            if "@id" not in defn:
                raise JsonLdError(
                    f"jsonld: context term {term!r} has no @id")
            return defn["@id"]
        if ":" in term:
            pfx, _, local = term.partition(":")
            if pfx in self.ctx and not local.startswith("//"):
                return self.ctx[pfx]["@id"] + local
            return term  # absolute IRI (or _: handled by caller)
        raise JsonLdError(f"jsonld: term {term!r} not in context and "
                          "not an IRI")

    def _node_ref(self, iri: str) -> str:
        if iri.startswith("_:"):
            return self._bnode(iri[2:])
        return self._expand(iri)

    # -- nodes -----------------------------------------------------------
    def _node(self, obj: dict) -> str:
        if "@id" in obj:
            subj = self._node_ref(obj["@id"])
        else:
            subj = self._bnode()
        types = obj.get("@type", [])
        for t in types if isinstance(types, list) else [types]:
            self._emit(subj, RDF_TYPE, self._node_ref(t), False, None, None)
        for key, val in obj.items():
            if key in _KEYWORDS:
                continue
            pred = self._expand(key)
            coerce = self.ctx.get(key, {}).get("@type")
            for v in val if isinstance(val, list) else [val]:
                self._value(subj, pred, v, coerce)
        return subj

    def _value(self, subj: str, pred: str, v, coerce=None):
        if isinstance(v, dict):
            if "@list" in v:
                items = v["@list"]
                if not items:
                    self._emit(subj, pred, RDF_NIL, False, None, None)
                    return
                cells = [self._bnode() for _ in items]
                self._emit(subj, pred, cells[0], False, None, None)
                for cell, item in zip(cells, items):
                    self._value(cell, RDF_FIRST, item, coerce)
                for a, b in zip(cells, cells[1:]):
                    self._emit(a, RDF_REST, b, False, None, None)
                self._emit(cells[-1], RDF_REST, RDF_NIL, False, None, None)
                return
            if "@value" in v:
                dt = v.get("@type")
                val = v["@value"]
                # native JSON types keep their canonical RDF lexical
                # form and implied datatype, same as the bare-value path
                if isinstance(val, bool):
                    lex, implied = ("true" if val else "false",
                                    XSD_NS + "boolean")
                elif isinstance(val, int):
                    lex, implied = str(val), XSD_NS + "integer"
                elif isinstance(val, float):
                    lex, implied = repr(val), XSD_NS + "double"
                else:
                    lex, implied = str(val), None
                self._emit(subj, pred, lex, True,
                           self._expand(dt) if dt else implied,
                           v.get("@language"))
                return
            if set(v) <= {"@id"} and "@id" in v:
                self._emit(subj, pred, self._node_ref(v["@id"]),
                           False, None, None)
                return
            # nested node object
            node = self._node(v)
            self._emit(subj, pred, node, False, None, None)
            return
        if isinstance(v, bool):
            self._emit(subj, pred, "true" if v else "false", True,
                       XSD_NS + "boolean", None)
        elif isinstance(v, int):
            self._emit(subj, pred, str(v), True, XSD_NS + "integer", None)
        elif isinstance(v, float):
            self._emit(subj, pred, repr(v), True, XSD_NS + "double", None)
        elif isinstance(v, str):
            if coerce == "@id":
                self._emit(subj, pred, self._node_ref(v), False, None, None)
            else:
                self._emit(subj, pred, v, True, None, None)
        else:
            raise JsonLdError(f"jsonld: bad value {v!r}")


def serialize_jsonld(rows, namespaces: dict | None = None) -> str:
    """Engine triple rows -> deterministic expanded-form JSON-LD text.

    Write-side complement of :func:`parse_jsonld` (reference
    ``graph.serialize(format='json-ld')`` coverage,
    ``ttlser/ttlfmt.py:78-100``).  Exact round-trip:
    ``parse_jsonld(serialize_jsonld(rows))`` returns the same row SET.
    Expanded form by design — no ``@context`` and full-IRI predicate
    keys (a compacting context saves bytes but makes the output depend
    on the prefix table; format interchange wants stability).  Every
    literal is a ``@value`` object with its lexical form as a JSON
    string (native JSON numbers would re-type xsd:integer vs
    xsd:double on re-parse); ``rdf:type`` goes through the plain
    predicate path, which the parser expands back to the same IRI.
    ``namespaces`` is accepted for signature parity with the other
    writers and ignored.  Lexical ``_:label`` nodes are emitted
    verbatim (valid JSON-LD); a re-parse re-labels them, same caveat
    as the RDF/XML writer."""
    by_subj: dict[str, dict] = {}
    for r in sorted(set(tuple(r) for r in rows),
                    key=lambda r: (r[0], r[1], str(r[2]),
                                   r[4] or "", r[5] or "")):
        subj, pred, obj, lit, dt, lang = r
        node = by_subj.setdefault(subj, {"@id": subj})
        vals = node.setdefault(pred, [])
        if not lit:
            vals.append({"@id": obj})
        else:
            v: dict = {"@value": obj}
            if dt:
                v["@type"] = dt
            if lang:
                v["@language"] = lang
            vals.append(v)
    doc = {"@graph": [by_subj[s] for s in sorted(by_subj)]}
    return json.dumps(doc, indent=2, sort_keys=True) + "\n"


def parse_jsonld(text: str, bnode_prefix: str = "") -> list[tuple]:
    """JSON-LD document text -> list of engine triple rows."""
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise JsonLdError(f"jsonld: not JSON: {e}") from e
    p = _Parser(bnode_prefix)
    if isinstance(doc, dict):
        p._load_context(doc.get("@context"))
        nodes = doc.get("@graph")
        if nodes is None:
            nodes = [doc] if (set(doc) - {"@context"}) else []
    elif isinstance(doc, list):
        nodes = doc
    else:
        raise JsonLdError("jsonld: document is not an object or array")
    for n in nodes:
        if not isinstance(n, dict):
            raise JsonLdError(f"jsonld: top-level node is not an "
                              f"object: {n!r}")
        p._node(n)
    return p.triples
