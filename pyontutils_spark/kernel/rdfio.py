"""RDF line-format parsing/serialization primitives (pure Python).

- N-Triples line parse/serialize (the simplest of the formats the
  reference round-trips via ``ttlfmt``, ``ttlser/ttlser/ttlfmt.py:75``;
  format list includes nt).
- Canonical Turtle emission for a *sorted* triple stream — reproduces
  the shape of the reference's deterministic serializer
  (``CustomTurtleSerializer``, ``ttlser/ttlser/serializers.py:746-778``):
  prefix block (culled, sorted), subject blocks with ``;``-chained
  predicates and ``,``-chained objects, literals escaped and typed.
  The ORDER of subjects/predicates/objects is supplied by the caller
  (operators/ordering.py computes it distributively); this module only
  formats.
"""

from __future__ import annotations

import re

_NT_LINE = re.compile(
    r"^\s*<([^>]*)>\s+<([^>]*)>\s+"
    r"(?:<([^>]*)>|\"((?:[^\"\\]|\\.)*)\""
    r"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?)\s*\.\s*$")

_ESCAPES = {"\\n": "\n", "\\r": "\r", "\\t": "\t", '\\"': '"',
            "\\\\": "\\"}
_RX_UNESC = re.compile(r"\\[nrt\"\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}")


def _unescape(s: str) -> str:
    def sub(m):
        t = m.group(0)
        if t in _ESCAPES:
            return _ESCAPES[t]
        return chr(int(t[2:], 16))
    return _RX_UNESC.sub(sub, s)


def _escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


def parse_ntriple(line: str):
    """Parse one N-Triples line -> (subj, pred, obj, is_literal,
    datatype, lang) or None for blank/comment/unparseable lines.
    BNodes are not supported (the engine skolemizes; see kernel.ids)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    m = _NT_LINE.match(line)
    if not m:
        return None
    subj, pred, obj_iri, obj_lit, lang, dtype = m.groups()
    if obj_iri is not None:
        return (subj, pred, obj_iri, False, None, None)
    return (subj, pred, _unescape(obj_lit), True, dtype, lang)


def format_ntriple(subj: str, pred: str, obj: str, is_literal: bool,
                   datatype: str | None = None,
                   lang: str | None = None) -> str:
    if not is_literal:
        return f"<{subj}> <{pred}> <{obj}> ."
    lit = f'"{_escape(obj)}"'
    if lang:
        lit += f"@{lang}"
    elif datatype:
        lit += f"^^<{datatype}>"
    return f"<{subj}> <{pred}> {lit} ."


def _term(value: str, is_literal: bool, datatype, lang, qname) -> str:
    if is_literal:
        lit = f'"{_escape(value)}"'
        if lang:
            lit += f"@{lang}"
        elif datatype:
            q = qname(datatype)
            lit += f"^^{q}" if q != datatype else f"^^<{datatype}>"
        return lit
    q = qname(value)
    if q == "rdf:type":
        return "a"
    return q if q != value else f"<{value}>"


def format_turtle(sorted_triples, prefix_map) -> str:
    """Canonical turtle text from triples already in canonical order
    (subject-major).  ``sorted_triples``: iterable of (subj, pred, obj,
    is_literal, datatype, lang).  ``prefix_map``: kernel.curies.PrefixMap.

    Output shape follows the reference's nifttl: culled+sorted @prefix
    block, blank line, one block per subject with 4-space continuation,
    ``;`` between predicates, ``,`` between objects, final ``.``.
    """
    triples = list(sorted_triples)
    used = [t[0] for t in triples] + [t[1] for t in triples] + \
        [t[2] for t in triples if not t[3]] + \
        [t[4] for t in triples if t[3] and t[4]]
    culled = prefix_map.cull(u for u in used if u)
    lines = [f"@prefix {p}: <{ns}> ." for p, ns in sorted(culled.items())]
    out = lines
    qn = prefix_map.qname

    cur_subj = None
    cur_pred = None
    block: list[str] = []

    def flush():
        if block:
            out.append("".join(block) + " .")
            block.clear()

    for subj, pred, obj, is_lit, dt, lang in triples:
        term = _term(obj, is_lit, dt, lang, qn)
        if subj != cur_subj:
            flush()
            out.append("")
            sterm = qn(subj)
            block.append(f"{sterm if sterm != subj else f'<{subj}>'}")
            cur_pred = None
            cur_subj = subj
        if pred != cur_pred:
            pterm = "a" if qn(pred) == "rdf:type" else qn(pred)
            if pterm == pred:
                pterm = f"<{pred}>"
            sep = " ;" if cur_pred is not None else ""
            block.append(f"{sep}\n    {pterm} {term}")
            cur_pred = pred
        else:
            block.append(f",\n        {term}")
    flush()
    return "\n".join(out) + "\n"
