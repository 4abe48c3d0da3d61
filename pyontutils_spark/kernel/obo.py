"""OBO 1.2/1.4 stanza document parsing (pure Python kernel).

Reimplements the record model of the reference's ``obo_io``
(``pyontutils/obo_io.py:123-906``: header + typed stanzas of tag-value
pairs) as plain dicts, and the ``Term.triples()`` flatMap
(``obo_io.py:483-``) as ``stanza_triples``.  The Spark source wraps
``parse_obo`` per file (whole-file text -> stanza rows -> triple rows).

Supported tags (the working subset the reference emits triples for):
id, name, def, synonym (with scope), is_a, is_obsolete, replaced_by,
namespace, xref, comment, subset.  ``id_fix`` normalizes ``PFX:123``
ids to OBO PURLs (``obo_io.py:105-120`` semantics).
"""

from __future__ import annotations

import re

OBO_PURL = "http://purl.obolibrary.org/obo/"

_TAG = re.compile(r"^([A-Za-z_-]+):\s*(.*?)\s*(?:(?<!\\)!.*)?$")
_SYN = re.compile(r'^"((?:[^"\\]|\\.)*)"\s*([A-Z]*)')
_DEF = re.compile(r'^"((?:[^"\\]|\\.)*)"')


def id_fix(ident: str) -> str:
    """'GO:0005623' -> OBO PURL; full IRIs pass through
    (obo_io.py:105-120 semantics)."""
    if ident.startswith("http://") or ident.startswith("https://"):
        return ident
    if ":" in ident:
        prefix, local = ident.split(":", 1)
        return f"{OBO_PURL}{prefix}_{local}"
    return OBO_PURL + ident


def parse_obo(text: str) -> dict:
    """OBO document -> {'header': {tag: [values]},
    'stanzas': [{'type': 'Term'|'Typedef'|'Instance', tag: [values]}]}."""
    header: dict[str, list[str]] = {}
    stanzas: list[dict] = []
    cur: dict | None = None
    target: dict = header
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("!"):
            continue
        if line.startswith("[") and line.endswith("]"):
            cur = {"type": line[1:-1]}
            stanzas.append(cur)
            target = cur
            continue
        m = _TAG.match(line)
        if not m:
            continue
        tag, value = m.group(1), m.group(2).strip()
        if cur is None:
            header.setdefault(tag, []).append(value)
        else:
            target.setdefault(tag, []).append(value)
    return {"header": header, "stanzas": stanzas}


# Predicate IRIs for emitted triples (public OBO-in-OWL vocabulary).
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
OWL_OBJPROP = "http://www.w3.org/2002/07/owl#ObjectProperty"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_SUBCLASSOF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
OWL_DEPRECATED = "http://www.w3.org/2002/07/owl#deprecated"
IAO_REPLACED_BY = "http://purl.obolibrary.org/obo/IAO_0100001"
IAO_DEFINITION = "http://purl.obolibrary.org/obo/IAO_0000115"
OIO_HASEXACTSYN = "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym"
OIO_HASRELATEDSYN = "http://www.geneontology.org/formats/oboInOwl#hasRelatedSynonym"
OIO_HASDBXREF = "http://www.geneontology.org/formats/oboInOwl#hasDbXref"
OIO_NAMESPACE = "http://www.geneontology.org/formats/oboInOwl#hasOBONamespace"
RDFS_COMMENT = "http://www.w3.org/2000/01/rdf-schema#comment"

_SYN_PRED = {"EXACT": OIO_HASEXACTSYN}


def stanza_triples(stanza: dict):
    """One stanza -> (subj, pred, obj, is_literal) rows
    (Term.triples semantics, obo_io.py:483-)."""
    ids = stanza.get("id")
    if not ids:
        return
    subj = id_fix(ids[0])
    stype = stanza.get("type", "Term")
    yield (subj, RDF_TYPE,
           OWL_OBJPROP if stype == "Typedef" else OWL_CLASS, False)
    for name in stanza.get("name", [])[:1]:
        yield (subj, RDFS_LABEL, name, True)
    for d in stanza.get("def", []):
        m = _DEF.match(d)
        if m:
            yield (subj, IAO_DEFINITION, m.group(1), True)
    for s in stanza.get("synonym", []):
        m = _SYN.match(s)
        if m:
            pred = _SYN_PRED.get(m.group(2), OIO_HASRELATEDSYN)
            yield (subj, pred, m.group(1), True)
    for parent in stanza.get("is_a", []):
        yield (subj, RDFS_SUBCLASSOF, id_fix(parent.split("!")[0].strip()),
               False)
    for x in stanza.get("xref", []):
        yield (subj, OIO_HASDBXREF, x, True)
    for ns in stanza.get("namespace", [])[:1]:
        yield (subj, OIO_NAMESPACE, ns, True)
    for c in stanza.get("comment", [])[:1]:
        yield (subj, RDFS_COMMENT, c, True)
    if stanza.get("is_obsolete", ["false"])[0] == "true":
        yield (subj, OWL_DEPRECATED, "true", True)
        for r in stanza.get("replaced_by", []):
            yield (subj, IAO_REPLACED_BY, id_fix(r), False)


def format_obo_stanza(stanza: dict) -> str:
    """Inverse of parse for round-trip tests (obo write path,
    obo_io.py:191-214): tags in a fixed canonical order."""
    order = ["id", "name", "namespace", "def", "comment", "subset",
             "synonym", "xref", "is_a", "is_obsolete", "replaced_by"]
    lines = [f"[{stanza.get('type', 'Term')}]"]
    for tag in order:
        for v in stanza.get(tag, []):
            lines.append(f"{tag}: {v}")
    return "\n".join(lines) + "\n"
