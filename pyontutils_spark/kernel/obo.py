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

_TAG = re.compile(r"^([A-Za-z_-]+):\s*(.*)$")


def _strip_comment(value: str) -> str:
    """Trim a trailing ``! ...`` OBO comment, respecting quoted strings:
    a ``!`` inside a double-quoted value (e.g.
    ``property_value: IAO:0000112 "use this! carefully"``) is data, not
    a comment.  Backslash escapes both quote and bang."""
    in_q = False
    i, n = 0, len(value)
    while i < n:
        c = value[i]
        if c == "\\":
            i += 2
            continue
        if c == '"':
            in_q = not in_q
        elif c == "!" and not in_q:
            return value[:i].rstrip()
        i += 1
    return value
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


def parse_trailing_modifiers(line: str):
    """OBO trailing modifiers ``{k="v", k2="v2"}`` (the TVPair modifier
    semantics exercised by the reference's ``test/test_oboio.py``
    vectors): the modifier block is the last brace pair whose braces
    are OUTSIDE quotes; quoted values may contain braces, commas and
    ``!``.  Returns (pairs, start, end) — pairs as a tuple of (key,
    value) tuples; start/end are the block's brace indices in ``line``
    (-1, -1 when absent)."""
    in_q = False
    opens = []
    for i, c in enumerate(line):
        if c == '"':
            in_q = not in_q
        elif c == "{" and not in_q:
            opens.append(i)
    for start in reversed(opens):
        in_q = False
        for j in range(start + 1, len(line)):
            c = line[j]
            if c == '"':
                in_q = not in_q
            elif c == "}" and not in_q:
                parts = []
                cur = []
                q2 = False
                for ch in line[start + 1:j]:
                    if ch == '"':
                        q2 = not q2
                        cur.append(ch)
                    elif ch == "," and not q2:
                        parts.append("".join(cur))
                        cur = []
                    else:
                        cur.append(ch)
                if cur:
                    parts.append("".join(cur))
                pairs = []
                for p in parts:
                    k, _, v = p.strip().partition("=")
                    v = v.strip()
                    if v.startswith('"') and v.endswith('"') and len(v) >= 2:
                        v = v[1:-1]
                    pairs.append((k.strip(), v))
                return tuple(pairs), start, j
    return (), -1, -1


def strip_trailing_modifiers(value: str) -> tuple[str, tuple]:
    """Remove a trailing modifier block from a tag value (it must be
    the last non-whitespace content); returns (clean_value, pairs)."""
    pairs, start, end = parse_trailing_modifiers(value)
    if pairs and value[end + 1:].strip() == "":
        return value[:start].rstrip(), pairs
    return value, ()


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
        tag, value = m.group(1), _strip_comment(m.group(2)).strip()
        # trailing modifiers ({source="X", ...}) are metadata, not part
        # of the value — strip so ids/literals parse clean
        value, _mods = strip_trailing_modifiers(value)
        if cur is None:
            header.setdefault(tag, []).append(value)
        else:
            target.setdefault(tag, []).append(value)
    return {"header": header, "stanzas": stanzas}


# Predicate IRIs for emitted triples (public OBO-in-OWL vocabulary).
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL = "http://www.w3.org/2002/07/owl#"
OWL_CLASS = OWL + "Class"
OWL_OBJPROP = OWL + "ObjectProperty"
OWL_ONTOLOGY = OWL + "Ontology"
OWL_IMPORTS = OWL + "imports"
OWL_VERSION_INFO = OWL + "versionInfo"
OWL_INVERSE_OF = OWL + "inverseOf"
OWL_DISJOINT_WITH = OWL + "disjointWith"
OWL_EQUIVALENT_CLASS = OWL + "equivalentClass"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_SUBCLASSOF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROPERTYOF = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
OWL_DEPRECATED = OWL + "deprecated"
IAO_REPLACED_BY = "http://purl.obolibrary.org/obo/IAO_0100001"
IAO_DEFINITION = "http://purl.obolibrary.org/obo/IAO_0000115"
_OIO = "http://www.geneontology.org/formats/oboInOwl#"
OIO_HASEXACTSYN = _OIO + "hasExactSynonym"
OIO_HASBROADSYN = _OIO + "hasBroadSynonym"
OIO_HASNARROWSYN = _OIO + "hasNarrowSynonym"
OIO_HASRELATEDSYN = _OIO + "hasRelatedSynonym"
OIO_HASDBXREF = _OIO + "hasDbXref"
OIO_NAMESPACE = _OIO + "hasOBONamespace"
OIO_ALT_ID = _OIO + "hasAlternativeId"
OIO_IN_SUBSET = _OIO + "inSubset"
OIO_CREATED_BY = _OIO + "created_by"
OIO_CREATION_DATE = _OIO + "creationDate"
OIO_CONSIDER = _OIO + "consider"
OIO_DEFAULT_NAMESPACE = _OIO + "hasDefaultNamespace"
RDFS_COMMENT = "http://www.w3.org/2000/01/rdf-schema#comment"

_SYN_PRED = {"EXACT": OIO_HASEXACTSYN, "BROAD": OIO_HASBROADSYN,
             "NARROW": OIO_HASNARROWSYN, "RELATED": OIO_HASRELATEDSYN}

#: Typedef boolean characteristic tag -> owl property class
#: (obo_io.py stanza tags is_transitive/is_symmetric/... :779-817)
_CHARACTERISTICS = {
    "is_transitive": OWL + "TransitiveProperty",
    "is_symmetric": OWL + "SymmetricProperty",
    "is_functional": OWL + "FunctionalProperty",
    "is_inverse_functional": OWL + "InverseFunctionalProperty",
    "is_reflexive": OWL + "ReflexiveProperty",
    "is_anti_symmetric": OWL + "AsymmetricProperty",
}


def _unesc(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def _clean_id(v: str) -> str:
    return id_fix(v.split("!")[0].strip())


def stanza_triples(stanza: dict):
    """One stanza -> (subj, pred, obj, is_literal) rows — the obo->owl
    tag mapping of the reference's stanza model (``obo_io.py:750-817``
    tag list; ``Term.triples`` emission) over the full OBO 1.4 tag set:
    definitions, scoped synonyms, xref/alt_id/subset, is_a/relationship,
    union_of/disjoint_from/equivalent_to, typedef characteristics +
    domain/range/inverse_of, obsolescence with replaced_by/consider,
    created_by/creation_date.

    Simplification (documented divergence): ``relationship: R T`` and
    ``intersection_of`` emit direct ``(subj, R, T)`` edges rather than
    existential-restriction subgraphs — the restriction form is
    available by feeding these rows to
    ``operators.combinators.emit_restrictions``."""
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
            yield (subj, IAO_DEFINITION, _unesc(m.group(1)), True)
    for s in stanza.get("synonym", []):
        m = _SYN.match(s)
        if m:
            pred = _SYN_PRED.get(m.group(2), OIO_HASRELATEDSYN)
            yield (subj, pred, _unesc(m.group(1)), True)
    sub_pred = RDFS_SUBPROPERTYOF if stype == "Typedef" else RDFS_SUBCLASSOF
    for parent in stanza.get("is_a", []):
        yield (subj, sub_pred, _clean_id(parent), False)
    for rel in stanza.get("relationship", []):
        parts = rel.split("!")[0].split()
        if len(parts) >= 2:
            yield (subj, id_fix(parts[0]), id_fix(parts[1]), False)
    for rel in stanza.get("intersection_of", []):
        parts = rel.split()
        if len(parts) == 1:
            yield (subj, RDFS_SUBCLASSOF, id_fix(parts[0]), False)
        elif len(parts) >= 2:
            yield (subj, id_fix(parts[0]), id_fix(parts[1]), False)
    # union_of emits FLAT (subj, owl:unionOf, member) edges — NOT
    # per-member equivalentClass (which would wrongly entail the members
    # are equivalent to each other).  The proper owl:unionOf list form
    # is available by feeding these rows to
    # operators.combinators.emit_predicate_list(OWL_UNION_OF).
    for v in stanza.get("union_of", []):
        yield (subj, OWL + "unionOf", _clean_id(v), False)
    # equivalent_to IS per-member equivalence by OBO semantics
    for v in stanza.get("equivalent_to", []):
        yield (subj, OWL_EQUIVALENT_CLASS, _clean_id(v), False)
    for v in stanza.get("disjoint_from", []):
        yield (subj, OWL_DISJOINT_WITH, _clean_id(v), False)
    for x in stanza.get("xref", []):
        yield (subj, OIO_HASDBXREF, x, True)
    for v in stanza.get("alt_id", []):
        yield (subj, OIO_ALT_ID, v, True)
    for v in stanza.get("subset", []):
        yield (subj, OIO_IN_SUBSET, _clean_id(v), False)
    for pv in stanza.get("property_value", []):
        parts = pv.split(None, 1)
        if len(parts) == 2:
            val = parts[1].strip()
            if val.startswith('"'):
                m = _DEF.match(val)
                if m:
                    yield (subj, id_fix(parts[0]), _unesc(m.group(1)), True)
            else:
                yield (subj, id_fix(parts[0]), id_fix(val.split()[0]), False)
    for ns in stanza.get("namespace", [])[:1]:
        yield (subj, OIO_NAMESPACE, ns, True)
    for c in stanza.get("comment", [])[:1]:
        yield (subj, RDFS_COMMENT, c, True)
    for v in stanza.get("created_by", [])[:1]:
        yield (subj, OIO_CREATED_BY, v, True)
    for v in stanza.get("creation_date", [])[:1]:
        yield (subj, OIO_CREATION_DATE, v, True)
    if stype == "Typedef":
        for tag, cls in _CHARACTERISTICS.items():
            if stanza.get(tag, ["false"])[0] == "true":
                yield (subj, RDF_TYPE, cls, False)
        for v in stanza.get("inverse_of", [])[:1]:
            yield (subj, OWL_INVERSE_OF, _clean_id(v), False)
        for v in stanza.get("domain", [])[:1]:
            yield (subj, RDFS_DOMAIN, _clean_id(v), False)
        for v in stanza.get("range", [])[:1]:
            yield (subj, RDFS_RANGE, _clean_id(v), False)
    if stanza.get("is_obsolete", ["false"])[0] == "true":
        yield (subj, OWL_DEPRECATED, "true", True)
        for r in stanza.get("replaced_by", []):
            yield (subj, IAO_REPLACED_BY, id_fix(r), False)
        for r in stanza.get("consider", []):
            yield (subj, OIO_CONSIDER, id_fix(r), False)


def header_triples(header: dict):
    """OBO header -> ontology-level triples (Header tag table,
    ``obo_io.py:702-749``): ontology IRI, imports, version info,
    default namespace, remarks."""
    onts = header.get("ontology", [])
    if not onts:
        return
    ont_iri = f"{OBO_PURL}{onts[0]}.owl"
    yield (ont_iri, RDF_TYPE, OWL_ONTOLOGY, False)
    for v in header.get("import", []):
        yield (ont_iri, OWL_IMPORTS,
               v if v.startswith("http") else id_fix(v), False)
    for v in header.get("data-version", [])[:1]:
        yield (ont_iri, OWL_VERSION_INFO, v, True)
    for v in header.get("default-namespace", [])[:1]:
        yield (ont_iri, OIO_DEFAULT_NAMESPACE, v, True)
    for v in header.get("remark", []):
        yield (ont_iri, RDFS_COMMENT, v, True)


def format_obo_stanza(stanza: dict) -> str:
    """Inverse of parse for round-trip tests (obo write path,
    obo_io.py:191-214): tags in a fixed canonical order."""
    order = ["id", "name", "namespace", "alt_id", "def", "comment",
             "subset", "synonym", "xref", "property_value",
             "domain", "range", "is_anti_symmetric", "is_functional",
             "is_inverse_functional", "is_reflexive", "is_symmetric",
             "is_transitive", "is_a", "intersection_of", "union_of",
             "equivalent_to", "disjoint_from", "inverse_of",
             "relationship", "is_obsolete", "replaced_by", "consider",
             "created_by", "creation_date"]
    lines = [f"[{stanza.get('type', 'Term')}]"]
    for tag in order:
        for v in stanza.get(tag, []):
            lines.append(f"{tag}: {v}")
    return "\n".join(lines) + "\n"
