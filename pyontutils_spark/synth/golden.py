"""Golden oracles: pure-Python reference implementations of linking and
triple emission, used to grade the Spark pipeline (P/R >= 0.95 target,
BASELINE.json:metric).

The linking policy mirrors the reference's label-resolution order:
exact label match outranks synonym match (``exhaustive_label_check`` vs
synonym rows, ``ilxutils/ilxutils/interlex_ingestion.py:103-117,
246-287``), with deterministic tie-breaking by natsort of the curie
(the reference breaks ties by picking the first hit of an ordered scan;
ours is order-independent by construction).

The emitted predicate vocabulary follows FIXTURES.md §5 / the reference:
``rdf:type``, ``rdfs:label``, ``NIFRID:synonym`` (propertyMapping,
``pyontutils/core.py:1013-1037``), ``ilx.isAbout:``
(``pyontutils/namespaces.py:122``), ``definition:`` (IAO_0000115),
``owl:deprecated`` + ``replacedBy:`` (``pyontutils/necromancy.py:134``),
``rdfs:subClassOf``.
"""

from __future__ import annotations

from ..kernel.curies import DEFAULT as PREFIXES
from ..kernel.ids import page_iri
from ..kernel.norm import local_degrade, natsort_key
from .lexicon import MIN_LENGTH

RDF_TYPE = PREFIXES.expand("rdf:type")
RDFS_LABEL = PREFIXES.expand("rdfs:label")
RDFS_SUBCLASSOF = PREFIXES.expand("rdfs:subClassOf")
OWL_CLASS = PREFIXES.expand("owl:Class")
OWL_DEPRECATED = PREFIXES.expand("owl:deprecated")
NIFRID_SYNONYM = PREFIXES.expand("NIFRID:synonym")
IS_ABOUT = PREFIXES.expand("ilx.isAbout:")
DEFINITION = PREFIXES.expand("definition:")
REPLACED_BY = PREFIXES.expand("replacedBy:")
WEBPAGE_CLASS = PREFIXES.expand("TEMP:WebPage")

SCORE_LABEL = 1.0
SCORE_SYNONYM = 0.9


def build_link_index(lexicon: list[dict]) -> dict[str, list[tuple[float, str, int]]]:
    """pattern_norm -> [(score, curie, term_id)] candidate lists."""
    idx: dict[str, list[tuple[float, str, int]]] = {}
    for t in lexicon:
        if len(t["label_norm"]) >= MIN_LENGTH:
            idx.setdefault(t["label_norm"], []).append(
                (SCORE_LABEL, t["curie"], t["term_id"]))
        for s in t["synonyms"]:
            sn = local_degrade(s)
            if len(sn) >= MIN_LENGTH:
                idx.setdefault(sn, []).append(
                    (SCORE_SYNONYM, t["curie"], t["term_id"]))
    return idx


def link_pattern(pattern_norm: str, idx) -> int | None:
    """Top-1 candidate: max score, then natsort-min curie."""
    cands = idx.get(pattern_norm)
    if not cands:
        return None
    best = min(cands, key=lambda c: (-c[0], natsort_key(c[1])))
    return best[2]


def page_linked_terms(page, idx) -> list[int]:
    """Distinct linked term_ids for one page, in first-mention order."""
    seen, out = set(), []
    for s, e, surface, pattern in page["mentions"]:
        tid = link_pattern(pattern, idx)
        if tid is not None and tid not in seen:
            seen.add(tid)
            out.append(tid)
    return out


def entity_triples(term: dict):
    """Lexicon-derived triples for one linked entity.
    (subj, pred, obj, obj_is_literal)"""
    iri = term["iri"]
    yield (iri, RDF_TYPE, OWL_CLASS, False)
    yield (iri, RDFS_LABEL, term["label"], True)
    for s in term["synonyms"]:
        yield (iri, NIFRID_SYNONYM, s, True)
    if term["definition"]:
        yield (iri, DEFINITION, term["definition"], True)
    for p in term["parents"]:
        yield (iri, RDFS_SUBCLASSOF, PREFIXES.expand(p), False)
    if term["deprecated"]:
        yield (iri, OWL_DEPRECATED, "true", True)
        if term["replaced_by"]:
            yield (iri, REPLACED_BY, PREFIXES.expand(term["replaced_by"]), False)


def canonicalized_corpus_triples(pages, lexicon):
    """Golden oracle for the canonicalization pass: union-find over
    duplicate-normalized-label groups of the emitted triples, canonical
    = natsort-min member, every triple rewritten through the mapping,
    owl:sameAs provenance per collapsed IRI."""
    triples = corpus_triples(pages, lexicon)
    by_label: dict[str, list[str]] = {}
    for s, p, o, il in triples:
        if p == RDFS_LABEL:
            by_label.setdefault(local_degrade(o), []).append(s)

    parent: dict[str, str] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    groups = [sorted(set(m)) for m in by_label.values() if len(set(m)) > 1]
    for members in groups:
        for m in members[1:]:
            union(members[0], m)
    comp: dict[str, list[str]] = {}
    for members in groups:
        for m in members:
            comp.setdefault(find(m), []).append(m)
    mapping: dict[str, str] = {}
    for members in comp.values():
        canon = min(set(members), key=natsort_key)
        for m in set(members):
            mapping[m] = canon

    out = set()
    for s, p, o, il in triples:
        ns = mapping.get(s, s)
        no = o if il else mapping.get(o, o)
        out.add((ns, p, no, il))
    for m, canon in mapping.items():
        if m != canon:
            out.add((m, PREFIXES.expand("owl:sameAs"), canon, False))
    return out


def corpus_triples(pages, lexicon) -> set[tuple[str, str, str, bool]]:
    """The full golden triple set for a page corpus (set semantics — the
    rdflib Graph the reference accumulates into is a set)."""
    idx = build_link_index(lexicon)
    by_id = {t["term_id"]: t for t in lexicon}
    triples: set[tuple[str, str, str, bool]] = set()
    linked_ids: set[int] = set()
    for page in pages:
        piri = page_iri(page["url"])
        triples.add((piri, RDF_TYPE, WEBPAGE_CLASS, False))
        for tid in page_linked_terms(page, idx):
            linked_ids.add(tid)
            triples.add((piri, IS_ABOUT, by_id[tid]["iri"], False))
    for tid in linked_ids:
        triples.update(entity_triples(by_id[tid]))
    return triples
