"""Synthetic ontology lexicon (labels + synonyms) for mention detection
and linking — the local replacement for the reference's InterLex `terms`
table (``ilxutils/ilxutils/interlex_sql.py:75-79``) and SciGraph
vocabulary service.

Shape per FIXTURES.md §3: iri, curie, label, synonyms, definition, type,
parents, deprecated(+replaced_by).  Includes the adversarial cases the
reference's code paths exercise:
- duplicate labels across two IRIs ("Pressumed to have duplicated
  labels", interlex_ingestion.py:106-108) -> sameAs candidates
- a label that is a strict prefix of another (longestOnly semantics,
  scigraph_client.py:181)
- a label below minLength (annotate's minLength param)
- case-variant + acronym synonyms (includeAbbrev/includeAcronym)
- deprecated terms with replacedBy targets (necromancy.py:102-134)
"""

from __future__ import annotations

from ..kernel.curies import DEFAULT as PREFIXES
from ..kernel.norm import local_degrade

# Word lists for composed labels.  DISJOINT from pages.FILLER by
# construction — mention ground truth depends on it.
_ADJ = ["granular", "pyramidal", "stellate", "spiny", "basket",
        "chandelier", "mossy", "radial", "cortical", "thalamic",
        "striatal", "callosal", "limbic", "tectal", "pontine",
        "olivary", "vestibular", "reticular", "septal", "habenular"]
_NOUN = ["neuron", "axon", "dendrite", "synapse", "soma", "nucleus",
         "ganglion", "fiber", "tract", "column", "lamina", "plexus",
         "fissure", "sulcus", "gyrus", "peduncle", "fasciculus",
         "commissure", "funiculus", "lemniscus"]

_CURIE_PREFIXES = ["ILX", "BIRNLEX", "NLX", "NLXANAT", "NLXCELL", "UBERON"]

MIN_LENGTH = 3  # annotate minLength analog


def _curie(i: int) -> str:
    p = _CURIE_PREFIXES[i % len(_CURIE_PREFIXES)]
    return f"{p}:{100000 + i}"


def make_lexicon(n_terms: int = 200) -> list[dict]:
    """Deterministic lexicon of ``n_terms`` composed terms + fixed
    adversarial specials appended at stable ids."""
    terms: list[dict] = []

    def add(label, synonyms=(), definition="", type_="term", parents=(),
            deprecated=False, replaced_by=None, curie=None):
        i = len(terms)
        c = curie or _curie(i)
        terms.append({
            "term_id": i,
            "curie": c,
            "iri": PREFIXES.expand(c),
            "label": label,
            "label_norm": local_degrade(label),
            "synonyms": list(synonyms),
            "definition": definition or f"definition of {label}",
            "type": type_,
            "parents": list(parents),
            "deprecated": deprecated,
            "replaced_by": replaced_by,
        })

    # --- fixed specials (stable positions 0..9) -------------------------
    # 0: the skewed head entity (~20% of pages mention it)
    add("hippocampus", synonyms=["Ammon's horn", "hippocampal formation"],
        definition="a medial temporal lobe structure")
    # 1+2: duplicate label across two IRIs -> sameAs candidate pair
    add("cortex", synonyms=["cortical mantle"])
    add("cortex", synonyms=["pallium"])
    # 3+4: strict-prefix pair (leftmost-longest)
    add("granule cell", synonyms=[])
    add("granule cell layer", synonyms=["GCL"])  # acronym synonym
    # 5: below-minLength label — must never produce mentions
    add("ca")
    # 6: case-variant synonym
    add("purkinje cell", synonyms=["Purkinje Neuron", "PC"])
    # 7: deprecated term replaced by term 0
    add("cornu ammonis", deprecated=True, replaced_by=_curie(0))
    # 8: multiword with inner stopword-ish token
    add("nucleus of the solitary tract", synonyms=["NTS"])
    # 9: parentful term
    add("dentate gyrus", parents=[_curie(0)])

    # --- composed bulk terms --------------------------------------------
    i = 0
    while len(terms) < n_terms:
        a = _ADJ[i % len(_ADJ)]
        b = _NOUN[(i // len(_ADJ)) % len(_NOUN)]
        n = i // (len(_ADJ) * len(_NOUN))
        label = f"{a} {b}" if n == 0 else f"{a} {b} {n}"
        syns = []
        if i % 7 == 0:
            syns.append(label.title())        # case variant
        if i % 11 == 0:
            syns.append((a[:1] + b[:1] + (str(n) if n else "")).upper())
        add(label, synonyms=syns,
            parents=[_curie(i % 10)] if i % 3 == 0 else [],
            deprecated=(i % 37 == 0),
            replaced_by=_curie((i + 1) % 10) if i % 37 == 0 else None)
        i += 1

    return terms


def match_entries(lexicon: list[dict]):
    """(pattern_norm, (term_id, is_synonym)) pairs for the AC automaton —
    label + every synonym, degraded; patterns below MIN_LENGTH dropped by
    the automaton builder."""
    out = []
    for t in lexicon:
        out.append((t["label_norm"], (t["term_id"], False)))
        for s in t["synonyms"]:
            out.append((local_degrade(s), (t["term_id"], True)))
    return out
