"""CURIE / prefix namespace management.

Reimplements the *semantics* of the reference's namespace tooling as a
pure-Python, pickle-cheap object suitable for a Spark broadcast variable:

- ``expand(curie) -> iri`` with the exact guard behavior of
  ``makeGraph.expand`` (reference ``pyontutils/core.py:630-639``):
  URIRef passthrough, ``ValueError`` on space-in-prefix, ``KeyError`` on
  unknown prefix.
- ``coerce(thing)`` mirroring ``makeGraph.check_thing``
  (``pyontutils/core.py:641-653``): expansion failure falls back to
  treating ``http...``-with-no-space strings as IRIs.
- ``qname(iri) -> curie`` via longest-namespace-first match with the
  separator guard of ``cull_prefixes`` (``pyontutils/core.py:915-921``:
  no ``#`` or ``/`` may remain after the matched namespace), returning
  the input unchanged when no prefix matches (``makeGraph.qname``,
  ``pyontutils/core.py:796-803``).
- ``cull(iris)`` — the prefix-culling computation of ``cull_prefixes``
  (``pyontutils/core.py:898-929``): keep only prefixes whose namespace
  longest-prefix-matches at least one IRI, skipping ``.owl``/``.ttl``/
  ``$$ID$$``-suffixed IRIs.
- injectivity enforcement in both directions, per ``injective_dict``
  (``pyontutils/utils.py:252-310``).

The mapping data is a small curated table in the spirit of the
reference's ``nifstd/scigraph/curie_map.yaml`` + the hardcoded extras of
``_loadPrefixes`` (``pyontutils/namespaces.py:102-200``); it keeps the
adversarial shape of that table (shared-base namespaces requiring
longest-match such as NLX vs NLXANAT, ``#``- and ``/``-terminated
namespaces, and the separator-free ``SAO`` prefix).
"""

from __future__ import annotations

from bisect import bisect_right


class InjectivityError(ValueError):
    pass


# Standard W3C vocabularies (public namespace IRIs).
_CORE = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "prov": "http://www.w3.org/ns/prov#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "dc": "http://purl.org/dc/elements/1.1/",
    "dcterms": "http://purl.org/dc/terms/",
    "dctypes": "http://purl.org/dc/dcmitype/",
    "oboInOwl": "http://www.geneontology.org/formats/oboInOwl#",
}

# NIF-style namespaces: exercise longest-prefix matching (every NLX* shares
# the NIFSTD base; NLXSUB/NLXANAT share the NLX base) and the separator-free
# prefix case (SAO has no trailing '_' / '/' / '#').
_NIF = {
    "NIFSTD": "http://uri.neuinfo.org/nif/nifstd/",
    "BIRNLEX": "http://uri.neuinfo.org/nif/nifstd/birnlex_",
    "NIFEXT": "http://uri.neuinfo.org/nif/nifstd/nifext_",
    "NIFRID": "http://uri.neuinfo.org/nif/nifstd/readable/",
    "NLX": "http://uri.neuinfo.org/nif/nifstd/nlx_",
    "NLXANAT": "http://uri.neuinfo.org/nif/nifstd/nlx_anat_",
    "NLXCELL": "http://uri.neuinfo.org/nif/nifstd/nlx_cell_",
    "NLXCHEM": "http://uri.neuinfo.org/nif/nifstd/nlx_chem_",
    "NLXMOL": "http://uri.neuinfo.org/nif/nifstd/nlx_mol_",
    "NLXORG": "http://uri.neuinfo.org/nif/nifstd/nlx_organ_",
    "NLXSUB": "http://uri.neuinfo.org/nif/nifstd/nlx_subcell_",
    "SAO": "http://uri.neuinfo.org/nif/nifstd/sao",
}

# InterLex-style namespaces (ILX vs ilx differ only by case + path depth).
_ILX = {
    "ILX": "http://uri.interlex.org/base/ilx_",
    "ilx": "http://uri.interlex.org/",
    "ilxr": "http://uri.interlex.org/base/readable/",
    "ilxtr": "http://uri.interlex.org/tgbugs/uris/readable/",
    "TEMP": "http://uri.interlex.org/temp/uris/",
    "TEMPRAW": "http://uri.interlex.org/temp/uris/raw/",
}

# Readable predicate CURIEs used by the triple factory (IAO/RO/BFO ids are
# public OBO identifiers; the readable-name aliasing mirrors _loadPrefixes).
_PREDICATES = {
    # interlex predicate curies whose whole curie is the readable name
    # (empty suffix), per _loadPrefixes (namespaces.py:104-123)
    "ilx.isAbout": "http://uri.interlex.org/base/ilx_0381385",
    "ilx.partOf": "http://uri.interlex.org/base/ilx_0112785",
    "definition": "http://purl.obolibrary.org/obo/IAO_0000115",
    "editorNote": "http://purl.obolibrary.org/obo/IAO_0000116",
    "replacedBy": "http://purl.obolibrary.org/obo/IAO_0100001",
    "isAbout": "http://purl.obolibrary.org/obo/IAO_0000136",
    "importedFrom": "http://purl.obolibrary.org/obo/IAO_0000412",
    "partOf": "http://purl.obolibrary.org/obo/BFO_0000050",
    "hasPart": "http://purl.obolibrary.org/obo/BFO_0000051",
    "hasRole": "http://purl.obolibrary.org/obo/RO_0000087",
    "locatedIn": "http://purl.obolibrary.org/obo/RO_0001025",
    "derivesFrom": "http://purl.obolibrary.org/obo/RO_0001000",
    "UBERON": "http://purl.obolibrary.org/obo/UBERON_",
    "CHEBI": "http://purl.obolibrary.org/obo/CHEBI_",
    "GO": "http://purl.obolibrary.org/obo/GO_",
    "PR": "http://purl.obolibrary.org/obo/PR_",
    "NCBITaxon": "http://purl.obolibrary.org/obo/NCBITaxon_",
    "obo": "http://purl.obolibrary.org/obo/",
}

# Engine-local namespaces for the web-scale triple factory.
_ENGINE = {
    "page": "https://page.example.org/",  # page IRIs minted from urls
    "MENT": "http://uri.interlex.org/temp/uris/mention/",
}

DEFAULT_PREFIXES: dict[str, str] = {**_CORE, **_NIF, **_ILX, **_PREDICATES, **_ENGINE}


def check_injective(mapping: dict[str, str]) -> dict[str, str]:
    """Both directions must be injective (utils.py:252-310 semantics)."""
    seen: dict[str, str] = {}
    for k, v in mapping.items():
        if v in seen:
            raise InjectivityError(
                f"namespace {v!r} bound to both {seen[v]!r} and {k!r}")
        seen[v] = k
    return mapping


class PrefixMap:
    """Immutable prefix<->namespace bijection with longest-prefix qname.

    Designed to be built once on the driver and broadcast; ``qname`` is
    called per-IRI inside vectorized UDFs, so the lookup uses a sorted
    namespace list + bisect (O(log n) candidate location, then a short
    backward scan over namespaces sharing the candidate's prefix bytes).
    """

    __slots__ = ("prefix_to_ns", "ns_to_prefix", "_sorted_ns")

    def __init__(self, prefixes: dict[str, str] | None = None):
        prefixes = dict(DEFAULT_PREFIXES if prefixes is None else prefixes)
        for p in prefixes:
            if p == "":
                # 'NO EMPTY' rule of curie_map.yaml:2
                raise ValueError("empty prefix is banned")
        check_injective(prefixes)
        self.prefix_to_ns = prefixes
        self.ns_to_prefix = {v: k for k, v in prefixes.items()}
        self._sorted_ns = sorted(self.ns_to_prefix)

    # -- expand ---------------------------------------------------------
    def expand(self, curie: str) -> str:
        """CURIE -> IRI.  Guard semantics of makeGraph.expand
        (core.py:630-639).  Full IRIs pass through unchanged."""
        if curie.startswith("http://") or curie.startswith("https://") \
                or curie.startswith("file://"):
            return curie
        if ":" not in curie:
            raise ValueError(f"{curie!r} is not a curie (no colon)")
        prefix, suffix = curie.split(":", 1)
        if " " in prefix:
            raise ValueError(
                f"Namespace prefix {prefix!r} is not a valid curie prefix!")
        if prefix not in self.prefix_to_ns:
            raise KeyError(
                f"Namespace prefix {prefix} does not exist for {curie}")
        return self.prefix_to_ns[prefix] + suffix

    def coerce(self, thing: str) -> tuple[str, bool]:
        """check_thing semantics (core.py:641-653): try expand; on failure
        an http-no-space string is an IRI, anything else is a literal.
        Returns (value, is_iri)."""
        try:
            return self.expand(thing), True
        except (KeyError, ValueError):
            if thing.startswith("http") and " " not in thing:
                return thing, True
            return thing, False

    # -- qname ----------------------------------------------------------
    def match_namespace(self, iri: str) -> str | None:
        """Longest namespace that prefixes ``iri`` with no ``#``/``/``
        remaining after it (cull_prefixes guard, core.py:915-921).

        All namespaces that are prefixes of ``iri`` are nested, so a longer
        one sorts lexicographically after a shorter one: walking backward
        from the bisect insertion point, the first prefix hit is the
        longest.  If the longest match fails the separator guard, every
        shorter match fails too (its remainder is a strict superset), so
        the scan can return immediately — same result as the reference's
        longest-first linear scan.
        """
        i = bisect_right(self._sorted_ns, iri)
        for j in range(i - 1, -1, -1):
            ns = self._sorted_ns[j]
            if iri.startswith(ns):
                rest = iri[len(ns):]
                if "#" not in rest and "/" not in rest:
                    return ns
                return None
        return None

    def qname(self, iri: str) -> str:
        """IRI -> CURIE, or the IRI unchanged when no prefix matches
        (makeGraph.qname, core.py:796-803)."""
        ns = self.match_namespace(iri)
        if ns is None:
            return iri
        return f"{self.ns_to_prefix[ns]}:{iri[len(ns):]}"

    # -- culling --------------------------------------------------------
    def cull(self, iris) -> dict[str, str]:
        """Minimal prefix map actually used by ``iris``
        (cull_prefixes, core.py:898-929)."""
        used: set[str] = set()
        for iri in set(iris):
            if iri.endswith(".owl") or iri.endswith(".ttl") or iri.endswith("$$ID$$"):
                continue
            ns = self.match_namespace(iri)
            if ns is not None:
                used.add(self.ns_to_prefix[ns])
        return {p: self.prefix_to_ns[p] for p in sorted(used)}


# Module-level default instance (cheap; reused by UDF closures).
DEFAULT = PrefixMap()
