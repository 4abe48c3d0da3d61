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

The mapping data is the FULL vendored reference table: all active
entries of ``nifstd/scigraph/curie_map.yaml`` plus the hardcoded
extras of ``_loadPrefixes`` (``pyontutils/namespaces.py:102-200``) —
192 prefixes total, including the adversarial shapes (shared-base
namespaces requiring longest-match such as NLX vs NLXANAT vs NLXBR,
``#``- and ``/``-terminated namespaces, the separator-free ``SAO``
and ``PTHR`` prefixes, the mutually nested chebi1/chebi2/chebi3
``#``-namespaces, and readable-predicate aliases whose whole curie is
the name — ``partOf:`` — which shadow their id-namespace spelling
exactly like the reference).
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

# Full vendored curie table (nifstd/scigraph/curie_map.yaml, all 130
# active entries).  The yaml's first rule — '' mapped to an ERROR
# namespace ("NO EMPTY") — is enforced here by PrefixMap's constructor
# raise instead of an error IRI.  Adversarial shapes preserved: every
# NLX* shares the NIFSTD base, NLXSUB/NLXANAT/... share the NLX base,
# SAO and PTHR are separator-free, chebi1/chebi2/chebi3 are mutually
# nested '#'-namespaces, FMA/fma differ only by the trailing repeat.
_CURIE_MAP = {
    # NIFSTD base + namespaces
    "NIFSTD": "http://uri.neuinfo.org/nif/nifstd/",
    "BIRNLEX": "http://uri.neuinfo.org/nif/nifstd/birnlex_",
    "NIFEXT": "http://uri.neuinfo.org/nif/nifstd/nifext_",
    "NIFRID": "http://uri.neuinfo.org/nif/nifstd/readable/",
    "NLX": "http://uri.neuinfo.org/nif/nifstd/nlx_",
    "NLXANAT": "http://uri.neuinfo.org/nif/nifstd/nlx_anat_",
    "NLXBR": "http://uri.neuinfo.org/nif/nifstd/nlx_br_",
    "NLXCELL": "http://uri.neuinfo.org/nif/nifstd/nlx_cell_",
    "NLXCHEM": "http://uri.neuinfo.org/nif/nifstd/nlx_chem_",
    "NLXDYS": "http://uri.neuinfo.org/nif/nifstd/nlx_dys_",
    "NLXFUNC": "http://uri.neuinfo.org/nif/nifstd/nlx_func_",
    "NLXINV": "http://uri.neuinfo.org/nif/nifstd/nlx_inv_",
    "NLXMOL": "http://uri.neuinfo.org/nif/nifstd/nlx_mol_",
    "NLXNEURNT": "http://uri.neuinfo.org/nif/nifstd/nlx_neuron_nt_",
    "NLXOEN": "http://uri.neuinfo.org/nif/nifstd/oen_",
    "NLXORG": "http://uri.neuinfo.org/nif/nifstd/nlx_organ_",
    "NLXQUAL": "http://uri.neuinfo.org/nif/nifstd/nlx_qual_",
    "NLXRES": "http://uri.neuinfo.org/nif/nifstd/nlx_res_",
    "NLXSUB": "http://uri.neuinfo.org/nif/nifstd/nlx_subcell_",
    "NLXUBO": "http://uri.neuinfo.org/nif/nifstd/nlx_ubo_",
    "NLXUNCL": "http://uri.neuinfo.org/nif/nifstd/nlx_uncl_",
    "SAO": "http://uri.neuinfo.org/nif/nifstd/sao",
    # interlex
    "ILX": "http://uri.interlex.org/base/ilx_",
    "ilx": "http://uri.interlex.org/",
    "ilxr": "http://uri.interlex.org/base/readable/",
    "TEMP": "http://uri.interlex.org/temp/uris/",
    "ILXREPLACE": "http://ILXREPLACE.org/",
    # interlex user/org namespaces
    "DICOM": "http://uri.interlex.org/dicom/uris/terms/",
    "PAR": "http://uri.interlex.org/fakeobo/uris/obo/PAR_",
    "PAXRAT": "http://uri.interlex.org/paxinos/uris/rat/labels/",
    "PAXMUS": "http://uri.interlex.org/paxinos/uris/mouse/labels/",
    "NDA.CDE": "http://uri.interlex.org/NDA/uris/datadictionary/elements/",
    "ilxtr": "http://uri.interlex.org/tgbugs/uris/readable/",
    # alternate ids
    "GBIF": "http://www.gbif.org/species/",
    "ITISTSN": ("http://www.itis.gov/servlet/SingleRpt/SingleRpt"
                "?search_topic=TSN&search_value="),
    "MESH": "https://meshb.nlm.nih.gov/record/ui?ui=",
    "RadLex": "http://www.radlex.org/RID/",
    "SBO": "http://www.ebi.ac.uk/sbo/main/SBO:",
    # scicrunch registry
    "SCR": "http://scicrunch.org/resolver/SCR_",
    # ontologies
    "obo": "http://purl.obolibrary.org/obo/",
    "HP": "http://purl.obolibrary.org/obo/HP_",
    "RO": "http://purl.obolibrary.org/obo/RO_",
    "OBI": "http://purl.obolibrary.org/obo/OBI_",
    "IAO": "http://purl.obolibrary.org/obo/IAO_",
    "SO": "http://purl.obolibrary.org/obo/SO_",
    "BFO": "http://purl.obolibrary.org/obo/BFO_",
    "DOID": "http://purl.obolibrary.org/obo/DOID_",
    "MONDO": "http://purl.obolibrary.org/obo/MONDO_",
    "PATO": "http://purl.obolibrary.org/obo/PATO_",
    "PR": "http://purl.obolibrary.org/obo/PR_",
    "PW": "http://purl.obolibrary.org/obo/PW_",
    "CL": "http://purl.obolibrary.org/obo/CL_",
    "MA": "http://purl.obolibrary.org/obo/MA_",
    "MP": "http://purl.obolibrary.org/obo/MP_",
    "CLO": "http://purl.obolibrary.org/obo/CLO_",
    "GO": "http://purl.obolibrary.org/obo/GO_",
    "SIO": "http://semanticscience.org/resource/SIO_",
    "EFO": "http://www.ebi.ac.uk/efo/EFO_",
    "SWO": "http://www.ebi.ac.uk/efo/swo/SWO_",
    "SWOL": "http://www.ebi.ac.uk/swo/license/SWO_",
    "UBERON": "http://purl.obolibrary.org/obo/UBERON_",
    "ERO": "http://purl.obolibrary.org/obo/ERO_",
    "NCBIGene": "http://www.ncbi.nlm.nih.gov/gene/",
    "NCBITaxon": "http://purl.obolibrary.org/obo/NCBITaxon_",
    "UO": "http://purl.obolibrary.org/obo/UO_",
    "CHEBI": "http://purl.obolibrary.org/obo/CHEBI_",
    "chebi": "http://purl.obolibrary.org/obo/chebi/",
    "FMA": "http://purl.org/sig/ont/fma/fma",
    "fma": "http://purl.org/sig/ont/fma/",
    "HBA": "http://api.brain-map.org:80/api/v2/data/Structure/",
    "MBA": "http://api.brain-map.org/api/v2/data/Structure/",
    "BFO1": "http://www.ifomis.org/bfo/1.1#",
    "BFO1SNAP": "http://www.ifomis.org/bfo/1.1/snap#",
    "BFO1SPAN": "http://www.ifomis.org/bfo/1.1/span#",
    "CAO": "http://www.cognitiveatlas.org/ontology/cogat.owl#CAO_",
    "COGAT": "http://www.cognitiveatlas.org/ontology/cogat.owl#",
    "COGPO": "http://www.cogpo.org/ontologies/COGPO_",
    "COGPO1": "http://www.cogpo.org/ontologies/CogPOver1.owl#COGPO_",
    "COGPO10": "http://www.cogpo.org/ontologies/CogPOver2010.owl#COGPO_",
    "TRANS": "http://purl.obolibrary.org/obo/TRANS_",
    "SYMP": "http://purl.obolibrary.org/obo/SYMP_",
    # NIF import closure
    "BIRNANN": ("http://ontology.neuinfo.org/NIF/Backend/"
                "BIRNLex_annotation_properties.owl#"),
    "BIRNOBI": ("http://ontology.neuinfo.org/NIF/Backend/"
                "BIRNLex-OBI-proxy.owl#"),
    "BIRNOBO": ("http://ontology.neuinfo.org/NIF/Backend/"
                "BIRNLex-OBO-UBO.owl#"),
    "NIFQUAL": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                "NIF-Quality.owl#"),
    "OBOANN": ("http://ontology.neuinfo.org/NIF/Backend/"
               "OBO_annotation_properties.owl#"),
    "NIFANN": ("http://ontology.neuinfo.org/NIF/"
               "NIF-Annotation-Standard.owl#"),
    "NIFCELL": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                "NIF-Cell.owl#"),
    "NIFCHEM": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                "NIF-Chemical.owl#"),
    "NIFGA": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
              "NIF-GrossAnatomy.owl#"),
    "NIFMOL": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
               "NIF-Molecule.owl#"),
    "NIFORG": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
               "NIF-Organism.owl#"),
    "NIFSUB": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
               "NIF-Subcellular.owl#"),
    "NIFUNCL": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                "NIF-Unclassified.owl#"),
    "SAOCORE": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                "SAO-CORE_properties.owl#"),
    "NIFGG": ("http://ontology.neuinfo.org/NIF/DigitalEntities/"
              "NIF-Government-Granting-Agency.owl#"),
    "NIFINV": ("http://ontology.neuinfo.org/NIF/DigitalEntities/"
               "NIF-Investigation.owl#"),
    "NIFRES": ("http://ontology.neuinfo.org/NIF/DigitalEntities/"
               "NIF-Resource.owl#"),
    "NIFSCID": ("http://ontology.neuinfo.org/NIF/DigitalEntities/"
                "NIF-Scientific-Discipline.owl#"),
    "NIFDYS": ("http://ontology.neuinfo.org/NIF/Dysfunction/"
               "NIF-Dysfunction.owl#"),
    "NIFFUN": ("http://ontology.neuinfo.org/NIF/Function/"
               "NIF-Function.owl#"),
    # inferred or slim
    "NIFMOLINF": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                  "NIF-Molecule-Role-Inferred.owl#"),
    "NIFNCBISLIM": ("http://ontology.neuinfo.org/NIF/"
                    "BiomaterialEntities/NIF-NCBITaxonomy-Slim.owl#"),
    # bridge
    "NIFMOLROLE": ("http://ontology.neuinfo.org/NIF/"
                   "BiomaterialEntities/NIF-Molecule-Role-Bridge#"),
    "NIFNCBI": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                "NIF-NCBITax-Bridge.owl#"),
    "NIFNEURMC": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                  "NIF_Neuron_MolecularConstituent_Bridge.owl#"),
    "NIFNEURBR": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                  "NIF-Neuron-BrainRegion-Bridge.owl#"),
    "NIFNEURBR2": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                   "NIF-Neuron-Brain-Bridge.owl#"),
    "NIFNEURCIR": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                   "NIF-Neuron-Circuit-Role-Bridge.owl#"),
    "NIFNEURMOR": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                   "NIF-Neuron-Morphology-Bridge.owl#"),
    "NIFNEURNT": ("http://ontology.neuinfo.org/NIF/BiomaterialEntities/"
                  "NIF-Neuron-NT-Bridge.owl#"),
}

# The hardcoded extras of _loadPrefixes (namespaces.py:102-200): the
# readable-predicate aliases (whole curie IS the readable name, empty
# suffix) plus the 'normal' namespace extras.
_EXTRAS = {
    # interlex predicates (namespaces.py:106-127)
    "ilx.federatesElement": "http://uri.interlex.org/base/ilx_0381445",
    "ilx.relatedTo": "http://uri.interlex.org/base/ilx_0112796",
    "ilx.hasRole": "http://uri.interlex.org/base/ilx_0112784",
    "ilx.partOf": "http://uri.interlex.org/base/ilx_0112785",
    "ilx.anno.hasConstraint": "http://uri.interlex.org/base/ilx_0115071",
    "ilx.anno.filterElement": "http://uri.interlex.org/base/ilx_0381352",
    "ilx.anno.required": "http://uri.interlex.org/base/ilx_0381353",
    "ilx.anno.condition": "http://uri.interlex.org/base/ilx_0381354",
    "ilx.anno.size": "http://uri.interlex.org/base/ilx_0381355",
    "ilx.anno.minValue": "http://uri.interlex.org/base/ilx_0381356",
    "ilx.anno.maxValue": "http://uri.interlex.org/base/ilx_0381357",
    "ilx.anno.allowedTypes": "http://uri.interlex.org/base/ilx_0381358",
    "ilx.anno.allowedValues": "http://uri.interlex.org/base/ilx_0381359",
    "ilx.hasDbXref": "http://uri.interlex.org/base/ilx_0381360",
    "ilx.hasUnit": "http://uri.interlex.org/base/ilx_0381384",
    "ilx.isAbout": "http://uri.interlex.org/base/ilx_0381385",
    "ilx.hasLaterality": "http://uri.interlex.org/base/ilx_0381387",
    "ilx.hasMeasurementType": "http://uri.interlex.org/base/ilx_0381388",
    "ilx.isMeasureOf": "http://uri.interlex.org/base/ilx_0381389",
    # RO predicates (namespaces.py:133-149)
    "hasRole": "http://purl.obolibrary.org/obo/RO_0000087",
    "inheresIn": "http://purl.obolibrary.org/obo/RO_0000052",
    "bearerOf": "http://purl.obolibrary.org/obo/RO_0000053",
    "participatesIn": "http://purl.obolibrary.org/obo/RO_0000056",
    "hasParticipant": "http://purl.obolibrary.org/obo/RO_0000057",
    "hasInput": "http://purl.obolibrary.org/obo/RO_0002233",
    "hasOutput": "http://purl.obolibrary.org/obo/RO_0002234",
    "adjacentTo": "http://purl.obolibrary.org/obo/RO_0002220",
    "derivesFrom": "http://purl.obolibrary.org/obo/RO_0001000",
    "derivesInto": "http://purl.obolibrary.org/obo/RO_0001001",
    "agentIn": "http://purl.obolibrary.org/obo/RO_0002217",
    "hasAgent": "http://purl.obolibrary.org/obo/RO_0002218",
    "containedIn": "http://purl.obolibrary.org/obo/RO_0001018",
    "contains": "http://purl.obolibrary.org/obo/RO_0001019",
    "locatedIn": "http://purl.obolibrary.org/obo/RO_0001025",
    "locationOf": "http://purl.obolibrary.org/obo/RO_0001015",
    "toward": "http://purl.obolibrary.org/obo/RO_0002503",
    # IAO predicates (namespaces.py:151-162)
    "replacedBy": "http://purl.obolibrary.org/obo/IAO_0100001",
    "hasCurStatus": "http://purl.obolibrary.org/obo/IAO_0000114",
    "definition": "http://purl.obolibrary.org/obo/IAO_0000115",
    "editorNote": "http://purl.obolibrary.org/obo/IAO_0000116",
    "termEditor": "http://purl.obolibrary.org/obo/IAO_0000117",
    "altTerm": "http://purl.obolibrary.org/obo/IAO_0000118",
    "defSource": "http://purl.obolibrary.org/obo/IAO_0000119",
    "termsMerged": "http://purl.obolibrary.org/obo/IAO_0000227",
    "obsReason": "http://purl.obolibrary.org/obo/IAO_0000231",
    "curatorNote": "http://purl.obolibrary.org/obo/IAO_0000232",
    "importedFrom": "http://purl.obolibrary.org/obo/IAO_0000412",
    "isAbout": "http://purl.obolibrary.org/obo/IAO_0000136",
    # BFO predicates (namespaces.py:164-169)
    "realizedIn": "http://purl.obolibrary.org/obo/BFO_0000054",
    "realizes": "http://purl.obolibrary.org/obo/BFO_0000055",
    "partOf": "http://purl.obolibrary.org/obo/BFO_0000050",
    "hasPart": "http://purl.obolibrary.org/obo/BFO_0000051",
    # 'normal' namespace extras (namespaces.py:172-196)
    "fobo": "http://uri.interlex.org/fakeobo/uris/obo/",
    "hyp": "https://hyp.is/",
    "PROTEGE": "http://protege.stanford.edu/plugins/owl/protege#",
    "TEMPRAW": "http://uri.interlex.org/temp/uris/raw/",
    "FIXME": "http://FIXME.org/",
    "NIFRAW": "https://raw.githubusercontent.com/SciCrunch/NIF-Ontology/",
    "NIFTTL": "http://ontology.neuinfo.org/NIF/ttl/",
    "NIFRET": "http://ontology.neuinfo.org/NIF/Retired/NIF-Retired.owl#",
    "NLXWIKI": "http://neurolex.org/wiki/",
    "nsu": "http://www.FIXME.org/nsupper#",
    "ro": "http://www.obofoundry.org/ro/ro.owl#",
    "chebi1": "http://purl.obolibrary.org/obo/chebi#2",
    "chebi2": "http://purl.obolibrary.org/obo/chebi#",
    "chebi3": "http://purl.obolibrary.org/obo/chebi#3",
    "JAX": "http://jaxmice.jax.org/strain/",
    "PTHR": ("http://www.pantherdb.org/panther/family.do"
             "?clsAccession=PTHR"),
}

# Engine-local namespaces for the web-scale triple factory.
_ENGINE = {
    "page": "https://page.example.org/",  # page IRIs minted from urls
    "MENT": "http://uri.interlex.org/temp/uris/mention/",
}

# Merge order mirrors _loadPrefixes (namespaces.py:198-200): curie map
# first, extras update it (key conflicts like TEMP/oboInOwl carry equal
# values).  _CORE adds the W3C entries the yaml omits (xsd etc.);
# _ENGINE adds this engine's own namespaces.
DEFAULT_PREFIXES: dict[str, str] = {
    **_CORE, **_CURIE_MAP, **_EXTRAS, **_ENGINE}


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
