"""Predicate/class vocabulary emitted by the triple factory.

Closed-vocabulary discipline mirrors the reference's ClosedNamespace
usage (``pyontutils/closed_namespaces.py``): only these IRIs may appear
in the ``pred`` column of factory-emitted triples; a constraint check in
the pipeline enforces it.
"""

from ..kernel.curies import DEFAULT as PREFIXES

RDF_TYPE = PREFIXES.expand("rdf:type")
RDFS_LABEL = PREFIXES.expand("rdfs:label")
RDFS_SUBCLASSOF = PREFIXES.expand("rdfs:subClassOf")
OWL_CLASS = PREFIXES.expand("owl:Class")
OWL_DEPRECATED = PREFIXES.expand("owl:deprecated")
OWL_SAMEAS = PREFIXES.expand("owl:sameAs")
NIFRID_SYNONYM = PREFIXES.expand("NIFRID:synonym")
IS_ABOUT = PREFIXES.expand("ilx.isAbout:")     # namespaces.py:122
DEFINITION = PREFIXES.expand("definition:")    # IAO_0000115
REPLACED_BY = PREFIXES.expand("replacedBy:")   # IAO_0100001, necromancy.py:134
WEBPAGE_CLASS = PREFIXES.expand("TEMP:WebPage")

EMITTED_PREDICATES = frozenset({
    RDF_TYPE, RDFS_LABEL, RDFS_SUBCLASSOF, OWL_DEPRECATED, OWL_SAMEAS,
    NIFRID_SYNONYM, IS_ABOUT, DEFINITION, REPLACED_BY,
})

TRIPLE_SCHEMA = ("subj string, pred string, obj string, "
                 "obj_is_literal boolean, obj_datatype string, "
                 "obj_lang string")
