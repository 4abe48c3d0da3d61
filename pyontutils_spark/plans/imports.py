"""owl:imports localization — the end-to-end ``local_imports`` pass
(reference ``pyontutils/ontload.py:395-490``): starting from a set of
ontology files, BFS-chase ``owl:imports`` triples, map remote ontology
IRIs onto local file paths, rewrite each file's imports to
``file://<local>`` form, and emit the provenance triples the reference
returns — ``(ontology_iri, owl:sameAs, <local path>)`` per parsed file
plus the original ``(s, owl:imports, o)`` edges.

Shape: the import GRAPH is metadata-scale (hundreds of files), so the
chase is a driver loop like the engine's other bounded BFS operators —
but each round's parsing runs through the per-file Spark source
(``read_rdf``'s mapInPandas), so a 10k-file closure still parses with
full parallelism; only the tiny (ontology, import) edge set is
collected per round.  Rewritten files are serialized with the
byte-compatible nifttl writer, preserving each document's own prefix
block (what the reference's in-place rewrite does).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import vocab

OWL_IMPORTS = "http://www.w3.org/2002/07/owl#imports"
OWL_ONTOLOGY = "http://www.w3.org/2002/07/owl#Ontology"


def imports_edges(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Parse ``paths`` through the per-file Spark source and return the
    (src_file, ont_iri, imported) edge rows plus ontology IRRs:
    columns (src_file, kind='ontology'|'imports', subj, obj)."""
    from ..sources.rdf import read_turtle_with_src
    t = read_turtle_with_src(spark, paths)
    onts = (t.filter((F.col("pred") == vocab.RDF_TYPE)
                     & (F.col("obj") == OWL_ONTOLOGY))
            .select("src_file", F.lit("ontology").alias("kind"),
                    "subj", F.col("subj").alias("obj")))
    imps = (t.filter(F.col("pred") == OWL_IMPORTS)
            .select("src_file", F.lit("imports").alias("kind"),
                    "subj", "obj"))
    return onts.unionByName(imps)


def _to_local(iri: str, remote_base: str, local_base: str) -> str:
    return iri.replace(remote_base, local_base)


def chase_imports(spark: SparkSession, starts: list[str],
                  remote_base: str, local_base: str,
                  max_rounds: int = 30):
    """Bounded BFS over the imports graph (ontload.py:528-529 recursion
    made iterative).  Returns (done_paths, edge_rows, sameas_rows):

    - done_paths: every local file visited, in visit order
    - edge_rows: (src_file, ont_iri, imported_iri) original edges
    - sameas_rows: (ont_iri, local_path) — one per parsed ontology,
      the reference's ``(s, owl.sameAs, local_filepath)`` provenance
    """
    done: list[str] = []
    edges: list[tuple] = []
    sameas: list[tuple] = []
    frontier = [p for p in starts if os.path.exists(p)]
    done.extend(frontier)
    for _ in range(max_rounds):
        if not frontier:
            break
        rows = imports_edges(spark, frontier).collect()
        nxt = []
        for r in rows:
            if r.kind == "ontology":
                sameas.append((r.subj, r.src_file))
            else:
                edges.append((r.src_file, r.subj, r.obj))
                local = _to_local(r.obj, remote_base, local_base)
                if (local.startswith(local_base) and local not in done
                        and not local.startswith("file://")
                        and os.path.exists(local)):
                    done.append(local)
                    nxt.append(local)
        frontier = nxt
    return done, edges, sameas


def localize_imports(spark: SparkSession, starts: list[str],
                     remote_base: str, local_base: str,
                     write: bool = True, max_rounds: int = 30):
    """End-to-end local_imports: chase the closure, rewrite each file's
    ``owl:imports`` objects from remote IRIs to ``file://<local>`` and
    (when ``write``) re-serialize the file in place with the nifttl
    writer.  Returns (prov_rows, localized_edges):

    - prov_rows: (subj, pred, obj) — ``(ont, owl:sameAs, local_path)``
      + original ``(s, owl:imports, o)`` edges, the reference's sorted
      return value (ontload.py:445-455,490)
    - localized_edges: (src_file, ont_iri, file://local) after rewrite
    """
    from ..kernel.nifttl import serialize_nifttl
    from ..kernel.ttl import parse_turtle_document

    done, edges, sameas = chase_imports(
        spark, starts, remote_base, local_base, max_rounds)
    localized = []
    by_file: dict[str, list] = {}
    for src, s, o in edges:
        by_file.setdefault(src, []).append((s, o))
        local = _to_local(o, remote_base, local_base)
        if local != o and not o.startswith("file://"):
            localized.append((src, s, "file://" + local))
        else:
            localized.append((src, s, o))
    if write:
        for path in done:
            with open(path) as f:
                text = f.read()
            rows, prefixes, _base = parse_turtle_document(text, path)
            out_rows = []
            for (s, p, o, il, dt, lang) in rows:
                if p == OWL_IMPORTS and not il:
                    local = _to_local(o, remote_base, local_base)
                    if local != o and not o.startswith("file://"):
                        o = "file://" + local
                out_rows.append((s, p, o, il, dt, lang))
            with open(path, "w") as f:
                f.write(serialize_nifttl(out_rows, prefixes))
    prov = sorted(
        {(s, vocab.OWL_SAMEAS, path) for s, path in sameas}
        | {(s, OWL_IMPORTS, o) for _, s, o in edges})
    return prov, localized
