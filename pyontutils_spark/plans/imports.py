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
collected per round.  The rewrite is distributed too: the closure's
paths become a DataFrame and each task does read -> parse -> rewrite
-> nifttl-serialize -> write-in-place (``rewrite_imports_distributed``,
same pure-Python-kernel-in-``mapInPandas`` shape as
``nifttl_per_graph``), so a 10k-file closure rewrites with full
parallelism; the driver holds only the BFS frontier.  Requires a
filesystem the executors share with the driver (local mode, NFS,
fuse-mounted object store) — the same contract the per-file read
source already has.  Each document keeps its own prefix block (what
the reference's in-place rewrite does).
"""

from __future__ import annotations

import os

import pandas as pd
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
    done, edges, sameas = chase_imports(
        spark, starts, remote_base, local_base, max_rounds)
    localized = []
    for src, s, o in edges:
        local = _to_local(o, remote_base, local_base)
        if local != o and not o.startswith("file://"):
            localized.append((src, s, "file://" + local))
        else:
            localized.append((src, s, o))
    if write:
        rewrite_imports_distributed(
            spark, done, remote_base, local_base).collect()
    prov = sorted(
        {(s, vocab.OWL_SAMEAS, path) for s, path in sameas}
        | {(s, OWL_IMPORTS, o) for _, s, o in edges})
    return prov, localized


def rewrite_imports_distributed(spark: SparkSession, paths: list[str],
                                remote_base: str,
                                local_base: str) -> DataFrame:
    """Distributed in-place imports rewrite: one DataFrame row per file
    path; each task reads its file, parses it with the pure-Python
    turtle kernel, maps remote ``owl:imports`` objects to
    ``file://<local>``, re-serializes with the byte-compatible nifttl
    writer (the document's own prefix block preserved) and writes it
    back — the same kernel-in-``mapInPandas`` shape as
    ``nifttl_per_graph`` (sources/rdf.py), so a 10k-file closure
    rewrites with full cluster parallelism instead of a driver loop.

    Returns (path, n_rewritten, n_bytes) rows — lazy; the caller's
    ``.collect()`` is the write barrier.  Executors must share the
    driver's filesystem (true in local mode and on NFS/fuse mounts)."""
    from ..kernel.nifttl import serialize_nifttl
    from ..kernel.ttl import parse_turtle_document

    n_part = max(1, min(len(paths),
                        spark.sparkContext.defaultParallelism * 2))
    pdf = spark.createDataFrame([(p,) for p in paths], "path string") \
        .repartition(n_part)

    def rewrite(batches):
        for b in batches:
            out = {"path": [], "n_rewritten": [], "n_bytes": []}
            for path in b["path"]:
                with open(path) as f:
                    text = f.read()
                rows, prefixes, _base = parse_turtle_document(text, path)
                out_rows = []
                n_rw = 0
                for (s, p, o, il, dt, lang) in rows:
                    if p == OWL_IMPORTS and not il:
                        local = _to_local(o, remote_base, local_base)
                        if local != o and not o.startswith("file://"):
                            o = "file://" + local
                            n_rw += 1
                    out_rows.append((s, p, o, il, dt, lang))
                doc = serialize_nifttl(out_rows, prefixes)
                with open(path, "w") as f:
                    f.write(doc)
                out["path"].append(path)
                out["n_rewritten"].append(n_rw)
                out["n_bytes"].append(len(doc))
            yield pd.DataFrame(out)

    return pdf.mapInPandas(
        rewrite, schema="path string, n_rewritten int, n_bytes long")
