"""GraphML source, uri_switch fragment rewrite, LabelMaker synthesis."""

import pytest
from pyspark.sql import functions as F

from pyontutils_spark.operators import vocab
from pyontutils_spark.operators.labels import synthesize_labels
from pyontutils_spark.operators.uriswitch import switch_uris
from pyontutils_spark.sources.graphml import graphml_triples, read_graphml

GRAPHML = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <graph id="G" edgedefault="directed">
    <node id="n0"><data key="d0">Purkinje Cell</data></node>
    <node id="n1"><data key="d0">Neuron</data></node>
    <node id="n2"><data key="d0">Cerebellum</data></node>
    <edge source="n0" target="n1"><data key="d1">is_a</data></edge>
    <edge source="n0" target="n2"><data key="d1">part_of</data></edge>
  </graph>
</graphml>
"""


def test_graphml_triples_pure():
    got = set(graphml_triples(GRAPHML))
    pc = "http://uri.interlex.org/temp/uris/graphml/purkinje-cell"
    neuron = "http://uri.interlex.org/temp/uris/graphml/neuron"
    cereb = "http://uri.interlex.org/temp/uris/graphml/cerebellum"
    assert (pc, vocab.RDFS_LABEL, "Purkinje Cell", True) in got
    assert (pc, vocab.RDFS_SUBCLASSOF, neuron, False) in got
    assert (pc, "http://purl.obolibrary.org/obo/BFO_0000050", cereb,
            False) in got


def test_read_graphml(spark, tmp_path):
    p = tmp_path / "g.graphml"
    p.write_text(GRAPHML)
    df = read_graphml(spark, str(p))
    assert df.count() == 5  # 3 labels + 2 edges
    assert df.filter(F.col("pred") == vocab.RDFS_SUBCLASSOF).count() == 1


def test_switch_uris_fragment_rules(spark):
    t = spark.createDataFrame(
        [("http://uri.neuinfo.org/nif/nifstd/nlx_sub_090901",
          vocab.RDFS_LABEL, "old frag", True, None, None),
         ("http://e/x", vocab.IS_ABOUT,
          "http://uri.neuinfo.org/nif/nifstd/nif_organ_12", False,
          None, None)],
        vocab.TRIPLE_SCHEMA)
    out = switch_uris(t)
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    new_sub = "http://uri.neuinfo.org/nif/nifstd/nlx_subcell_090901"
    new_organ = "http://uri.neuinfo.org/nif/nifstd/nlx_organ_12"
    assert (new_sub, vocab.RDFS_LABEL, "old frag") in got
    assert ("http://e/x", vocab.IS_ABOUT, new_organ) in got
    # provenance
    assert ("http://uri.neuinfo.org/nif/nifstd/nlx_sub_090901",
            vocab.OWL_SAMEAS, new_sub) in got
    assert ("http://uri.neuinfo.org/nif/nifstd/nif_organ_12",
            vocab.OWL_SAMEAS, new_organ) in got


def test_label_synthesis_order_insensitive(spark):
    rows1 = [("http://e/n", "phenotype", "fast spiking", False),
             ("http://e/n", "location", "cortex", False),
             ("http://e/n", "role", "interneuron", False),
             ("http://e/n", "molecular", "PV", True)]
    rows2 = list(reversed(rows1))
    schema = "iri string, category string, value string, negative boolean"
    l1 = synthesize_labels(spark.createDataFrame(rows1, schema)).collect()
    l2 = synthesize_labels(spark.createDataFrame(rows2, schema)).collect()
    assert l1 == l2
    assert l1[0].label == "cortex fast spiking -PV interneuron"


def test_label_natsort_within_category(spark):
    rows = [("http://e/n", "phenotype", "L10", False),
            ("http://e/n", "phenotype", "L2", False)]
    out = synthesize_labels(spark.createDataFrame(
        rows, "iri string, category string, value string, "
              "negative boolean")).collect()
    assert out[0].label == "L2 L10"


def _write_import_fixture(tmp_path):
    """4-file repo with a 2-deep owl:imports chain + one external."""
    remote = "http://remote.org/onts"
    files = {
        "root.ttl": f"""@prefix owl: <http://www.w3.org/2002/07/owl#> .
<{remote}/root.ttl> a owl:Ontology ;
    owl:imports <{remote}/mid.ttl>, <{remote}/leaf.ttl> .
""",
        "mid.ttl": f"""@prefix owl: <http://www.w3.org/2002/07/owl#> .
<{remote}/mid.ttl> a owl:Ontology ;
    owl:imports <{remote}/deep.ttl> .
""",
        "deep.ttl": f"""@prefix owl: <http://www.w3.org/2002/07/owl#> .
<{remote}/deep.ttl> a owl:Ontology ;
    owl:imports <http://external.org/other.owl> .
""",
        "leaf.ttl": f"""@prefix owl: <http://www.w3.org/2002/07/owl#> .
<{remote}/leaf.ttl> a owl:Ontology .
""",
    }
    for name, text in files.items():
        (tmp_path / name).write_text(text)
    return remote, str(tmp_path)


def test_local_imports_end_to_end(spark, tmp_path):
    """local_imports (ontload.py:395-490): chase the closure, rewrite
    remote imports to file:// locals in place (nifttl layout), return
    sameAs + imports provenance triples."""
    from pyontutils_spark.plans.imports import localize_imports
    remote, local = _write_import_fixture(tmp_path)
    prov, localized = localize_imports(
        spark, [f"{local}/root.ttl"], remote, local)
    owl_imports = "http://www.w3.org/2002/07/owl#imports"
    sameas = "http://www.w3.org/2002/07/owl#sameAs"
    # every file in the closure was visited and got a sameAs row
    same = {(s, o) for s, p, o in prov if p == sameas}
    assert same == {(f"{remote}/{n}", f"{local}/{n}")
                    for n in ("root.ttl", "mid.ttl", "deep.ttl",
                              "leaf.ttl")}
    # original imports edges preserved in provenance
    imps = {(s, o) for s, p, o in prov if p == owl_imports}
    assert (f"{remote}/root.ttl", f"{remote}/mid.ttl") in imps
    assert (f"{remote}/deep.ttl", "http://external.org/other.owl") in imps
    # files rewritten in place: local imports now file://, external kept
    root_txt = (tmp_path / "root.ttl").read_text()
    assert f"<file://{local}/mid.ttl>" in root_txt
    deep_txt = (tmp_path / "deep.ttl").read_text()
    assert "<http://external.org/other.owl>" in deep_txt
    assert "### " in root_txt  # nifttl layout (section headers)
    # idempotent: running again is a no-op on the edge set
    prov2, _ = localize_imports(
        spark, [f"{local}/root.ttl"], remote, local)
    same2 = {(s, o) for s, p, o in prov2 if p == sameas}
    assert same2 == {(f"{remote}/root.ttl", f"{local}/root.ttl")}


def test_localize_imports_distributed_rewrite(spark, tmp_path):
    """The in-place rewrite must run as a distributed mapInPandas
    stage over a (path) DataFrame — not a driver-serial loop: localize
    a 120-file closure, assert every file got rewritten, and assert
    the rewrite plan contains the distributed stage."""
    from pyontutils_spark.plans.imports import (
        localize_imports, rewrite_imports_distributed)
    remote, local, n = "http://remote.org/onts", str(tmp_path), 120
    owl = "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
    kids = ", ".join(f"<{remote}/c{i}.ttl>" for i in range(1, n))
    (tmp_path / "root.ttl").write_text(
        f"{owl}<{remote}/root.ttl> a owl:Ontology ;\n"
        f"    owl:imports {kids} .\n")
    for i in range(1, n):
        (tmp_path / f"c{i}.ttl").write_text(
            f"{owl}<{remote}/c{i}.ttl> a owl:Ontology ;\n"
            f"    owl:imports <{remote}/root.ttl> .\n")
    prov, _ = localize_imports(
        spark, [f"{local}/root.ttl"], remote, local)
    sameas = "http://www.w3.org/2002/07/owl#sameAs"
    assert len({(s, o) for s, p, o in prov if p == sameas}) == n
    for i in (1, 57, n - 1):  # every child's import of root localized
        assert (f"<file://{local}/root.ttl>"
                in (tmp_path / f"c{i}.ttl").read_text())
    assert f"<file://{local}/c1.ttl>" in (tmp_path / "root.ttl").read_text()
    stats = rewrite_imports_distributed(
        spark, [f"{local}/root.ttl"], remote, local)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert stats.collect()[0].n_rewritten == 0  # already file://, no-op
