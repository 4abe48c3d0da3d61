"""Deterministic synthetic graphs at benchmark scale (pure column
expressions over ``spark.range`` — no driver-side data, no randomness,
so every run generates byte-identical parquet).

The round-1 graph benchmarks ran on 7-edge fixtures, which measure JVM
round-trip overhead, not the operators.  These generators give the CC
and closure operators >=10^6-edge inputs with known structure, so the
benchmark numbers mean per-edge throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def sameas_chain_edges(spark: SparkSession, n_edges: int,
                       group: int = 6) -> DataFrame:
    """(a, b) sameAs candidate edges forming chains of ``group`` nodes:
    n_edges/(group-1) components, each a path — paths are the
    worst case for star-contraction CC (O(log n) rounds), unlike stars
    which converge immediately."""
    step = group - 1
    e = spark.range(n_edges)
    g = F.floor(F.col("id") / step)
    k = F.col("id") % step
    a = g * group + k
    return e.select(
        F.concat(F.lit("http://e/n"), a.cast("string")).alias("a"),
        F.concat(F.lit("http://e/n"), (a + 1).cast("string")).alias("b"))


def tree_edges(spark: SparkSession, n_edges: int,
               fanout: int = 4) -> DataFrame:
    """(child, parent) edges of a ``fanout``-ary tree rooted at t0:
    child i in 1..n_edges has parent (i-1)//fanout.  Depth ~
    log_fanout(n), so the ancestor closure has ~n * depth rows —
    a real closure workload."""
    e = spark.range(1, n_edges + 1)
    return e.select(
        F.concat(F.lit("http://e/t"), F.col("id").cast("string"))
        .alias("child"),
        F.concat(F.lit("http://e/t"),
                 F.floor((F.col("id") - 1) / fanout).cast("string"))
        .alias("parent"))


def star_edges(spark: SparkSession, n_leaves: int) -> DataFrame:
    """(a, b) edges of a single-hub star: hub h0 connected to
    ``n_leaves`` leaves — the hub-degree worst case for the CC star
    rounds (every leaf is the hub's neighbor, so any plan that
    materializes N(hub) in one buffer holds the whole graph there)."""
    e = spark.range(1, n_leaves + 1)
    return e.select(
        F.lit("http://e/h0").alias("a"),
        F.concat(F.lit("http://e/s"), F.col("id").cast("string"))
        .alias("b"))


def powerlaw_edges(spark: SparkSession, n_edges: int) -> DataFrame:
    """Preferential-attachment-style deterministic graph: node i
    attaches to floor(u_i^2 * i) with u_i a hash-uniform in [0,1) —
    in-degree is heavy-tailed (hubs at small ids), the realistic skew
    shape for a web-scale sameAs graph.  Pure column expressions."""
    e = spark.range(1, n_edges + 1)
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double")
         / 1_000_000.0)
    tgt = F.floor(u * u * F.col("id").cast("double")).cast("long")
    return e.select(
        F.concat(F.lit("http://e/p"), F.col("id").cast("string"))
        .alias("a"),
        F.concat(F.lit("http://e/p"), tgt.cast("string")).alias("b"))


def ontology_graphs(spark: SparkSession, n_graphs: int,
                    classes_per_graph: int = 12) -> DataFrame:
    """``n_graphs`` small deterministic ontologies as ONE triples
    DataFrame with a ``src_file`` group column — the input shape of
    the distributed nifttl writer (``nifttl_per_graph``).  Each class
    emits (rdf:type owl:Class, rdfs:label literal, rdfs:subClassOf
    parent-or-owl:Thing): 3 triples/class, pure column expressions."""
    from ..operators import vocab
    e = spark.range(n_graphs * classes_per_graph)
    g = F.floor(F.col("id") / classes_per_graph).cast("string")
    i = F.col("id") % classes_per_graph
    base = F.concat(F.lit("http://purl.example.org/g"), g)
    subj = F.concat(base, F.lit("/C"), i.cast("string"))
    parent = F.when(
        i > 0, F.concat(base, F.lit("/C"),
                        F.floor((i - 1) / 3).cast("string"))) \
        .otherwise(F.lit("http://www.w3.org/2002/07/owl#Thing"))
    label = F.concat(F.lit("class "), g, F.lit(" "), i.cast("string"))

    def t(pred, obj, is_lit):
        return F.struct(
            F.lit(pred).alias("pred"), obj.alias("obj"),
            F.lit(is_lit).alias("obj_is_literal"))

    return (e.select(
        F.concat(F.lit("file:///onts/g"), g, F.lit(".ttl"))
        .alias("src_file"),
        subj.alias("subj"),
        F.explode(F.array(
            t(vocab.RDF_TYPE, F.lit(vocab.OWL_CLASS), False),
            t(vocab.RDFS_LABEL, label, True),
            t(vocab.RDFS_SUBCLASSOF, parent, False))).alias("e"))
        .select("src_file", "subj", "e.pred", "e.obj", "e.obj_is_literal",
                F.lit(None).cast("string").alias("obj_datatype"),
                F.lit(None).cast("string").alias("obj_lang")))
