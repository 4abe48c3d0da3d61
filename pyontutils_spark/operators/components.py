"""Entity canonicalization: sameAs candidates -> connected components ->
canonical IRI -> triple rewrite + owl:sameAs provenance.

Mirrors the reference's synonym/label collapsing: duplicate normalized
labels form candidate groups (``get_label2rows`` multimap,
``ilxutils/ilxutils/interlex_sql.py:271-282``), URI replacement is a
map applied to every triple position with an ``owl:sameAs`` provenance
triple emitted per replacement (``swapUriSwitch``/``switchURIs``,
``pyontutils/ontutils.py:521-583, 71-91``).

The component computation is the alternating large-star/small-star
iteration (hash-partitioned equi-joins; converges in O(log n) rounds on
path graphs — the public MapReduce CC algorithm of Kiveris et al.,
re-expressed as DataFrame groupBys).  Node ids are dense integer ranks
in *natsort order* of the IRI, so the numeric min of a component IS the
natsort-min member — the deterministic canonical-pick rule
(FIXTURES.md §7; natsort per ``ttlser/ttlser/serializers.py:25-26``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StringType

from ..kernel.norm import natsort_key
from . import vocab


@F.pandas_udf(StringType())
def natsort_key_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: None if x is None else natsort_key(x))


# ---------------------------------------------------------------------------
# connected components on integer node ids
# ---------------------------------------------------------------------------

def _symmetric(edges: DataFrame) -> DataFrame:
    """(u,v) -> both directions, via explode(array(struct)) — one scan,
    and no self-Union (which also trips a constraint-rewrite bug in
    Spark 4.1's optimizer on iterated plans)."""
    return (edges.select(F.explode(F.array(
        F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
        F.struct(F.col("v").alias("u"), F.col("u").alias("v"))
    )).alias("e")).select("e.u", "e.v"))


def _min_neighbor_star(edges: DataFrame, large: bool) -> DataFrame:
    """One star round over symmetric edges.  Emits (t, m) with
    m = min(neighbors(u) ∪ {u}); large-star targets t ∈ N(u), t > u;
    small-star targets {t ∈ N(u): t < u} ∪ {u}."""
    grouped = (edges.groupBy("u")
               .agg(F.collect_set("v").alias("nbrs")))
    m = F.least(F.array_min("nbrs"), F.col("u"))
    if large:
        targets = F.filter("nbrs", lambda v: v > F.col("u"))
    else:
        targets = F.array_append(
            F.filter("nbrs", lambda v: v < F.col("u")), F.col("u"))
    out = (grouped.select(m.alias("m"), F.explode(targets).alias("t"))
           .select(F.col("t").alias("u"), F.col("m").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components_ids(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(u long, v long) undirected pairs -> (node, component) where
    component = min node id reachable.  Alternates large-star/small-star
    until the edge multiset is stable.  ``localCheckpoint`` truncates
    lineage each round — without it the iterated plan grows without
    bound and re-executes from the source every round."""
    e = (edges.select("u", "v").filter(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=True))
    prev_sig = None
    for _ in range(max_iter):
        e = _min_neighbor_star(_symmetric(e), large=True)
        e = _min_neighbor_star(_symmetric(e), large=False) \
            .localCheckpoint(eager=True)
        sig = (e.agg(F.count("*").alias("n"),
                     F.sum(F.col("u") + F.col("v")).alias("s"))
               .collect()[0])
        sig = (sig["n"], sig["s"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # after convergence every edge is (node, root); add singletons' roots
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (comp.select(F.col("component").alias("node"),
                         F.col("component")).distinct())
    return comp.unionByName(roots).distinct()


# ---------------------------------------------------------------------------
# IRI-level canonicalization
# ---------------------------------------------------------------------------

def _natsort_ids(nodes: DataFrame) -> DataFrame:
    """(iri) -> (iri, nid) with nid increasing in natsort order of iri.

    Scale path: a global ``row_number()`` window would funnel every node
    through one partition; instead range-partition on the natsort key,
    sort within partitions, and ``zipWithIndex`` — indices follow
    partition order, which range partitioning makes globally sorted."""
    spark = nodes.sparkSession
    parts = max(spark.sparkContext.defaultParallelism, 2)
    sn = (nodes.withColumn("nk", natsort_key_udf("iri"))
          .repartitionByRange(parts, "nk", "iri")
          .sortWithinPartitions("nk", "iri"))
    rdd = sn.select("iri").rdd.zipWithIndex()
    return spark.createDataFrame(rdd.map(lambda t: (t[0][0], t[1])),
                                 "iri string, nid long")


def canonical_mapping(sameas_edges: DataFrame,
                      a_col: str = "a", b_col: str = "b") -> DataFrame:
    """sameas_edges(a iri, b iri) -> (iri, canonical_iri) covering every
    node that appears in an edge; canonical = natsort-min member."""
    nodes = (sameas_edges.select(F.col(a_col).alias("iri"))
             .unionByName(sameas_edges.select(F.col(b_col).alias("iri")))
             .distinct())
    ids = _natsort_ids(nodes)
    e = (sameas_edges
         .join(ids.withColumnRenamed("iri", a_col)
               .withColumnRenamed("nid", "u"), a_col)
         .join(ids.withColumnRenamed("iri", b_col)
               .withColumnRenamed("nid", "v"), b_col)
         .select("u", "v"))
    comp = connected_components_ids(e)
    back = ids.select(F.col("nid").alias("component"),
                      F.col("iri").alias("canonical_iri"))
    return (comp.join(ids, comp.node == ids.nid)
            .join(back, "component")
            .select("iri", "canonical_iri"))


def sameas_candidates_from_lexicon(entity_labels: DataFrame) -> DataFrame:
    """entity_labels(iri, label_norm) -> candidate edges (a, b): every
    member of a shared-label group paired with the group's first member
    (star shape — linear in group size, same components as all-pairs).
    get_label2rows semantics (interlex_sql.py:271-282)."""
    w = Window.partitionBy("label_norm").orderBy(natsort_key_udf("iri"), "iri")
    ranked = entity_labels.withColumn("rn", F.row_number().over(w))
    firsts = (ranked.filter("rn = 1")
              .select("label_norm", F.col("iri").alias("a")))
    rest = (ranked.filter("rn > 1")
            .select("label_norm", F.col("iri").alias("b")))
    return rest.join(firsts, "label_norm").select("a", "b")


def rewrite_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Replace subj/obj IRIs through (iri -> canonical_iri); literals
    untouched.  The switchURIs operation (ontutils.py:71-91) as joins.
    Returns rewritten triples unioned with owl:sameAs provenance triples
    (non-canonical -> canonical, like swapUriSwitch ontutils.py:528)."""
    msub = mapping.withColumnRenamed("iri", "subj") \
                  .withColumnRenamed("canonical_iri", "subj_canon")
    mobj = mapping.withColumnRenamed("iri", "obj") \
                  .withColumnRenamed("canonical_iri", "obj_canon")
    rewritten = (triples
                 .join(F.broadcast(msub), "subj", "left")
                 .join(F.broadcast(mobj), "obj", "left")
                 .select(
                     F.coalesce("subj_canon", "subj").alias("subj"),
                     "pred",
                     F.when(F.col("obj_is_literal"), F.col("obj"))
                      .otherwise(F.coalesce("obj_canon", "obj")).alias("obj"),
                     "obj_is_literal", "obj_datatype", "obj_lang"))
    prov = (mapping.filter(F.col("iri") != F.col("canonical_iri"))
            .select(F.col("iri").alias("subj"),
                    F.lit(vocab.OWL_SAMEAS).alias("pred"),
                    F.col("canonical_iri").alias("obj"),
                    F.lit(False).alias("obj_is_literal"),
                    F.lit(None).cast("string").alias("obj_datatype"),
                    F.lit(None).cast("string").alias("obj_lang")))
    return rewritten.unionByName(prov).distinct()
