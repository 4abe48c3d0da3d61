"""Canonicalization: large-star/small-star CC vs planted components
(FIXTURES.md §7), sameAs candidate edges from duplicate labels
(get_label2rows semantics), and triple rewrite with owl:sameAs
provenance (switchURIs/swapUriSwitch semantics)."""

import pytest
from pyspark.sql import functions as F

from pyontutils_spark.operators import vocab
from pyontutils_spark.operators.components import (
    canonical_mapping, connected_components_ids, rewrite_triples,
    sameas_candidates_from_lexicon)
from pyontutils_spark.synth.sameas import make_sameas_fixture


@pytest.fixture(scope="module")
def fixture(spark):
    edges, expected = make_sameas_fixture()
    df = spark.createDataFrame(edges, "a string, b string")
    return df, expected


def test_connected_components_integer_core(spark):
    # chain 0-4, star 10<-{11,12}, singleton pair 20-21
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)]
    df = spark.createDataFrame(edges, "u long, v long")
    comp = {r.node: r.component
            for r in connected_components_ids(df).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
                    10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_canonical_mapping_matches_expected(spark, fixture):
    df, expected = fixture
    got = {r.iri: r.canonical_iri
           for r in canonical_mapping(df).collect()}
    assert got == expected


def test_canonical_is_natsort_min(spark, fixture):
    df, expected = fixture
    # the natsort-trap component: x2 < x9 < x10 < x100
    got = {r.iri: r.canonical_iri for r in canonical_mapping(df).collect()}
    assert got["http://uri.interlex.org/temp/uris/ent_x10"] == \
        "http://uri.interlex.org/temp/uris/ent_x2"


def test_sameas_candidates_from_duplicate_labels(spark):
    rows = [("http://x.example/b", "cortex"),
            ("http://x.example/a", "cortex"),
            ("http://x.example/c", "cortex"),
            ("http://x.example/d", "unique label")]
    df = spark.createDataFrame(rows, "iri string, label_norm string")
    edges = sameas_candidates_from_lexicon(df).collect()
    # star to the natsort-first member 'a'; unique labels produce no edge
    assert {(r.a, r.b) for r in edges} == {
        ("http://x.example/a", "http://x.example/b"),
        ("http://x.example/a", "http://x.example/c")}


def test_rewrite_triples_and_provenance(spark):
    triples = spark.createDataFrame(
        [("http://e/dup", "http://p/p", "http://e/other", False, None, None),
         ("http://e/keep", "http://p/p", "http://e/dup", False, None, None),
         ("http://e/dup", "http://p/label", "dup literal", True, None, None)],
        vocab.TRIPLE_SCHEMA)
    mapping = spark.createDataFrame(
        [("http://e/dup", "http://e/canon"),
         ("http://e/canon", "http://e/canon")],
        "iri string, canonical_iri string")
    out = rewrite_triples(triples, mapping)
    got = {(r.subj, r.pred, r.obj, r.obj_is_literal) for r in out.collect()}
    assert ("http://e/canon", "http://p/p", "http://e/other", False) in got
    assert ("http://e/keep", "http://p/p", "http://e/canon", False) in got
    # literal object untouched even though its lexical form is irrelevant
    assert ("http://e/canon", "http://p/label", "dup literal", True) in got
    # provenance triple
    assert ("http://e/dup", vocab.OWL_SAMEAS, "http://e/canon", False) in got
    # no stale subjects remain
    assert all(s != "http://e/dup" or p == vocab.OWL_SAMEAS
               for s, p, o, il in got)


def test_rewrite_triples_corpus_mapping_not_broadcast(spark):
    """The canonicalization path must NOT force-broadcast the mapping:
    after sameAs CC over a web corpus the (iri -> canonical) map is
    proportional to the entity count and a forced broadcast dies at
    the driver.  With the broadcast threshold pinned below the mapping
    size, the default (auto) plan must contain no BroadcastHashJoin —
    only shuffle joins AQE can scale."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    try:
        n = 5_000
        base = spark.range(n)
        mapping = base.select(
            F.concat(F.lit("http://e/x"), "id").alias("iri"),
            F.concat(F.lit("http://e/x"),
                     F.col("id") - F.col("id") % 10).alias("canonical_iri"))
        triples = base.select(
            F.concat(F.lit("http://e/x"), "id").alias("subj"),
            F.lit("http://p/p").alias("pred"),
            F.concat(F.lit("http://e/x"), (F.col("id") + 1) % n).alias("obj"),
            F.lit(False).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang"))
        out = rewrite_triples(triples, mapping)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        # and the rewrite is still correct at the boundaries
        got = {r.subj for r in out.filter(~F.col("obj_is_literal"))
               .limit(50).collect()}
        assert got  # non-empty, executed through the shuffle-join plan
        # forced mode still broadcasts (curated-small-map path)
        forced = rewrite_triples(triples, mapping, broadcast=True)
        fplan = forced._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in fplan or "broadcast" in fplan.lower()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_chain_converges_in_log_rounds(spark):
    # a 200-node chain must converge well within max_iter=25 (log2(200)≈8)
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "u long, v long")
    comp = connected_components_ids(df, max_iter=25).collect()
    assert {r.component for r in comp} == {0}
    assert len(comp) == 201


def test_star_round_hub_safe_equals_collect_form(spark):
    """The hub-safe star round (algebraic min + edge join — no row
    ever holds a hub's whole neighbor set) must emit exactly the edge
    set of the collect_set form, on both the single-hub star and a
    heavy-tailed power-law graph; its plan must contain no
    collect_set aggregation buffer."""
    from pyontutils_spark.operators.components import (
        _min_neighbor_star, _min_neighbor_star_collect, _symmetric)
    from pyontutils_spark.synth.graphs import powerlaw_edges, star_edges
    for g in (star_edges(spark, 3000), powerlaw_edges(spark, 3000)):
        e = (g.selectExpr("a AS u", "b AS v")
             .filter("u != v").distinct().localCheckpoint(eager=True))
        for large in (True, False):
            sym = _symmetric(e)
            safe = {(r.u, r.v)
                    for r in _min_neighbor_star(sym, large).collect()}
            ref = {(r.u, r.v)
                   for r in _min_neighbor_star_collect(sym, large).collect()}
            assert safe == ref and safe
    plan = (_min_neighbor_star(_symmetric(e), True)
            ._jdf.queryExecution().executedPlan().toString())
    assert "collect_set" not in plan


def test_canonical_mapping_on_hub_star(spark):
    """A 20k-leaf single-hub star through the full canonical_mapping
    path: one component, every node canonicalized to the natsort-min
    member (the hub, 'h0' < 's…')."""
    from pyontutils_spark.synth.graphs import star_edges
    m = canonical_mapping(star_edges(spark, 20_000)).collect()
    assert len(m) == 20_001
    assert all(r.canonical_iri == "http://e/h0" for r in m)
