"""Structured Streaming triple factory: streamed output must equal the
batch pipeline on the same input; windowed mention-rate agg with
watermark must run and produce per-entity counts."""

import os

import pytest

from pyontutils_spark.operators import emit, linking, mentions as mention_ops
from pyontutils_spark.streaming.stream import (
    mention_rate, read_stream_triples, stream_triples)
from pyontutils_spark.synth.lexicon import make_lexicon
from pyontutils_spark.synth.pages import make_pages
from pyontutils_spark.synth.spark_gen import pages_df_local

N = 80
LEX = make_lexicon()
PAGES = make_pages(N, LEX)


def _triple_set(df):
    return {(r.subj, r.pred, r.obj, r.obj_is_literal)
            for r in df.select("subj", "pred", "obj", "obj_is_literal")
            .collect()}


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    # several files so maxFilesPerTrigger yields multiple micro-batches
    pages_df_local(spark, PAGES).repartition(6).write.mode("overwrite") \
        .parquet(d)
    return d


def test_stream_equals_batch(spark, input_dir, tmp_path):
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_triples(spark, input_dir, LEX, out_dir, ckpt)
    q.awaitTermination(120)

    got = _triple_set(read_stream_triples(spark, out_dir))

    # batch reference: page-level triples only
    pages = spark.read.parquet(input_dir)
    bc = mention_ops.broadcast_automaton(spark, LEX)
    cands = linking.candidates_df(spark, LEX)
    linked = linking.link_mentions(
        mention_ops.detect_mentions_fused(pages, bc), cands)
    want = _triple_set(
        emit.page_type_triples(pages.select("url"))
        .unionByName(emit.mention_triples(linked)).distinct())
    assert got == want


def test_stream_restart_is_exactly_once(spark, input_dir, tmp_path):
    out_dir = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    q = stream_triples(spark, input_dir, LEX, out_dir, ckpt)
    q.awaitTermination(120)
    first = _triple_set(read_stream_triples(spark, out_dir))
    # restart with same checkpoint: no new input -> no change
    q2 = stream_triples(spark, input_dir, LEX, out_dir, ckpt)
    q2.awaitTermination(120)
    assert _triple_set(read_stream_triples(spark, out_dir)) == first


def test_mention_rate_windowed(spark, input_dir, tmp_path):
    agg = mention_rate(spark, input_dir, LEX, window="24 hours",
                       watermark="48 hours")
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("mention_rate_out")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from mention_rate_out").collect()
    assert rows
    total = sum(r.n_mentions for r in rows)
    # every linked mention lands in exactly one window
    from pyontutils_spark.synth.golden import build_link_index, link_pattern
    idx = build_link_index(LEX)
    want = sum(1 for p_ in PAGES if p_["lang"] == "en"
               for s, e, _, pat in p_["mentions"]
               if link_pattern(pat, idx) is not None)
    assert total == want


def test_stream_first_seen_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: duplicated texts
    across micro-batches emit exactly one row per digest, equal to the
    batch-distinct set."""
    import pyspark.sql.functions as SF
    from pyontutils_spark.streaming.stream import (
        read_pages_stream, stream_first_seen)

    d = str(tmp_path / "dup_pages")
    base = pages_df_local(spark, PAGES[:30])
    dup = base.withColumn("url", SF.concat(SF.col("url"), SF.lit("?dup")))
    # two files with identical text payloads -> >=2 micro-batches at
    # maxFilesPerTrigger=1, duplicates across batches
    base.coalesce(1).write.mode("overwrite").parquet(d)
    dup.coalesce(1).write.mode("append").parquet(d)

    stream = read_pages_stream(spark, d, max_files_per_trigger=1)
    out = stream_first_seen(stream)
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName("first_seen_out")
         .option("checkpointLocation", str(tmp_path / "ckpt_fs"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from first_seen_out").collect()
    digests = [r.digest for r in rows]
    assert len(digests) == len(set(digests))  # one row per digest, ever
    n_batch_distinct = (pages_df_local(spark, PAGES[:30])
                        .select(SF.md5("text")).distinct().count())
    assert len(digests) == n_batch_distinct
