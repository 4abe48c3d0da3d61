"""Deterministic sampling + sequence packing."""

from pyspark.sql import functions as F

from pyontutils_spark.operators.sampling import hash_sample, pack_sequences


def test_hash_sample_deterministic_and_rate(spark):
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id for r in hash_sample(df, "doc_id", 10).collect()}
    # identical under a different partitioning (rand() would not be)
    s2 = {r.doc_id
          for r in hash_sample(df.repartition(13), "doc_id", 10).collect()}
    assert s1 == s2
    assert 0.08 < len(s1) / 10_000 < 0.12          # ~10%
    # different salt -> a different (but again stable) sample
    s3 = {r.doc_id
          for r in hash_sample(df, "doc_id", 10, salt="other").collect()}
    assert s3 != s1 and 0.08 < len(s3) / 10_000 < 0.12
    # supersampling monotonicity: 10% sample is a subset of 20%
    s20 = {r.doc_id for r in hash_sample(df, "doc_id", 20).collect()}
    assert s1 < s20


def test_hash_sample_stratified_rates(spark):
    df = (spark.range(20_000).withColumnRenamed("id", "doc_id")
          .withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en")
                      .otherwise("de")))
    out = hash_sample(df, "doc_id", 5, rates={"en": (50, 100)},
                      stratum_col="lang")
    got = out.groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in got}
    assert 0.45 < by["en"] / 10_000 < 0.55         # en oversampled 50%
    assert 0.03 < by["de"] / 10_000 < 0.07         # de at global 5%


def test_pack_sequences_layout(spark):
    df = (spark.range(2_000).withColumnRenamed("id", "doc_id")
          .withColumn("n_tokens", (F.col("doc_id") % 700 + 1)
                      .cast("long")))
    out = pack_sequences(df, budget=2048, n_shards=4).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rows:                        # offsets are contiguous
            assert r.start_offset == off
            assert r.pack_id == off // 2048   # straddlers keep start pack
            off += r.n_tokens
    # deterministic under repartitioning
    out2 = pack_sequences(df.repartition(7), budget=2048,
                          n_shards=4).collect()
    assert {(r.doc_id, r.shard, r.start_offset, r.pack_id) for r in out} \
        == {(r.doc_id, r.shard, r.start_offset, r.pack_id) for r in out2}


def test_pack_sequences_exact_division_non_power_of_two(spark):
    """pack_id must use exact integral division: with a non-power-of-two
    budget, double `/` + floor can round across a pack boundary (the
    token_freq_score `div` rule) — compare against a pure-Python
    per-shard replay."""
    df = (spark.range(3_000).withColumnRenamed("id", "doc_id")
          .withColumn("n_tokens", (F.col("doc_id") % 997 + 1)
                      .cast("long")))
    out = pack_sequences(df, budget=999, n_shards=4).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rows:
            assert r.start_offset == off
            assert r.pack_id == off // 999
            off += r.n_tokens


def test_pack_sequences_auto_shards_scale_with_corpus(spark):
    """Default n_shards derives from corpus size so no window partition
    outgrows an executor at 100x: small corpus floors at 16, a corpus
    over the per-shard target grows the shard count; within each shard
    the layout stays offset-contiguous regardless of how many shards
    exist."""
    small = (spark.range(500).withColumnRenamed("id", "doc_id")
             .withColumn("n_tokens", F.lit(10).cast("long")))
    big = (spark.range(5_000).withColumnRenamed("id", "doc_id")
           .withColumn("n_tokens", F.lit(10).cast("long")))
    s_out = pack_sequences(small, budget=128,
                           target_docs_per_shard=100)
    b_out = pack_sequences(big, budget=128,
                           target_docs_per_shard=100)
    s_shards = s_out.select("shard").distinct().count()
    b_shards = b_out.select("shard").distinct().count()
    assert s_shards <= 16      # floor: ceil(500/100)=5 -> min 16
    assert b_shards > 16       # ceil(5000/100)=50 shards
    # per-shard budget invariant: every shard is offset-contiguous
    rows = b_out.collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) <= 50  # 50 shard slots; hashing may leave gaps
    for rows_ in by_shard.values():
        rows_.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rows_:
            assert r.start_offset == off and r.pack_id == off // 128
            off += r.n_tokens
