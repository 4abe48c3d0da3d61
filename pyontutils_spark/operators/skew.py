"""Skew mitigation: salted two-level aggregation and salted joins.

The corpus is head-heavy by construction (the top entity appears in
~20% of pages — BASELINE.json:north_star requires explicit salted-key
handling).  AQE's skew-join splitting covers sort-merge joins; for
groupBy-heavy paths we provide:

- ``salted_count``: two-level aggregation — partial count per
  (key, salt), then final merge per key.  The shuffle carries at most
  ``n_salts`` rows per hot key instead of every occurrence.
- ``heavy_hitters``: cheap approximate hot-key detection via a sampled
  count (used to decide which keys need salting at all).
- ``salted_join``: replicate the small side per salt so a hot-key join
  distributes across ``n_salts`` tasks (the classic replicate-broadcast
  salting; only needed when the small side is too big to broadcast).

The reference's only skew tool is size-descending file scheduling
("make sure the big boys go first", ``pyontutils/ontutils.py:761``);
these operators are the shuffle-level equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, n_salts: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of the whole row's
    monotonically-increasing id is NOT deterministic across runs, so we
    salt on a stable column set — callers pass a df whose rows are
    unique; we hash all columns."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int"))


def salted_count(df: DataFrame, key_cols: list[str],
                 n_salts: int = 16) -> DataFrame:
    """count(*) per key via two-level (salted partial -> final) agg.

    Equivalent to ``df.groupBy(*key_cols).count()`` but the first-stage
    shuffle keys are (key, salt), so one hot key spreads over
    ``n_salts`` reducers before the tiny final merge."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.rand(seed=7).cast("string")),
                        F.lit(n_salts)).cast("int"))
    partial = (salted.groupBy(*key_cols, "_salt")
               .agg(F.count("*").alias("_partial")))
    return (partial.groupBy(*key_cols)
            .agg(F.sum("_partial").cast("long").alias("count")))


def heavy_hitters(df: DataFrame, key_cols: list[str],
                  min_share: float = 0.01,
                  sample_fraction: float = 0.05) -> DataFrame:
    """Keys whose sampled share exceeds ``min_share`` — the salting
    decision input.  One narrow sampled aggregation, no full shuffle."""
    s = df.sample(fraction=sample_fraction, seed=42)
    total = s.count()
    if total == 0:
        s, total = df, df.count()
    return (s.groupBy(*key_cols).count()
            .filter(F.col("count") >= max(1.0, min_share * total))
            .select(*key_cols, (F.col("count") / total).alias("share")))


def entity_mention_counts(linked: DataFrame, n_salts: int = 16) -> DataFrame:
    """Mentions per entity across the corpus — the aggregation the
    head-entity skew (top entity in ~20% of pages) hits hardest, so it
    goes through the salted two-level path."""
    return (salted_count(linked.select("iri"), ["iri"], n_salts)
            .withColumnRenamed("count", "n_mentions"))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``small`` is too large
    to broadcast: big rows get a random salt, small rows are replicated
    across all salts, and the join key becomes (key, salt)."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.rand(seed=11).cast("string")),
                        F.lit(n_salts)).cast("int"))
    small_s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        "_salt", F.col("_salt").cast("int"))
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
