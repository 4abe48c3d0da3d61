"""Deterministic corpus sampling and sequence packing — the two
data-layout operators every pretraining pipeline needs and Spark has
no primitive for.  Both are pure column expressions / windows, fully
reproducible across runs and partitionings (no rand()).

- ``hash_sample``: keep a row iff ``h32(salt || id) % den < num`` —
  the scale-correct reproducible sample (rand(seed) is partitioning-
  dependent in Spark; a content-hash threshold is not).  Optional
  per-stratum rates give weighted mixtures ("oversample lang X") with
  the same determinism.
- ``pack_sequences``: concat-then-chunk packing: documents are laid
  out in a deterministic stream order inside each shard (hash bucket),
  token offsets accumulate per shard, and a document's pack id is its
  starting offset divided by the context budget (documents may
  straddle a boundary, exactly like pretraining token streams).  One
  window per shard; shards are independent -> full cluster
  parallelism at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import h32

__all__ = ["hash_sample", "pack_sequences"]


def hash_sample(df: DataFrame, id_col: str, num: int, den: int = 100,
                salt: str = "s0",
                rates: dict[str, tuple[int, int]] | None = None,
                stratum_col: str | None = None) -> DataFrame:
    """Reproducible sample: row kept iff
    ``h32(salt || id) % den < num``.  With ``rates`` +
    ``stratum_col``, each stratum value gets its own (num, den) —
    strata absent from ``rates`` fall back to the global rate.
    Deterministic under any partitioning, stable across runs, and
    re-runnable incrementally (new rows don't disturb old
    decisions)."""
    key = h32(F.concat(F.lit(salt), F.lit("|"),
                       F.col(id_col).cast("string")))
    keep: Column = F.pmod(key, F.lit(den)) < num
    if rates:
        if stratum_col is None:
            raise ValueError("rates requires stratum_col")
        expr = keep
        for value, (n, d) in sorted(rates.items()):
            expr = F.when(F.col(stratum_col) == value,
                          F.pmod(key, F.lit(d)) < n).otherwise(expr)
        keep = expr
    return df.filter(keep)


def pack_sequences(docs: DataFrame, id_col: str = "doc_id",
                   n_tokens_col: str = "n_tokens",
                   budget: int = 4096, n_shards: int | None = None,
                   target_docs_per_shard: int = 250_000) -> DataFrame:
    """Concat-then-chunk sequence packing: within each shard
    (``h32(id) % n_shards``) documents are streamed in ascending id
    order, each starting at the running token offset; ``pack_id`` =
    ``start_offset div budget`` — exact integral division (a double
    ``/`` + floor can round across a pack boundary for non-power-of-two
    budgets and disagree with an integer oracle).  A document straddling
    a pack boundary belongs to the pack it starts in — standard
    pretraining stream chunking.  Output adds
    (shard, start_offset, pack_id).

    ``n_shards`` is the parallelism knob: each shard is ONE window
    partition, so the per-shard row count must stay executor-sized.
    When not given it is derived from the corpus:
    ``max(16, ceil(n_docs / target_docs_per_shard))`` (one count job) —
    at 10^12 documents that is ~4M shards, so no window partition ever
    exceeds ``target_docs_per_shard`` rows regardless of corpus growth.
    Within a shard the layout depends only on the ids hashed into it,
    NOT on n_shards' history — but changing n_shards re-shards, so pin
    it (or the target) per training run for reproducible packs."""
    if n_shards is None:
        n_docs = docs.count()
        n_shards = max(16, -(-n_docs // target_docs_per_shard))
    shard = F.pmod(h32(F.col(id_col).cast("string")), F.lit(n_shards))
    w = (Window.partitionBy("shard").orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (docs.withColumn("shard", shard.cast("int"))
           .withColumn("_cum", F.sum(n_tokens_col).over(w))
           .withColumn("start_offset",
                       (F.col("_cum") - F.col(n_tokens_col))
                       .cast("long"))
           .withColumn("pack_id",
                       F.expr(f"start_offset div {int(budget)}")
                       .cast("long"))
           .drop("_cum"))
    return out
