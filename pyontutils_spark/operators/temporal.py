"""Temporal / interval operators Spark lacks built-in, composed from
shuffle-safe primitives: as-of join, bucketed range join, gap
sessionization.

These are the canonical "custom operator" shapes of a large-scale
event/training-data pipeline (the reference is batch-ontology-only;
SURVEY.md §2.10 marks streaming/temporal as engine-exceeds).  Each is
expressed as plain DataFrame ops so Catalyst keeps pushdown/AQE:

- ``asof_join``: one union + one per-key window (sort within key), no
  point-in-time NLJ — the classic log-enrichment join ("which was the
  latest dimension row as of this event's timestamp").
- ``bucketed_range_join``: interval containment as an equi-join on
  overlapping fixed-width buckets + residual filter — turns the
  O(n·m) theta join into a shuffle join whose fan-out is bounded by
  interval_width/bucket_width (choose the bucket near the median
  interval width).
- ``sessionize``: gap-based session ids per key via lag + running sum
  — one window, scale = events per key, the standard formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "bucketed_range_join", "sessionize"]


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              tolerance_s: int | None = None,
              suffix: str = "_r") -> DataFrame:
    """For every left row, attach the LATEST right row with the same
    ``on`` key and ``right.ts <= left.ts`` (within ``tolerance_s``
    seconds if given) — nulls when none.  Plan: tag + union + one
    window per key ordered by (ts, tag) carrying each right attribute
    forward with ``last(..., ignorenulls=True)`` — a single shuffle on
    the key, no nested-loop point-in-time join.  Right rows sort
    before left rows at an equal timestamp (an exactly-simultaneous
    dimension row IS visible to the fact row, pandas merge_asof
    semantics).

    Contract: ``right`` must be unique per (on, ts) — with duplicates
    the carried attributes are whichever duplicate the window visits
    last (partitioning-dependent); dedupe upstream with an arg-max
    (``groupBy(on, ts).agg(F.max(F.struct(...)))``) as the gate query
    does.  Null ``ts`` rows should be filtered by the caller (they
    sort first and would see no dimension)."""
    rcols = [c for c in right.columns if c not in (on, ts)]
    l_tag = left.withColumn("_tag", F.lit(1))
    for c in rcols:
        l_tag = l_tag.withColumn(c + suffix,
                                 F.lit(None).cast(right.schema[c].dataType))
    l_tag = l_tag.withColumn("_rts", F.lit(None).cast(right.schema[ts]
                                                      .dataType))
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(c + suffix) for c in rcols],
        F.col(ts).alias("_rts"))
    lcols_only = [c for c in left.columns if c not in (on, ts)]
    for c in lcols_only:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c]
                                                     .dataType))
    u = l_tag.select(on, ts, "_tag", *lcols_only,
                     *[c + suffix for c in rcols], "_rts") \
        .unionByName(r_tag.select(on, ts, "_tag", *lcols_only,
                                  *[c + suffix for c in rcols], "_rts"))
    w = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_tag").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        on, ts, "_tag", *lcols_only,
        *[F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix)
          for c in rcols],
        F.last("_rts", ignorenulls=True).over(w).alias("_rts"))
    out = carried.filter(F.col("_tag") == 1).drop("_tag")
    if tolerance_s is not None:
        stale = (F.col("_rts").isNull()
                 | (F.unix_timestamp(ts) - F.unix_timestamp("_rts")
                    > tolerance_s))
        for c in rcols:
            out = out.withColumn(
                c + suffix, F.when(stale, F.lit(None)).otherwise(
                    F.col(c + suffix)))
    return out.drop("_rts")


def bucketed_range_join(points: DataFrame, intervals: DataFrame,
                        value: str, lo: str, hi: str,
                        bucket_width: int,
                        point_keys: list[str] | None = None,
                        interval_keys: list[str] | None = None
                        ) -> DataFrame:
    """points(value) x intervals[lo, hi) containment as an EQUI-join:
    each interval explodes into its covering fixed-width buckets, each
    point computes its bucket, the join runs on the bucket id and a
    residual ``lo <= value < hi`` filter removes bucket-edge false
    positives.  Fan-out per interval = ceil(width/bucket_width)+1 —
    pick ``bucket_width`` near the median interval width so the blow-up
    is ~2x rows, in exchange for a hash-partitionable join instead of
    a broadcast-NLJ theta join (the only built-in plan for range
    predicates)."""
    pk = point_keys or []
    ik = interval_keys or []
    b_lo = F.floor(F.col(lo) / bucket_width)
    b_hi = F.floor((F.col(hi) - 1) / bucket_width)
    iv = intervals.select(
        *ik, lo, hi,
        F.explode(F.sequence(b_lo, F.greatest(b_hi, b_lo)))
        .alias("_bucket"))
    pt = points.select(
        *pk, value,
        F.floor(F.col(value) / bucket_width).alias("_bucket"))
    return (pt.join(iv, "_bucket")
            .filter((F.col(value) >= F.col(lo))
                    & (F.col(value) < F.col(hi)))
            .drop("_bucket"))


def sessionize(events: DataFrame, key: str = "user_id", ts: str = "ts",
               gap_s: int = 1800) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    key's previous event exceeds ``gap_s``.  Adds ``session_id`` (the
    running count of session starts per key, 1-based) — one window per
    key, the standard lag + cumulative-sum formulation."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev = F.lag(F.unix_timestamp(F.col(ts))).over(w)
    new_sess = (prev.isNull()
                | (F.unix_timestamp(F.col(ts)) - prev > gap_s))
    return events.withColumn(
        "session_id",
        F.sum(new_sess.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
