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
