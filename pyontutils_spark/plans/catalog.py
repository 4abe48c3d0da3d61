"""Graph materialization as partitioned tables (Iceberg when a catalog
is configured, plain partitioned parquet otherwise).

The target deployment materializes the triple and entity tables as
partitioned Iceberg tables (BASELINE.json:north_rule).  This runtime
ships no Iceberg jars, so the writer is catalog-dispatched:

- **Iceberg path** (``spark.sql.catalog.<name>`` configured): DataFrame
  V2 ``writeTo(ident).partitionedBy(...).createOrReplace()`` — snapshot
  isolation and MERGE-friendly; the lineage flow's per-bucket overwrite
  maps to ``overwritePartitions()``.
- **Parquet fallback** (this sandbox): ``partitionBy`` directory layout
  with dynamic partition overwrite — the same idempotent-rerun
  semantics lineage.py relies on.

Both paths partition identically, so a cluster with Iceberg jars flips
with one config and no code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_BUCKETS = 64


def has_v2_catalog(spark: SparkSession, catalog: str) -> bool:
    """True when a named V2 catalog (e.g. Iceberg) is configured."""
    try:
        return spark.conf.get(f"spark.sql.catalog.{catalog}") is not None
    except Exception:  # noqa: BLE001 — unset config raises
        return False


def with_subject_bucket(triples: DataFrame,
                        n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Partition column: hash bucket of the subject — co-locates all
    triples of an entity (point lookups prune to one partition; the
    skewed-head-entity problem stays inside one bucket where AQE's
    skew-join split handles it)."""
    return triples.withColumn(
        "subj_bucket",
        F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int"))


def write_triples_table(spark: SparkSession, triples: DataFrame,
                        location: str, catalog: str | None = None,
                        table: str = "triples",
                        n_buckets: int = DEFAULT_BUCKETS) -> str:
    """Materialize the triple table partitioned by subject bucket.
    Returns the identifier/path to read back."""
    bucketed = with_subject_bucket(triples, n_buckets)
    if catalog and has_v2_catalog(spark, catalog):
        ident = f"{catalog}.{table}"
        (bucketed.writeTo(ident).partitionedBy("subj_bucket")
         .createOrReplace())
        return ident
    path = os.path.join(location, table)
    # STATIC overwrite: this writes the WHOLE table, so the previous
    # contents must go — dynamic mode would leave stale partitions
    # behind when a rewrite produces fewer non-empty buckets.  (The
    # lineage flow's per-bucket partial rewrites are the dynamic-mode
    # use case; there the bucket set per write is fixed.)  Writer-level
    # option, so the session config is not mutated.
    (bucketed.write.mode("overwrite")
     .option("partitionOverwriteMode", "static")
     .partitionBy("subj_bucket").parquet(path))
    return path


def write_entities_table(spark: SparkSession, triples: DataFrame,
                         location: str, catalog: str | None = None,
                         table: str = "entities") -> str:
    """Entity table: one row per subject with sorted per-predicate
    object lists (the OntoPandas pivot shape) — the query-side companion
    of the triple table."""
    ent = (triples.groupBy("subj", "pred")
           .agg(F.sort_array(F.collect_list("obj")).alias("objs"))
           .groupBy("subj")
           .agg(F.map_from_entries(
               F.sort_array(F.collect_list(F.struct("pred", "objs"))))
               .alias("props")))
    if catalog and has_v2_catalog(spark, catalog):
        ident = f"{catalog}.{table}"
        ent.writeTo(ident).createOrReplace()
        return ident
    path = os.path.join(location, table)
    ent.write.mode("overwrite").parquet(path)
    return path


def read_table(spark: SparkSession, ident_or_path: str) -> DataFrame:
    if "://" in ident_or_path or os.path.sep in ident_or_path:
        return spark.read.parquet(ident_or_path)
    return spark.table(ident_or_path)
