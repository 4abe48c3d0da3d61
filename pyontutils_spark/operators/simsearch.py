"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force top-k — the exactness baseline.  Dot
  products via ``zip_with`` + ``aggregate`` (JVM codegen); queries are
  broadcast so the corpus is scanned once with no shuffle; top-k per
  query via window.
- ``lsh_topk``: random-hyperplane LSH scale path — signatures computed
  by an Arrow-batched numpy matmul (one matmul per batch, not per row),
  candidates restricted to same-bucket (multi-probe over ``n_tables``
  independent tables), then exact rerank.  Recall is validated against
  the brute-force baseline in tests.

At 10^12 rows the brute-force path is a deliberate cross-join and must
only be used with a small query set (it is the rerank primitive);
the LSH path's shuffle is the bucket groupBy (uniform keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType


def cosine_sim(a, b):
    """Cosine similarity of two array<float/double> columns (JVM-side)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                q_id: str = "q_id", c_id: str = "vec_id",
                q_vec: str = "embedding", c_vec: str = "embedding"
                ) -> DataFrame:
    """Exact top-k neighbors per query: (q_id, vec_id, cosine, rank)."""
    q = queries.select(F.col(q_id).alias("q_id"),
                       F.col(q_vec).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(c_id).alias("c_id"),
                      F.col(c_vec).cast("array<double>").alias("cv"))
    scored = (c.join(F.broadcast(q))
              .withColumn("cosine", cosine_sim(F.col("qv"), F.col("cv")))
              .select("q_id", F.col("c_id").alias(c_id), "cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def cosine_near_dup_pairs(vectors: DataFrame, threshold: float = 0.9,
                          id_col: str = "vec_id",
                          vec: str = "embedding") -> DataFrame:
    """Exact cosine near-duplicate verify: (id_a, id_b, cosine) for all
    pairs with cosine >= threshold.  This is the VERIFY primitive — at
    scale feed it candidate pairs from lsh/ivf blocking instead of the
    self-join (the same prune-then-verify split as jaccard_verify)."""
    a = vectors.select(F.col(id_col).alias("id_a"),
                       F.col(vec).cast("array<double>").alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"),
                       F.col(vec).cast("array<double>").alias("vb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cosine_sim(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def _planes(dim: int, n_planes: int, table: int) -> np.ndarray:
    """Deterministic hyperplanes: seeded per (table) — same on every
    executor, no broadcast needed beyond the closure."""
    rng = np.random.RandomState(7_000_003 + table)
    return rng.standard_normal((dim, n_planes)).astype("float64")


def lsh_signatures(df: DataFrame, dim: int, n_planes: int = 12,
                   n_tables: int = 3, vec: str = "embedding",
                   out: str = "buckets") -> DataFrame:
    """array<long> of ``n_tables`` bucket ids (sign pattern of the
    projections onto n_planes hyperplanes per table)."""
    planes = [_planes(dim, n_planes, t) for t in range(n_tables)]
    weights = np.array([1 << j for j in range(n_planes)], dtype="int64")

    @F.pandas_udf(ArrayType(LongType()))
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        outs = []
        for p in planes:
            bits = (m @ p) > 0.0  # (batch, n_planes)
            outs.append(bits @ weights)
        stacked = np.stack(outs, axis=1)  # (batch, n_tables)
        return pd.Series(list(stacked))

    return df.withColumn(out, sig(F.col(vec).cast("array<double>")))


def ivf_topk(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 10,
             n_cells: int = 16, nprobe: int = 4,
             q_id: str = "q_id", c_id: str = "vec_id",
             vec: str = "embedding", seed: int = 7) -> DataFrame:
    """IVF (inverted-file) ANN: deterministic KMeans cells + nprobe
    search — the second scale path next to lsh_topk.

    - **Index**: corpus assigned to ``n_cells`` KMeans cells
      (``pyspark.ml``, seeded -> deterministic).  At scale, fit on a
      sample and persist ``assigned`` partitioned by cell so a probe
      prunes partitions at the scan.
    - **Search**: each query probes its ``nprobe`` nearest centroids —
      the centroid matrix (n_cells × dim, tiny) ships to executors in
      the probe UDF's closure and every query's probe cells are
      computed in one Arrow-batched matmul, fully distributed (no
      driver collect); candidates are the union of those cells,
      reranked by exact cosine; top-k per query.
      ``nprobe == n_cells`` degenerates to exact search.

    The query table never touches the driver; at scale the probe side
    stays broadcastable as long as queries × nprobe fits the broadcast
    threshold (the usual top-k contract)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c_base = corpus.select(F.col(c_id).alias("c_id"),
                           F.col(vec).cast("array<double>").alias("cv"))
    feats = c_base.withColumn("features", array_to_vector("cv"))
    model = KMeans(k=n_cells, seed=seed).fit(feats)
    assigned = (model.transform(feats)
                .select("c_id", "cv", F.col("prediction").alias("cell")))
    centers = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    cn = centers / np.maximum(
        np.linalg.norm(centers, axis=1, keepdims=True), 1e-12)
    cnT = cn.T  # (dim, n_cells) — closure-shipped, one copy/executor

    @F.pandas_udf(ArrayType(LongType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        mn = m / np.maximum(
            np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(mn @ cnT), axis=1, kind="stable")
        return pd.Series([row[:nprobe].astype("int64").tolist()
                          for row in order])

    probe_df = (queries
                .select(F.col(q_id).alias("q_id"),
                        F.col(vec).cast("array<double>").alias("qv"))
                .withColumn("cell", F.explode(probe_cells("qv")))
                .withColumn("cell", F.col("cell").cast("int")))
    cand = assigned.join(F.broadcast(probe_df), "cell")
    scored = (cand.withColumn("cosine", cosine_sim(F.col("qv"),
                                                   F.col("cv")))
              .select("q_id", F.col("c_id").alias(c_id), "cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def lsh_topk(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 10,
             n_planes: int = 12, n_tables: int = 3,
             q_id: str = "q_id", c_id: str = "vec_id",
             vec: str = "embedding") -> DataFrame:
    """Bucketed ANN: candidates share a bucket in any table; exact
    cosine rerank within candidates; top-k per query.

    Shuffle hygiene: the n_tables-way exploded bucket join carries ONLY
    (id, table, bucket) rows — vectors are re-joined by id AFTER the
    candidate dedup (queries by broadcast, corpus by one id-join).  The
    corpus is scanned twice (signatures + vector re-join), which at
    scale is a columnar re-read vs shipping n_tables copies of every
    vector through the bucket shuffle — the re-read wins."""
    q_base = queries.select(F.col(q_id).alias("q_id"),
                            F.col(vec).cast("array<double>").alias("qv"))
    c_base = corpus.select(F.col(c_id).alias("c_id"),
                           F.col(vec).cast("array<double>").alias("cv"))
    qs = (lsh_signatures(q_base, dim, n_planes, n_tables, vec="qv")
          .select("q_id", F.posexplode("buckets").alias("table", "bucket")))
    cs = (lsh_signatures(c_base, dim, n_planes, n_tables, vec="cv")
          .select("c_id", F.posexplode("buckets").alias("table", "bucket")))
    cand = (qs.join(cs, ["table", "bucket"])
            .select("q_id", "c_id")
            .dropDuplicates(["q_id", "c_id"])
            .join(F.broadcast(q_base), "q_id")
            .join(c_base, "c_id"))
    scored = (cand.withColumn("cosine", cosine_sim(F.col("qv"), F.col("cv")))
              .select("q_id", F.col("c_id").alias(c_id), "cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
