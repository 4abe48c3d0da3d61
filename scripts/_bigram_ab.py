"""A/B: top-bigram share via explode+groupBy (current, 2 shuffles)
vs per-row array_sort + max-run higher-order aggregate (0 shuffles).
Checks value equality on 200k docs, then times both interleaved."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from pyontutils_spark.operators.dedup import tokens_col
from pyontutils_spark.operators.textstats import (
    _bigram_at, gopher_quality_flags)
from pyontutils_spark.session import get_spark

spark = get_spark("bigram_ab", cores=32, shuffle_partitions=128,
                  driver_memory="24g")
docs = spark.read.parquet(
    os.path.join(REPO, ".bench_cache", "docs_2000000.parquet"))


def rowwise(d):
    toks = d.select(F.col("doc_id").alias("id"),
                    tokens_col(F.col("text")).alias("ts"))
    bg = F.when(
        F.size("ts") >= 2,
        F.array_sort(F.transform(F.sequence(F.lit(1), F.size("ts") - 1),
                                 _bigram_at("ts")))
    ).otherwise(F.array().cast("array<string>"))
    zero = F.struct(F.lit("").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0).cast("long").alias("best"))

    def step(acc, x):
        run = (F.when(x == acc["prev"], acc["run"] + 1)
               .otherwise(F.lit(1).cast("long")))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    best = F.aggregate(bg, zero, step, lambda acc: acc["best"])
    n = F.size("ts")
    return toks.select(
        "id",
        F.when(n >= 2, F.round(best / (n - 1) * 10_000).cast("long"))
        .otherwise(F.lit(0).cast("long")).alias("top_bigram_share_e4"))


def current(d):
    return gopher_quality_flags(d, "doc_id", "text").select(
        "id", "top_bigram_share_e4")


# equality on 200k
sub = docs.filter("doc_id % 10 = 0")
diff = (rowwise(sub).alias("a")
        .join(current(sub).alias("b"), "id")
        .filter(F.col("a.top_bigram_share_e4")
                != F.col("b.top_bigram_share_e4")))
print("mismatches:", diff.count(), flush=True)


def force(df):
    df.write.format("noop").mode("overwrite").save()


force(rowwise(docs.filter("doc_id % 200 = 0")))  # warm
force(current(docs.filter("doc_id % 200 = 0")))
runs = {"rowwise": [], "explode": []}
for _ in range(2):
    t0 = time.perf_counter(); force(rowwise(docs))
    runs["rowwise"].append(round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter(); force(current(docs))
    runs["explode"].append(round(time.perf_counter() - t0, 1))
print(runs, flush=True)
spark.stop()
