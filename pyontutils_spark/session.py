"""SparkSession factory with the engine's standard configuration.

Local mode is a stand-in for a multi-executor cluster: everything that
matters at 1000 executors (AQE, skew-join splitting, Arrow batching,
shuffle partition sizing) is configured here so the same code ships via
``spark-submit --py-files`` unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "pyontutils_spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None,
              driver_memory: str = "16g",
              extra: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)
    b = (SparkSession.builder
         .master(f"local[{cores}]")
         .appName(app)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", driver_memory)
         .config("spark.ui.enabled", "false")
         .config("spark.sql.files.maxPartitionBytes", "134217728"))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
