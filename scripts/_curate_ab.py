"""A/B: curate one-pass at 2M docs, default 128 shuffle partitions vs
AQE initialPartitionNum=512 — does fine-grained initial partitioning
remove the ~29GB memory spill?  Usage: _curate_ab.py [init_parts]"""
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

init = sys.argv[1] if len(sys.argv) > 1 else None

from pyontutils_spark.plans.curate import curate_corpus
from pyontutils_spark.session import get_spark

extra = {"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"}
if init:
    extra["spark.sql.adaptive.coalescePartitions.initialPartitionNum"] = init
spark = get_spark("curate_ab", cores=32, shuffle_partitions=128,
                  driver_memory="48g", extra=extra)
docs = spark.read.parquet(os.path.join(REPO, ".bench_cache",
                                       "docs_2000000.parquet"))
w = curate_corpus(docs.limit(10_000), report=False)
w.docs.count()


def totals():
    try:
        with urllib.request.urlopen(
                "http://localhost:4040/api/v1/applications", timeout=30) as r:
            app = json.load(r)[0]["id"]
        with urllib.request.urlopen(
                f"http://localhost:4040/api/v1/applications/{app}"
                "/stages?status=complete", timeout=30) as r:
            st = json.load(r)
    except Exception:
        return {}
    return {"mem_spill_b": sum(s.get("memoryBytesSpilled", 0) for s in st),
            "disk_spill_b": sum(s.get("diskBytesSpilled", 0) for s in st)}


b = totals()
t0 = time.perf_counter()
n = curate_corpus(docs, sample_num=50, report=False).docs.count()
dt = round(time.perf_counter() - t0, 1)
a = totals()
print(json.dumps({"init": init, "sec": dt, "n": n,
                  "mem_spill_b": a.get("mem_spill_b", 0) - b.get("mem_spill_b", 0),
                  "disk_spill_b": a.get("disk_spill_b", 0) - b.get("disk_spill_b", 0)}))
spark.stop()
