"""10x scale soak of the two flagship plans (round-6 VERDICT item 5).

Runs kg_pipeline (triple factory) and curate_corpus once at 10x the
scaling-bench corpus — 6M pages, scale-8 text (~8 GB parquet,
~150M emitted triples) — at local[32], recording wall time, row
counts, and shuffle-spill totals from the Spark REST status API.
Purpose: surface any memory/skew cliff between the sf0.1 bench point
and the 100x design point.  NOT a timing benchmark (single run, host
drift applies); the pass/fail signal is completes-without-OOM with
zero or bounded spill and no plan change.

Usage: python scripts/soak10x.py   (~30-60 min; run nothing else)
Writes SOAK10X.json at the repo root; transfer the numbers to
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("SOAK_PAGES", "6000000"))
PAGE_SCALE = 8
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}",
                                timeout=10) as r:
        return json.loads(r.read())


def _spill_totals() -> dict:
    """Sum shuffle/spill bytes over all completed stages so far."""
    try:
        app = _rest("/applications")[0]["id"]
        stages = _rest(f"/applications/{app}/stages?status=complete")
    except Exception as e:  # UI off or not yet up
        return {"error": str(e)}
    tot = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0,
           "shuffleWriteBytes": 0, "maxStageDiskSpill": 0}
    for s in stages:
        tot["memoryBytesSpilled"] += s.get("memoryBytesSpilled", 0)
        tot["diskBytesSpilled"] += s.get("diskBytesSpilled", 0)
        tot["shuffleWriteBytes"] += s.get("shuffleWriteBytes", 0)
        tot["maxStageDiskSpill"] = max(tot["maxStageDiskSpill"],
                                       s.get("diskBytesSpilled", 0))
    return tot


def _delta(after: dict, before: dict) -> dict:
    if "error" in after or "error" in before:
        return after
    return {k: after[k] - before[k] if k != "maxStageDiskSpill"
            else after[k] for k in after}


def main() -> None:
    os.makedirs("/dev/shm/spark-graft-soak", exist_ok=True)
    from pyontutils_spark.plans.curate import curate_corpus
    from pyontutils_spark.plans.pipeline import (canonicalize_triples,
                                                 run_triple_factory)
    from pyontutils_spark.session import get_spark
    from pyontutils_spark.synth.lexicon import make_lexicon
    from pyontutils_spark.synth.spark_gen import pages_df

    spark = get_spark(
        "soak10x", cores=32, shuffle_partitions=128,
        driver_memory="64g",
        extra={"spark.local.dir": "/dev/shm/spark-graft-soak",
               "spark.ui.enabled": "true"})
    out: dict = {"n_pages": N_PAGES, "page_scale": PAGE_SCALE,
                 "cores": 32, "shuffle_partitions": 128}

    path = os.path.join(CACHE, f"pages_{N_PAGES}_s{PAGE_SCALE}.parquet")
    if not os.path.exists(path):
        t0 = time.perf_counter()
        pages_df(spark, N_PAGES, partitions=256, scale=PAGE_SCALE) \
            .write.mode("overwrite").parquet(path)
        out["gen_sec"] = round(time.perf_counter() - t0, 1)
    pages = spark.read.parquet(path)
    lex = make_lexicon()

    # warm up codegen / python workers on a small slice
    run_triple_factory(spark, pages.limit(5_000), lex).triples.count()

    # --- kg_pipeline at 10x ---------------------------------------------
    s0 = _spill_totals()
    t0 = time.perf_counter()
    res = run_triple_factory(spark, pages, lex)
    n_triples = res.triples.count()
    out["kg_pipeline_sec"] = round(time.perf_counter() - t0, 1)
    out["kg_spill"] = _delta(_spill_totals(), s0)
    out["n_triples"] = n_triples
    out["pages_per_sec"] = round(N_PAGES / out["kg_pipeline_sec"], 1)
    out["triples_per_sec"] = round(n_triples / out["kg_pipeline_sec"], 1)

    # --- canonicalize at 10x (persist triples first, like bench.py) -----
    tpath = os.path.join(CACHE, f"triples_{N_PAGES}_s{PAGE_SCALE}.parquet")
    if not os.path.exists(tpath):
        res.triples.write.parquet(tpath)
    res.linked.unpersist()
    trips = spark.read.parquet(tpath)
    s0 = _spill_totals()
    t0 = time.perf_counter()
    canonicalize_triples(trips).write.format("noop") \
        .mode("overwrite").save()
    out["canonicalize_sec"] = round(time.perf_counter() - t0, 1)
    out["canonicalize_spill"] = _delta(_spill_totals(), s0)

    # --- curation funnel at 10x ------------------------------------------
    docs = pages.select("url", "text", "lang")
    s0 = _spill_totals()
    t0 = time.perf_counter()
    res2 = curate_corpus(docs, id_col="url", url_col="url",
                         text_col="text", lang_col="lang", report=True)
    # report=True already counted every stage boundary; final count is
    # in res2.counts — no extra action needed
    out["curate_sec"] = round(time.perf_counter() - t0, 1)
    out["curate_counts"] = res2.counts
    out["curate_spill"] = _delta(_spill_totals(), s0)

    with open(os.path.join(os.path.dirname(CACHE), "SOAK10X.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
