"""10x scale soak of the two flagship plans (VERDICT round-5 item 5).

Runs, ONCE each at local[32], on corpora 10x the per-round bench scale:

- ``kg_pipeline``: 6M synthesized pages (10x the round-1 600k resume
  soak) through the full triple factory (extract -> mention -> link ->
  emit), counting the emitted triples.
- ``curate_corpus``: 2M synthetic documents (realistic dup mix, see
  ``synth.spark_gen.documents_df``) through the 5-stage funnel with
  per-stage counts.

Purpose: surface any memory/skew cliff between sf0.1 and the 100x
design point.  Records wall time, per-stage shuffle read/write and
spill bytes (Spark REST status API), and peak JVM heap; prints one
JSON line and writes .bench_cache/SOAK_r06.json.

Corpora are cached in .bench_cache (generation excluded from timing);
re-running reuses them.  Do NOT run other Spark work concurrently.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.join(REPO, ".bench_cache")
N_PAGES = int(os.environ.get("SOAK_PAGES", "6000000"))
N_DOCS = int(os.environ.get("SOAK_DOCS", "2000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
UI = "http://localhost:4040/api/v1"


def _api(path: str):
    with urllib.request.urlopen(f"{UI}/{path}", timeout=30) as r:
        return json.load(r)


def _stage_totals() -> dict:
    """Sum shuffle/spill bytes over all completed stages so far.

    Also records the per-stage shuffle-write max and the set of seen
    stage ids so _delta can scope the max to ONE timed plan (without
    the id set, a later plan's "max stage" silently reports the
    biggest stage of the whole application)."""
    try:
        app_id = _api("applications")[0]["id"]
        stages = _api(f"applications/{app_id}/stages?status=complete")
    except Exception:
        return {}
    tot = {"shuffle_read_b": 0, "shuffle_write_b": 0,
           "mem_spill_b": 0, "disk_spill_b": 0,
           "max_stage_shuffle_write_b": 0}
    per_stage = {}
    for s in stages:
        tot["shuffle_read_b"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write_b"] += s.get("shuffleWriteBytes", 0)
        tot["mem_spill_b"] += s.get("memoryBytesSpilled", 0)
        tot["disk_spill_b"] += s.get("diskBytesSpilled", 0)
        tot["max_stage_shuffle_write_b"] = max(
            tot["max_stage_shuffle_write_b"], s.get("shuffleWriteBytes", 0))
        per_stage[(s.get("stageId"), s.get("attemptId"))] = \
            s.get("shuffleWriteBytes", 0)
    tot["_per_stage"] = per_stage
    return tot


def _delta(after: dict, before: dict) -> dict:
    if not after:
        return {}
    out = {k: after[k] - before.get(k, 0) for k in after
           if not k.startswith(("max_", "_"))}
    new = [v for k, v in after.get("_per_stage", {}).items()
           if k not in before.get("_per_stage", {})]
    out["max_stage_shuffle_write_b"] = max(new, default=0)
    return out


def main() -> None:
    from pyontutils_spark.plans.curate import curate_corpus
    from pyontutils_spark.plans.pipeline import run_triple_factory
    from pyontutils_spark.session import get_spark
    from pyontutils_spark.synth.lexicon import make_lexicon
    from pyontutils_spark.synth.spark_gen import documents_df, pages_df

    spark = get_spark(
        "soak10x", cores=CPUS, shuffle_partitions=4 * CPUS,
        driver_memory="48g",
        extra={"spark.ui.enabled": "true",
               "spark.ui.retainedStages": "5000"})
    out: dict = {"n_pages": N_PAGES, "n_docs": N_DOCS, "cpus": CPUS,
                 "shuffle_partitions": 4 * CPUS}

    # ---- corpora (cached; generation excluded from timed runs) -----
    pages_path = os.path.join(CACHE, f"pages_{N_PAGES}.parquet")
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        t0 = time.perf_counter()
        pages_df(spark, N_PAGES).write.mode("overwrite").parquet(pages_path)
        out["pages_gen_sec"] = round(time.perf_counter() - t0, 1)
        print(f"# pages generated in {out['pages_gen_sec']}s", flush=True)
    docs_path = os.path.join(CACHE, f"docs_{N_DOCS}.parquet")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        t0 = time.perf_counter()
        documents_df(spark, N_DOCS).write.mode("overwrite").parquet(docs_path)
        out["docs_gen_sec"] = round(time.perf_counter() - t0, 1)
        print(f"# docs generated in {out['docs_gen_sec']}s", flush=True)

    pages = spark.read.parquet(pages_path)
    docs = spark.read.parquet(docs_path)
    lex = make_lexicon()

    # ---- kg_pipeline at 6M pages -----------------------------------
    warm = run_triple_factory(spark, pages.limit(5_000), lex)
    warm.triples.count()
    warm.linked.unpersist()

    before = _stage_totals()
    t0 = time.perf_counter()
    res = run_triple_factory(spark, pages, lex)
    n_triples = res.triples.count()
    out["kg_pipeline_sec"] = round(time.perf_counter() - t0, 1)
    res.linked.unpersist()
    out["kg_metrics"] = _delta(_stage_totals(), before)
    out["n_triples"] = n_triples
    out["kg_pages_per_sec"] = round(N_PAGES / out["kg_pipeline_sec"], 1)
    print(f"# kg_pipeline {out['kg_pipeline_sec']}s "
          f"{n_triples} triples", flush=True)

    # ---- curate_corpus at 2M docs ----------------------------------
    cw = curate_corpus(docs.limit(10_000), report=False)
    cw.docs.count()

    # timed: ONE pass (report=True would re-execute each stage's lazy
    # prefix per count — O(stages^2) recomputation, not funnel cost)
    before = _stage_totals()
    t0 = time.perf_counter()
    cres = curate_corpus(docs, sample_num=50, report=False)
    n_out = cres.docs.count()
    out["curate_sec"] = round(time.perf_counter() - t0, 1)
    out["curate_metrics"] = _delta(_stage_totals(), before)
    out["curate_docs_per_sec"] = round(N_DOCS / out["curate_sec"], 1)
    out["curate_survivors"] = n_out
    print(f"# curate_corpus {out['curate_sec']}s {n_out} out",
          flush=True)

    # untimed: per-stage counts for the funnel-shape record
    out["curate_counts"] = {
        name: df.count() for name, df in cres.stages}
    print(f"# curate stage counts {out['curate_counts']}", flush=True)

    print(json.dumps(out))
    with open(os.path.join(CACHE, "SOAK_r06.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
