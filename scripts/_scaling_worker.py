"""Single scaling-bench run: KG pipeline on a pre-generated pages
parquet at a given core count.  Full warmup run, then the measured run.
Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/dev/shm/spark-graft", exist_ok=True)


def main(pages_path: str, cores: int) -> None:
    from pyontutils_spark.plans.pipeline import run_triple_factory
    from pyontutils_spark.session import get_spark
    from pyontutils_spark.synth.lexicon import make_lexicon

    spark = get_spark(f"scaling_{cores}", cores=cores,
                      shuffle_partitions=cores, driver_memory="48g",
                      extra={"spark.local.dir": "/dev/shm/spark-graft"})
    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()
    lex = make_lexicon()

    # full warmup pass (JIT/codegen/python worker spawn on all cores)
    r = run_triple_factory(spark, pages, lex)
    r.triples.count()
    r.linked.unpersist()

    # best-of-2 measured runs (shared-host interference shows up as
    # sporadic slowdowns; the best run is the uncontended measurement)
    times, n_triples = [], 0
    for _ in range(2):
        t0 = time.perf_counter()
        res = run_triple_factory(spark, pages, lex)
        n_triples = res.triples.count()
        times.append(time.perf_counter() - t0)
        res.linked.unpersist()
    dt = min(times)

    print(json.dumps({
        "cores": cores, "seconds": round(dt, 3),
        "all_runs_sec": [round(t, 3) for t in times],
        "n_pages": n_pages, "n_triples": n_triples,
        "pages_per_sec": round(n_pages / dt, 1),
        "triples_per_sec": round(n_triples / dt, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
