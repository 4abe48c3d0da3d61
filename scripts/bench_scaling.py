"""Scaling-efficiency evidence (BASELINE.json:north_rule).

A real N -> 4N executor comparison is impossible in this sandbox, so —
per the driver instruction — the same KG-pipeline job runs at two
parallelism levels (local[8] vs local[32]) on the same input, in fresh
subprocesses (clean JVM each).  Efficiency =
(throughput_32 / throughput_8) / (32 / 8).  Results land in
BENCH_SCALING.json and the table in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(os.environ.get("SCALING_PAGES", "20000"))
LEVELS = (8, 32)


def ensure_pages() -> str:
    path = os.path.join(REPO, ".bench_cache", f"pages_{N_PAGES}.parquet")
    if not os.path.exists(path):
        sys.path.insert(0, REPO)
        from pyontutils_spark.session import get_spark
        from pyontutils_spark.synth.spark_gen import pages_df
        spark = get_spark("gen_pages", cores=32, shuffle_partitions=32)
        pages_df(spark, N_PAGES).write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def main() -> None:
    path = ensure_pages()
    results = {}
    for cores in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/_scaling_worker.py"),
             path, str(cores)],
            capture_output=True, text=True, check=True, cwd=REPO)
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)
        print(line)

    lo, hi = LEVELS
    speedup = results[hi]["pages_per_sec"] / results[lo]["pages_per_sec"]
    eff = speedup / (hi / lo)
    summary = {
        "levels": {str(c): results[c] for c in LEVELS},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
