"""10x-scale soak of the round-6 operators: span dedup (winnowed),
BPE train/encode, LM train/score on the 2M-doc corpus.

Purpose (same as soak_10x.py, which covers kg_pipeline/curate_corpus):
surface memory/skew/spill cliffs between bench scale (100k docs) and
the 100x design point while the host is otherwise quiet.  Reuses the
soak_10x REST metric helpers; prints one JSON line and writes
SOAK_NEWOPS_r06.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from soak_10x import _delta, _stage_totals  # noqa: E402

CACHE = os.path.join(REPO, ".bench_cache")
N_DOCS = int(os.environ.get("SOAK_DOCS", "2000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyontutils_spark.operators.lm import score_docs, train_ngram_lm
    from pyontutils_spark.operators.spandedup import duplicate_spans
    from pyontutils_spark.operators.tokenize import bpe_encode, train_bpe
    from pyontutils_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        "soak_newops", cores=CPUS, shuffle_partitions=4 * CPUS,
        driver_memory="48g",
        extra={"spark.ui.enabled": "true",
               "spark.ui.retainedStages": "5000"})
    out: dict = {"n_docs": N_DOCS, "cpus": CPUS,
                 "shuffle_partitions": 4 * CPUS}
    docs_path = os.path.join(CACHE, f"docs_{N_DOCS}.parquet")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        raise SystemExit(f"run scripts/soak_10x.py first (needs {docs_path})")
    docs = spark.read.parquet(docs_path)

    def timed(name: str, fn) -> None:
        before = _stage_totals()
        t0 = time.perf_counter()
        result = fn()
        out[f"{name}_sec"] = round(time.perf_counter() - t0, 1)
        out[f"{name}_result"] = result
        out[f"{name}_metrics"] = _delta(_stage_totals(), before)
        print(f"# {name}: {out[f'{name}_sec']}s {result}", flush=True)

    timed("span_dedup_winnow",
          lambda: {"dup_spans":
                   duplicate_spans(docs, k=20, winnow=8).count()})

    def _bpe():
        trained = train_bpe(docs, n_merges=1024, min_count=10)
        out["bpe_train_words_used"] = trained.n_words_used
        t0 = time.perf_counter()
        total = (bpe_encode(docs, trained.tokenizer)
                 .agg(F.sum("n_bpe_tokens").alias("s"))
                 .collect()[0]["s"])
        out["bpe_encode_only_sec"] = round(time.perf_counter() - t0, 1)
        return {"bpe_tokens": int(total),
                "vocab": len(trained.tokenizer.vocab)}

    timed("bpe_train_encode", _bpe)

    def _lm():
        lm = train_ngram_lm(docs, max_vocab=50_000, min_count=10)
        out["lm_vocab"] = lm.vsize
        out["lm_bigrams"] = len(lm.bigrams)
        t0 = time.perf_counter()
        hist = (score_docs(docs, lm)
                .agg(F.avg("bits_per_token_e3").alias("avg"),
                     F.max("bits_per_token_e3").alias("max"))
                .collect()[0])
        out["lm_score_only_sec"] = round(time.perf_counter() - t0, 1)
        return {"avg_bits_e3": int(hist["avg"]),
                "max_bits_e3": int(hist["max"])}

    timed("lm_train_score", _lm)

    with open(os.path.join(REPO, "SOAK_NEWOPS_r06.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
