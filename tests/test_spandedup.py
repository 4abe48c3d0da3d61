"""Substring-level duplicate-span detection."""

import pytest
from pyspark.sql import functions as F


def _mk_docs(spark):
    shared = " ".join(f"tok{i}" for i in range(12))        # 12 tokens
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"completely different start {shared} and a different end"),
        (3, "no duplication here at all just unique words one two "
            "three four five six seven"),
        (4, f"{shared} {shared} twice in one doc"),        # intra-doc too
        (5, "short doc"),                                  # < k tokens
    ]
    return spark.createDataFrame(rows, "doc_id int, text string"), shared


def test_window_fingerprints_shape(spark):
    from pyontutils_spark.operators.spandedup import window_fingerprints
    docs, _ = _mk_docs(spark)
    win = window_fingerprints(docs, k=8, stride=4).collect()
    assert all(r["pos"] % 4 == 0 for r in win)
    assert not any(r["doc_id"] == 5 for r in win)          # too short
    # every window is exactly k tokens
    assert all(len(r["_w"].split("\x1f")) == 8 for r in win)
    with pytest.raises(ValueError):
        window_fingerprints(docs, k=1)
    with pytest.raises(ValueError):
        window_fingerprints(docs, k=8, stride=9)


def test_duplicate_spans_finds_shared_block(spark):
    from pyontutils_spark.operators.spandedup import duplicate_spans
    docs, shared = _mk_docs(spark)
    spans = duplicate_spans(docs, k=8, stride=1).collect()
    assert spans, "shared 12-token block must produce duplicate windows"
    docsets = set()
    for r in spans:
        assert r["n_docs"] >= 2
        assert r["site_a"] != r["site_b"]
        toks = r["span_tokens"].split("\x1f")
        assert len(toks) == 8
        assert all(t.startswith("tok") for t in toks), toks
        docsets.add((r["site_a"]["doc"], r["site_b"]["doc"]))
    # docs 1, 2, 4 share the block; doc 3 never appears
    involved = {d for pair in docsets for d in pair}
    assert involved <= {1, 2, 4}
    assert {1, 4} <= involved or {1, 2} <= involved


def test_duplicate_spans_exactness_no_false_positives(spark):
    from pyontutils_spark.operators.spandedup import duplicate_spans
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(30))) for i in range(6)],
        "doc_id int, text string")
    assert duplicate_spans(docs, k=8, stride=1).count() == 0


def test_winnow_catches_phase_shifted_spans(spark):
    # winnowing guarantee: any shared span of >= k + w - 1 tokens is
    # caught REGARDLESS of its token offset in each doc (stride>1
    # provably misses phase-shifted spans — that's why winnow exists)
    from pyontutils_spark.operators.spandedup import duplicate_spans
    k, w = 8, 4
    long_shared = " ".join(f"s{i}" for i in range(k + w - 1))
    docs = spark.createDataFrame(
        [(1, f"a b c d e f g {long_shared} x y z"),      # offset 7
         (2, f"{long_shared} completely other tail of words here"),
         (3, f"qq rr {long_shared} zz")],                # offset 2
        "doc_id int, text string")
    spans = duplicate_spans(docs, k=k, winnow=w).collect()
    assert spans, "winnowed selection must collide on a k+w-1 span"
    involved = {s["doc"] for r in spans for s in (r["site_a"],
                                                  r["site_b"])}
    assert involved <= {1, 2, 3}
    # the guarantee holds pairwise for all three phase offsets
    from pyontutils_spark.operators.spandedup import winnowed_fingerprints
    win = winnowed_fingerprints(docs, k=k, w=w)
    per_doc = {d: {(r["fp"]) for r in rows} for d, rows in
               __import__("itertools").groupby(
                   sorted(win.collect(), key=lambda r: r["doc_id"]),
                   key=lambda r: r["doc_id"])}
    assert per_doc[1] & per_doc[2]
    assert per_doc[1] & per_doc[3]
    assert per_doc[2] & per_doc[3]


def _winnow_reference(hashes, w):
    """Pure-python winnowing oracle: rightmost-min of every w-run."""
    if len(hashes) < w:
        return set(range(len(hashes)))
    sel = set()
    for j in range(len(hashes) - w + 1):
        run = hashes[j:j + w]
        mn = min(run)
        sel.add(j + max(i for i, h in enumerate(run) if h == mn))
    return sel


def test_winnow_selection_matches_reference(spark):
    from pyontutils_spark.operators.spandedup import (
        window_fingerprints, winnowed_fingerprints)
    import random
    rng = random.Random(3)
    texts = [" ".join(rng.choice("abcdefgh") for _ in range(60))
             for _ in range(8)]
    texts.append("a b c")          # shorter than k: no windows
    texts.append(" ".join("x" for _ in range(12)))   # < w windows
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id int, text string")
    k, w = 5, 4
    all_win = window_fingerprints(docs, k=k, stride=1).collect()
    got = winnowed_fingerprints(docs, k=k, w=w).collect()
    by_doc_all = {}
    for r in all_win:
        by_doc_all.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    want = {}
    for d, rows in by_doc_all.items():
        rows.sort()
        want[d] = _winnow_reference([fp for _, fp in rows], w)
    got_by_doc = {}
    for r in got:
        got_by_doc.setdefault(r["doc_id"], set()).add(r["pos"])
    assert got_by_doc == {d: s for d, s in want.items() if s}
    # winnowed rows carry the same (pos, fp, _w) as the stride-1 set
    all_map = {(r["doc_id"], r["pos"]): (r["fp"], r["_w"])
               for r in all_win}
    for r in got:
        assert all_map[(r["doc_id"], r["pos"])] == (r["fp"], r["_w"])


def test_span_dedup_stats(spark):
    from pyontutils_spark.operators.spandedup import span_dedup_stats
    docs, _ = _mk_docs(spark)
    stats = {r["doc_id"]: r for r in
             span_dedup_stats(docs, k=8, stride=1).collect()}
    assert stats[3]["n_dup_windows"] == 0
    assert stats[1]["n_dup_windows"] > 0
    assert stats[4]["n_dup_windows"] > 0
    for r in stats.values():
        assert 0 <= r["n_dup_windows"] <= r["n_windows"]
    assert 5 not in stats                      # shorter than k


def test_plan_is_codegen_no_python(spark):
    from pyontutils_spark.operators.spandedup import duplicate_spans
    docs, _ = _mk_docs(spark)
    plan = duplicate_spans(docs, k=8, stride=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan            # pure JVM pipeline
    assert "NestedLoop" not in plan            # no cartesian anywhere
