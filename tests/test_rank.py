"""BM25 ranking: hand-computed scores, filter pushdown, determinism."""

import math

import pytest


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick quick quick fox"),
    (3, "a completely unrelated document about spark engines"),
    (4, "fox"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


def _hand_bm25(query, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in CORPUS}
    n = len(CORPUS)
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = sorted(set(query))
    out = {}
    for i, tv in toks.items():
        total = 0
        for t in terms:
            df = sum(1 for v in toks.values() if t in v)
            tf = tv.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tv) / avgdl))
            total += round(c * 1_000_000)
        if total:
            out[i] = total
    return out


def test_bm25_matches_hand_computation(spark, docs):
    from pyontutils_spark.operators.rank import bm25_rank
    got = {r["doc_id"]: r["score_e6"]
           for r in bm25_rank(docs, ["quick", "fox"]).collect()}
    assert got == _hand_bm25(["quick", "fox"])
    # doc 2 (tf-heavy, short) outranks doc 1; doc 3/5 absent
    assert got[2] > got[1]
    assert 3 not in got and 5 not in got


def test_bm25_normalization_and_topk(spark, docs):
    from pyontutils_spark.operators.rank import bm25_rank
    # query normalization: punctuation/case fold into the token model
    a = {r["doc_id"]: r["score_e6"]
         for r in bm25_rank(docs, ["QUICK!", "Fox?"]).collect()}
    assert a == _hand_bm25(["quick", "fox"])
    top = bm25_rank(docs, ["fox"], top_k=1).collect()
    assert len(top) == 1 and top[0]["doc_id"] == 4    # shortest match
    with pytest.raises(ValueError):
        bm25_rank(docs, [])
    with pytest.raises(ValueError):
        bm25_rank(docs, ["!!!"])


def test_bm25_pushes_term_filter_below_shuffle(spark, docs):
    from pyontutils_spark.operators.rank import bm25_rank
    plan = bm25_rank(docs, ["fox"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    # the isin filter must sit under the first exchange (map side)
    gen = plan.index("Generate")          # the explode
    exch = plan.index("Exchange")
    assert "fox" in plan[min(gen, exch):], "term filter not near scan"


def test_robots_table_from_pages(spark):
    from pyontutils_spark.operators.crawl import robots_table_from_pages
    pages = spark.createDataFrame(
        [("https://a.test/robots.txt",
          b"User-agent: *\nDisallow: /x\n"),
         ("https://a.test/page", b"<html>not robots</html>"),
         ("https://b.test/robots.txt?utm=1", b"nope-query"),  # not exact
         ("https://c.test/robots.txt", "caf\xe9".encode("windows-1252")),
         ("https://a.test:8080/robots.txt",   # dup host, later url
          b"User-agent: *\nDisallow: /y\n")],
        "url string, html binary")
    got = {r["host"]: r["robots_txt"]
           for r in robots_table_from_pages(pages).collect()}
    assert set(got) == {"a.test", "c.test"}
    assert "Disallow: /x" in got["a.test"]          # min-url tie-break
    assert got["c.test"] == "caf\xe9"               # charset-sniffed
