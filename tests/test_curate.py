"""End-to-end corpus curation funnel: every stage's semantics on a
planted corpus, monotone shrinking, and determinism under
repartitioning."""

import pytest
from pyspark.sql import functions as F

from pyontutils_spark.plans.curate import curate_corpus

def _doc(i: int) -> str:
    # per-doc DISTINCT token set (shared templates would make the whole
    # corpus one near-dup cluster — corpus truth, not a bug)
    return " ".join(f"token{i}x{j}" for j in range(25))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 30 clean, mutually-distinct docs
    for i in range(30):
        rows.append((i, f"http://site.example/p{i}", _doc(i), "en"))
    # url variants of doc 0 (tracking params + userinfo): ids 100, 101
    rows.append((100, "http://site.example/p0?utm_source=x",
                 _doc(0), "en"))
    rows.append((101, "http://bob@site.example/p0#frag",
                 _doc(0), "en"))
    # exact dup of doc 1 at a DIFFERENT url: id 102
    rows.append((102, "http://mirror.example/copy1", _doc(1), "en"))
    # near-dup of doc 2 (one token changed -> Jaccard 24/26): id 103
    rows.append((103, "http://other.example/near2",
                 _doc(2).replace("token2x7", "changed2x7"), "en"))
    # low-quality docs: repetition + too short: ids 104, 105
    rows.append((104, "http://spam.example/s",
                 "spam spam spam spam spam spam spam spam spam spam",
                 "en"))
    rows.append((105, "http://short.example/s", "too short", "en"))
    return spark.createDataFrame(
        rows, "doc_id long, url string, text string, lang string")


def test_curation_funnel_semantics(spark, corpus):
    res = curate_corpus(corpus)
    ids = {r.doc_id for r in res.docs.select("doc_id").collect()}
    # representatives survive
    assert {0, 1, 2}.issubset(ids)
    # url variants, exact dup, near-dup, and junk are gone
    assert ids.isdisjoint({100, 101, 102, 103, 104, 105})
    # counts shrink monotonically through the funnel
    c = res.counts
    assert c["input"] == 36
    assert c["input"] >= c["url_dedup"] >= c["exact_dedup"] \
        >= c["near_dedup"] >= c["quality"]
    # url stage removed exactly the two url variants
    assert c["url_dedup"] == 34
    # exact stage removed the mirror copy
    assert c["exact_dedup"] == 33
    # quality stage removed the two junk docs
    assert c["near_dedup"] - c["quality"] == 2


def test_curation_deterministic_and_sampled(spark, corpus):
    a = curate_corpus(corpus.repartition(7), report=False,
                      sample_num=50, sample_den=100)
    b = curate_corpus(corpus.repartition(3), report=False,
                      sample_num=50, sample_den=100)
    ia = {r.doc_id for r in a.docs.collect()}
    ib = {r.doc_id for r in b.docs.collect()}
    assert ia == ib  # partitioning-independent
    # sample is a subset of the unsampled survivors, and monotone:
    full = {r.doc_id for r in
            curate_corpus(corpus, report=False).docs.collect()}
    assert ia < full
    bigger = {r.doc_id for r in
              curate_corpus(corpus, report=False, sample_num=90,
                            sample_den=100).docs.collect()}
    assert ia <= bigger


def test_curation_no_url_column(spark, corpus):
    res = curate_corpus(corpus.drop("url"), url_col=None, report=True)
    assert "url_dedup" not in res.counts
    assert res.counts["exact_dedup"] <= res.counts["input"]


def test_curation_null_urls_not_collapsed(spark):
    # Docs with a NULL url (partial URL coverage) must each survive
    # the url-dedup stage — a null canonical url is NOT one group.
    rows = [(i, None, _doc(i), "en") for i in range(10)]
    rows.append((50, "http://site.example/a?utm_source=x", _doc(50), "en"))
    rows.append((51, "http://site.example/a", _doc(50), "en"))
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, text string, lang string")
    res = curate_corpus(docs)
    # url stage: only the true url-variant pair collapses (12 -> 11)
    assert res.counts["url_dedup"] == 11
    ids = {r.doc_id for r in res.docs.select("doc_id").collect()}
    assert set(range(10)).issubset(ids)
    assert 50 in ids and 51 not in ids  # min-id variant kept
