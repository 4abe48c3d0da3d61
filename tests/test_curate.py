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


def test_curation_funnel_robots_stage(spark, corpus):
    robots = spark.createDataFrame(
        [("spam.example", "User-agent: *\nDisallow: /\n"),
         ("site.example", "User-agent: *\nDisallow: /p1$\n")],
        "host string, robots_txt string")
    res = curate_corpus(corpus, robots=robots)
    ids = {r.doc_id for r in res.docs.select("doc_id").collect()}
    assert 104 not in ids                   # spam.example blanket block
    assert 1 not in ids                     # /p1 disallowed
    assert 0 in ids and 2 in ids            # others unaffected
    assert res.counts["robots"] < res.counts["input"]
    # stage order: robots runs first
    assert [s for s, _ in res.stages][:2] == ["input", "robots"]
    with pytest.raises(ValueError, match="url column"):
        curate_corpus(corpus.drop("url"), url_col=None, robots=robots)


def test_curation_funnel_span_stage(spark, corpus):
    # two docs sharing a 60-token verbatim block with DISTINCT 15-token
    # remainders (phase-shifted).  lsh_bands=1 degenerates near-dup to
    # all-16-minhashes-equal (effectively exact-only), isolating the
    # span gate: these docs reach it and ~78% of their windows are
    # duplicated -> both dropped; clean docs (share 0) untouched.
    shared = " ".join(f"wall{j}" for j in range(60))
    ua = " ".join(f"uniqa{j}" for j in range(15))
    ub = " ".join(f"uniqb{j}" for j in range(15))
    extra = spark.createDataFrame(
        [(200, "http://wall.example/a", f"{shared} {ua}", "en"),
         (201, "http://wall.example/b", f"{ub} {shared}", "en")],
        "doc_id long, url string, text string, lang string")
    docs = corpus.unionByName(extra)
    res = curate_corpus(docs, lsh_bands=1, span_winnow=4, span_k=8,
                        max_dup_window_share=0.5)
    ids = {r.doc_id for r in res.docs.select("doc_id").collect()}
    assert ids.isdisjoint({200, 201})
    assert {0, 1, 2}.issubset(ids)
    assert "span_dedup" in res.counts
    assert res.counts["span_dedup"] <= res.counts["near_dedup"]
    # without the stage the wall docs survive (whole-doc dedup cannot
    # see them) — proves the stage adds real coverage
    res0 = curate_corpus(docs, lsh_bands=1)
    ids0 = {r.doc_id for r in res0.docs.select("doc_id").collect()}
    assert {200, 201} <= ids0
