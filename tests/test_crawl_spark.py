"""Spark robots admission: join + policy evaluation parity with kernel."""

import pytest
from pyspark.sql import functions as F

from pyontutils_spark.kernel.robots import is_allowed


ROBOTS_A = "User-agent: *\nDisallow: /private/\nAllow: /private/open$\n"
ROBOTS_B = "User-agent: ontobot\nDisallow: /\n"


@pytest.fixture(scope="module")
def tables(spark):
    pages = spark.createDataFrame(
        [("https://a.test/public/1",),
         ("https://a.test/private/1",),
         ("https://a.test/private/open",),
         ("https://A.TEST/private/2",),          # host case-folding
         ("https://b.test/anything",),
         ("https://c.test/no-robots-row",),
         ("not a url at all",)],
        "url string")
    robots = spark.createDataFrame(
        [("a.test", ROBOTS_A),
         ("b.test", ROBOTS_B),
         ("d.test", None)],
        "host string, robots_txt string")
    return pages, robots


def test_robots_admit_matches_kernel(spark, tables):
    from pyontutils_spark.operators.crawl import robots_admit
    pages, robots = tables
    got = {r["url"]: r["robots_allowed"]
           for r in robots_admit(pages, robots, "ontobot/1.0").collect()}
    assert got["https://a.test/public/1"] is True
    assert got["https://a.test/private/1"] is False
    assert got["https://a.test/private/open"] is True
    assert got["https://A.TEST/private/2"] is False      # folded host
    assert got["https://b.test/anything"] is False       # ontobot group
    assert got["https://c.test/no-robots-row"] is True   # missing file
    assert got["not a url at all"] is True               # hostless row
    # parity with the kernel one-shot for every joined row
    for url, allowed in got.items():
        host = url.split("/")[2].lower() if "://" in url else None
        txt = {"a.test": ROBOTS_A, "b.test": ROBOTS_B}.get(host)
        assert allowed == is_allowed(txt, "ontobot/1.0", url), url


def test_robots_filter_and_schema(spark, tables):
    from pyontutils_spark.operators.crawl import robots_filter
    pages, robots = tables
    out = robots_filter(pages, robots, "otherbot")
    assert out.columns == ["url"]                 # helpers dropped
    kept = {r["url"] for r in out.collect()}
    assert "https://b.test/anything" in kept      # ontobot-only block
    assert "https://a.test/private/1" not in kept


def test_host_col(spark):
    from pyontutils_spark.operators.crawl import host_col
    df = spark.createDataFrame(
        [("https://User:pw@Ex.Org:8443/p?q",),
         ("ftp://x.y/f",), ("/relative/only",)], "u string")
    got = [r["h"] for r in df.select(host_col(F.col("u")).alias("h"))
           .collect()]
    assert got == ["ex.org", "x.y", None]
