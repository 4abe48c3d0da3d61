"""Sitemap kernel: urlset / index / text / gzip / namespace tolerance."""

import gzip

import pytest

from pyontutils_spark.kernel.sitemap import parse_sitemap


URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://e.org/a</loc>
    <lastmod>2026-01-02</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://e.org/b</loc></url>
  <url><priority>bogus</priority><loc>https://e.org/c</loc></url>
  <url><changefreq>weekly</changefreq></url><!-- no loc: dropped -->
</urlset>
"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://e.org/s1.xml</loc><lastmod>2026-02-03</lastmod></sitemap>
  <sitemap><loc>https://e.org/s2.xml.gz</loc></sitemap>
</sitemapindex>
"""


def test_urlset():
    doc = parse_sitemap(URLSET)
    assert doc.kind == "urlset"
    assert doc.children == []
    assert doc.urls[0] == ("https://e.org/a", "2026-01-02", "daily", 0.8)
    assert doc.urls[1] == ("https://e.org/b", None, None, None)
    assert doc.urls[2][0] == "https://e.org/c"
    assert doc.urls[2][3] is None          # bogus priority tolerated
    assert len(doc.urls) == 3              # loc-less entry dropped


def test_sitemapindex():
    doc = parse_sitemap(INDEX)
    assert doc.kind == "sitemapindex"
    assert doc.urls == []
    assert doc.children == [("https://e.org/s1.xml", "2026-02-03"),
                            ("https://e.org/s2.xml.gz", None)]


def test_gzip_and_bytes_input():
    doc = parse_sitemap(gzip.compress(URLSET.encode()))
    assert [u[0] for u in doc.urls] == [
        "https://e.org/a", "https://e.org/b", "https://e.org/c"]


def test_namespace_tolerance():
    # prefixed namespace and no namespace both parse
    pref = ('<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/'
            'sitemap/0.9"><sm:url><sm:loc>https://e.org/p</sm:loc>'
            "</sm:url></sm:urlset>")
    bare = "<urlset><url><loc>https://e.org/q</loc></url></urlset>"
    assert parse_sitemap(pref).urls[0][0] == "https://e.org/p"
    assert parse_sitemap(bare).urls[0][0] == "https://e.org/q"


def test_text_sitemap():
    doc = parse_sitemap("https://e.org/1\n# comment\n\nhttps://e.org/2\n")
    assert doc.kind == "text"
    assert [u[0] for u in doc.urls] == ["https://e.org/1",
                                        "https://e.org/2"]


def test_non_sitemap_xml_raises():
    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap("<html><body>nope</body></html>")
