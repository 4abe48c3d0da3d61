"""Spark sitemap source: per-file parse, gzip, index refs."""

import gzip


def test_read_sitemap(spark, tmp_path):
    from pyontutils_spark.sources.sitemap import read_sitemap
    (tmp_path / "a.xml").write_text(
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://e.org/a</loc><priority>0.5</priority></url>"
        "<url><loc>https://e.org/b</loc></url></urlset>")
    (tmp_path / "idx.xml").write_text(
        "<sitemapindex><sitemap><loc>https://e.org/child.xml.gz</loc>"
        "<lastmod>2026-03-01</lastmod></sitemap></sitemapindex>")
    (tmp_path / "c.xml.gz").write_bytes(gzip.compress(
        b"<urlset><url><loc>https://e.org/gz</loc></url></urlset>"))
    out = read_sitemap(spark, str(tmp_path)).collect()
    by_loc = {r["loc"]: r for r in out}
    assert len(out) == 4
    assert by_loc["https://e.org/a"]["priority"] == 0.5
    assert by_loc["https://e.org/a"]["is_index_ref"] is False
    assert by_loc["https://e.org/gz"]["src_file"].endswith("c.xml.gz")
    ref = by_loc["https://e.org/child.xml.gz"]
    assert ref["is_index_ref"] is True
    assert ref["lastmod"] == "2026-03-01"
