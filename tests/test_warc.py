"""WARC kernel + source: plain and per-record-gzip containers, record
filtering, HTTP header stripping, and WARC -> triple-factory parity
with the direct pages path."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pyontutils_spark.kernel.warc import parse_warc, write_warc_bytes

TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _records():
    return [
        {"type": "warcinfo", "url": "urn:info", "ts": TS,
         "html": b"software: test"},
        {"type": "request", "url": "http://a.example/x", "ts": TS,
         "html": b"GET /x HTTP/1.1"},
        {"url": "http://a.example/x", "ts": TS,
         "html": b"<html><body>alpha page</body></html>"},
        {"url": "http://a.example/gone", "ts": TS, "status": 404,
         "html": b"<html>not found</html>"},
        {"url": "http://b.example/y",
         "ts": TS + dt.timedelta(hours=1),
         "html": "<html><p>ümläut</p></html>".encode()},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_parse_warc_roundtrip(gz):
    payload = write_warc_bytes(_records(), gzip_members=gz)
    out = parse_warc(payload)
    # response records only (warcinfo/request skipped), 404 KEPT by the
    # kernel (filtering is the source's job)
    assert [r["url"] for r in out] == [
        "http://a.example/x", "http://a.example/gone",
        "http://b.example/y"]
    assert out[0]["html"] == b"<html><body>alpha page</body></html>"
    assert out[0]["status"] == 200 and out[1]["status"] == 404
    assert out[0]["ts"] == TS
    with pytest.raises(ValueError, match="WARC"):
        parse_warc(b"NOT A WARC")


def test_read_warc_source(spark, tmp_path):
    from pyontutils_spark.sources.warc import read_warc
    (tmp_path / "a.warc").write_bytes(write_warc_bytes(_records()))
    (tmp_path / "b.warc.gz").write_bytes(
        write_warc_bytes([{"url": "http://c.example/z", "ts": TS,
                           "html": b"<html>gz page</html>"}],
                         gzip_members=True))
    df = read_warc(spark, str(tmp_path))
    rows = {r.url: r for r in df.collect()}
    # 404 filtered by the source's 2xx default; both files ingested
    assert set(rows) == {"http://a.example/x", "http://b.example/y",
                         "http://c.example/z"}
    assert bytes(rows["http://c.example/z"].html) == b"<html>gz page</html>"
    assert rows["http://a.example/x"].warc_ts == TS
    assert rows["http://a.example/x"].text is None
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_warc_to_triple_factory_parity(spark, tmp_path):
    """Pages ingested from WARC must drive the triple factory to the
    EXACT triple set of the same pages fed directly — WARC is just the
    container."""
    from pyontutils_spark.plans.pipeline import run_triple_factory
    from pyontutils_spark.sources.warc import read_warc
    from pyontutils_spark.synth.lexicon import make_lexicon
    from pyontutils_spark.synth.pages import make_page
    from pyontutils_spark.synth.spark_gen import pages_df_local

    lex = make_lexicon()
    pages = [make_page(i, lex) for i in range(12)]
    recs = [{"url": p["url"],
             "ts": p["warc_ts"].replace(tzinfo=None),
             "html": p["html"]} for p in pages]
    (tmp_path / "c.warc.gz").write_bytes(
        write_warc_bytes(recs, gzip_members=True))

    direct = pages_df_local(spark, pages)
    via_warc = (read_warc(spark, str(tmp_path)).drop("lang")
                .join(direct.select("url", "lang"), "url"))  # lang stage
    t_direct = {tuple(r) for r in
                run_triple_factory(spark, direct, lex).triples.collect()}
    t_warc = {tuple(r) for r in
              run_triple_factory(spark, via_warc, lex).triples.collect()}
    assert t_warc == t_direct and len(t_direct) > 0


def test_parse_warc_malformed():
    import zlib
    # record without Content-Length
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/\r\n\r\nbody")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(bad)
    # truncated header (no blank line)
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n")
    # gzip stream that decompresses to non-WARC
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    gz = c.compress(b"plain text") + c.flush()
    with pytest.raises(ValueError, match="WARC"):
        parse_warc(gz)
