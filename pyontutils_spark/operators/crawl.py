"""Crawl-politeness admission: join pages to per-host robots.txt and
keep only URLs the pipeline's user agent may fetch.

Scale shape (10^12 pages, ~10^8 hosts): the robots table is host-keyed
and orders of magnitude smaller than pages but NOT broadcast-safe in
general, so admission is an equi-join on host — AQE picks broadcast
when a crawl slice's host set is small, sort-merge otherwise — followed
by ONE Arrow-batched pandas stage that evaluates the RFC 9309 policy
(:mod:`..kernel.robots`).  Policies are compiled once per distinct
robots.txt per executor (hash-keyed cache), not per row; host
extraction stays in whole-stage codegen.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BooleanType

from ..kernel.robots import parse_robots

__all__ = ["host_col", "robots_admit", "robots_filter",
           "robots_table_from_pages"]

_HOST_RX = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/:?#]+)"


def host_col(url) -> Column:
    """Lower-cased registrable host of a URL (codegen regexp)."""
    h = F.regexp_extract(url, _HOST_RX, 1)
    return F.when(h != "", F.lower(h))


def _allowed_udf(user_agent: str):
    cache: dict = {}

    def allowed(robots_txt: pd.Series, urls: pd.Series) -> pd.Series:
        def one(txt, url):
            if txt is None or not txt:
                return True
            key = hashlib.md5(txt.encode("utf-8", "replace")).digest()
            pol = cache.get(key)
            if pol is None:
                if len(cache) > 4096:
                    cache.clear()      # bound executor memory
                pol = cache[key] = parse_robots(txt)
            return pol.allowed(user_agent, url)

        return pd.Series([one(t, u) for t, u in zip(robots_txt, urls)],
                         dtype=bool)

    return F.pandas_udf(allowed, BooleanType())


def robots_admit(pages: DataFrame, robots: DataFrame, user_agent: str,
                 url_col: str = "url", robots_host_col: str = "host",
                 robots_txt_col: str = "robots_txt",
                 out_col: str = "robots_allowed") -> DataFrame:
    """Annotate pages with ``out_col``: may ``user_agent`` fetch the URL?

    ``robots`` is (host, robots_txt); hosts with no row (or a null/empty
    robots.txt) admit everything — the REP default for a missing file.
    Left join preserves every page row; the policy UDF runs once per
    row but compiles once per distinct robots.txt per executor.
    """
    r = (robots
         .select(F.lower(F.col(robots_host_col)).alias("__rb_host"),
                 F.col(robots_txt_col).alias("__rb_txt"))
         .dropDuplicates(["__rb_host"]))
    joined = (pages
              .withColumn("__pg_host", host_col(F.col(url_col)))
              .join(r, F.col("__pg_host") == F.col("__rb_host"), "left"))
    udf = _allowed_udf(user_agent)
    return (joined
            .withColumn(out_col, udf(F.col("__rb_txt"), F.col(url_col)))
            .drop("__pg_host", "__rb_host", "__rb_txt"))


def robots_filter(pages: DataFrame, robots: DataFrame, user_agent: str,
                  **kw) -> DataFrame:
    """Pages surviving robots admission (drops the annotation column)."""
    out_col = kw.pop("out_col", "robots_allowed")
    ann = robots_admit(pages, robots, user_agent, out_col=out_col, **kw)
    return ann.filter(F.col(out_col)).drop(out_col)


def robots_table_from_pages(pages: DataFrame, url_col: str = "url",
                            payload_col: str = "html") -> DataFrame:
    """(host, robots_txt) from a crawled pages table.

    Common Crawl ships robots.txt captures as ordinary WARC responses;
    after ``sources/warc.read_warc`` they are pages rows whose URL path
    is exactly ``/robots.txt``.  This selects those rows, decodes the
    byte payload through the charset sniffer, and keeps one row per
    host (min-URL deterministic tie-break) — the table
    :func:`robots_admit` consumes.  Everything before the one small
    decode stage is codegen on an already-tiny filtered slice.
    """
    from ..kernel.encoding import decode_html

    def dec(payloads: pd.Series) -> pd.Series:
        return payloads.map(
            lambda p: None if p is None else decode_html(bytes(p)))

    dec_udf = F.pandas_udf(dec, "string")
    rob = (pages
           .filter(F.regexp_extract(F.col(url_col),
                                    r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"
                                    r"[^/?#]+(/robots\.txt)$", 1)
                   == "/robots.txt")
           .select(host_col(F.col(url_col)).alias("host"),
                   F.col(url_col).alias("__u"),
                   F.col(payload_col).alias("__p")))
    first = (rob.groupBy("host")
             .agg(F.min_by(F.col("__p"), F.col("__u")).alias("__p")))
    return first.select("host", dec_udf(F.col("__p")).alias("robots_txt"))
