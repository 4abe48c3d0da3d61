"""Substring-level duplicate-span detection (exact-substring dedup).

Doc-level dedup (exact/MinHash/SimHash, :mod:`.dedup`) misses the
dominant contamination mode in web corpora: long spans (boilerplate,
licenses, quoted articles) duplicated across otherwise-distinct
documents.  The public reference for why this matters is Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499), which removes duplicate substrings of >= k tokens.

Their suffix-array construction is a single-machine algorithm; the
Spark-first rendition here gets the same candidate spans with pure
DataFrame ops:

1. tokenize each doc once (codegen ``split``),
2. fingerprint each k-token window (``xxhash64``; window text is
   hashed element-wise and NEVER materialized as an array),
3. select candidate windows (stride or winnowing, below),
4. ``groupBy`` fingerprint over (id, pos, fp) rows ONLY — 8-byte
   hashes, never text — keep buckets hit by >= 2 distinct docs,
5. re-derive the window text for SURVIVING windows only (join the
   selected positions back to the docs, one tokenize per surviving
   doc) and equality-verify inside the bucket by grouping on
   (fp, window text): a collision can only SPLIT a bucket, never
   merge two distinct spans.

Two window-selection modes control shuffle volume:

- stride s (``window_fingerprints``): every s-th window.  s=1 is the
  exact Lee-et-al. candidate set; s>1 is CHEAP BUT PHASE-SENSITIVE —
  a span shared at different token offsets mod s in two docs is
  missed, so stride>1 is a diagnostic/estimation tool only.
- winnowing w (``winnowed_fingerprints``): the content-defined
  selection of Schleimer et al. 2003 ("Winnowing: Local Algorithms
  for Document Fingerprinting", SIGMOD — public paper): from every
  run of w consecutive window hashes, the rightmost minimum is
  selected.  Selection depends only on content, so it is
  phase-IMMUNE, with the paper's guarantee: any shared span of
  >= k + w - 1 tokens shares at least one selected fingerprint in
  both documents, at an expected 2/(w+1) selection density.

Scale notes (learned from a 2M-doc soak): the first implementation
evaluated an O(windows * w^2) exists-over-splits selection in
interpreted higher-order functions and re-ran it for every consumer —
1472 s at 2M docs.  The current shape is O(windows * w): one pass
builds the sliding-window minima as ``(fp, -pos)`` structs (struct
min == rightmost-min tie-break), selection is one struct-equality
probe per position, the (id, pos, fp) rows are persisted before the
two aggregation consumers, and window text exists only for survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col

__all__ = ["window_fingerprints", "winnowed_fingerprints",
           "duplicate_spans", "span_dedup_stats"]

_SEP = "\x1f"


def window_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 50,
                        stride: int = 25) -> DataFrame:
    """(id, pos, fp, _w) for every k-token window at multiples of stride.

    ``pos`` is the token offset of the window start; ``_w`` is the
    window's token text (consumers that only need hashes should select
    it away BEFORE any shuffle).  Docs shorter than k tokens emit
    nothing (no span of length k can be duplicated).
    Everything is codegen: tokens are let-bound via a lateral explode
    of ONE array so the tokenizer runs once per doc (the gopher-stats
    lesson: never re-evaluate a derived array inside element_at).
    """
    if k < 2:
        raise ValueError("window length k must be >= 2 tokens")
    if not 1 <= stride <= k:
        raise ValueError("stride must be in [1, k]")
    toks = docs.select(
        F.col(id_col), F.explode(F.array(tokens_col(F.col(text_col))))
        .alias("_ts"))
    n = F.size("_ts")
    starts = F.sequence(F.lit(0), n - F.lit(k), F.lit(stride))
    return (toks
            .filter(n >= k)
            .select(id_col, F.explode(starts).alias("pos"), "_ts")
            .select(id_col, "pos",
                    F.concat_ws(_SEP, F.slice("_ts", F.col("pos") + 1,
                                              k)).alias("_w"))
            .select(id_col, "pos", F.xxhash64("_w").alias("fp"),
                    F.col("_w")))


def _winnow_light(docs: DataFrame, id_col: str, text_col: str,
                  k: int, w: int) -> DataFrame:
    """(id, pos, fp) winnowed selection — NO window text anywhere.

    O(windows * w): sliding-window minima built once as (fp, -pos)
    structs (struct ordering makes array_min the rightmost-min on
    hash ties, matching the reference tie-break), then each position
    probes the <= w window-minima that could have selected it.
    """
    if k < 2:
        raise ValueError("window length k must be >= 2 tokens")
    if w < 1:
        raise ValueError("winnow run length w must be >= 1")
    toks = docs.select(
        F.col(id_col), F.explode(F.array(tokens_col(F.col(text_col))))
        .alias("_ts"))
    n = F.size("_ts")
    fpa_expr = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.xxhash64(F.concat_ws(_SEP, F.slice("_ts", i + 1, k))))
    d = (toks.filter(n >= k)
         .select(id_col, F.explode(F.array(fpa_expr)).alias("_fpa")))
    sf_expr = F.transform(
        "_fpa", lambda x, i: F.struct(x.alias("fp"), (-i).alias("np")))
    d = d.select(id_col, "_fpa", F.explode(F.array(sf_expr)).alias("_sf"))
    m = F.size("_fpa")
    wmin_expr = F.when(m >= w, F.transform(
        F.sequence(F.lit(0), m - F.lit(w)),
        lambda j: F.array_min(F.slice("_sf", j + 1, w)))) \
        .otherwise(F.array().cast("array<struct<fp:bigint,np:int>>"))
    d = d.select(id_col, "_fpa", "_sf",
                 F.explode(F.array(wmin_expr)).alias("_wm"))

    def selected(i):
        lo = F.greatest(F.lit(0), i - (w - 1))
        hi = F.least(i, m - F.lit(w))
        return F.exists(
            F.sequence(lo, hi),
            lambda j: F.element_at("_wm", j + 1)
            == F.element_at("_sf", i + 1))

    positions = F.when(m < w, F.sequence(F.lit(0), m - 1)) \
        .otherwise(F.filter(F.sequence(F.lit(0), m - 1), selected))
    pairs = F.transform(
        positions,
        lambda p: F.struct(p.alias("pos"),
                           F.element_at("_fpa", p + 1).alias("fp")))
    return (d.select(id_col, F.explode(pairs).alias("_s"))
            .select(id_col, F.col("_s.pos").alias("pos"),
                    F.col("_s.fp").alias("fp")))


def winnowed_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 50,
                          w: int = 8) -> DataFrame:
    """(id, pos, fp, _w) for the WINNOWED k-token windows of each doc.

    Winnowing (module docstring): a position is selected iff it is the
    rightmost minimum hash of some run of ``w`` consecutive window
    hashes; docs with fewer than ``w`` windows emit all their windows.
    This is the text-bearing API/testing surface — the text is derived
    for SELECTED windows only via :func:`_attach_window_text`;
    pipeline consumers use the internal light path directly.
    """
    light = _winnow_light(docs, id_col, text_col, k, w)
    return _attach_window_text(light, docs, id_col, text_col, k) \
        .select(id_col, "pos", "fp", "_w")


def _attach_window_text(light: DataFrame, docs: DataFrame, id_col: str,
                        text_col: str, k: int) -> DataFrame:
    """(id, pos, fp) rows + docs -> (id, pos, fp, _w): re-derive each
    selected window's text with ONE tokenize per involved doc
    (positions grouped per doc, transformed over a let-bound token
    array, re-exploded)."""
    sites = (light.groupBy(id_col)
             .agg(F.collect_list(F.struct(F.col("pos"), F.col("fp")))
                  .alias("_sites")))
    re = sites.join(docs.select(F.col(id_col), F.col(text_col)), id_col)
    re = re.select(id_col, "_sites",
                   F.explode(F.array(tokens_col(F.col(text_col))))
                   .alias("_ts"))
    rows = F.transform(
        "_sites",
        lambda s: F.struct(
            s.pos.alias("pos"), s.fp.alias("fp"),
            F.concat_ws(_SEP, F.slice("_ts", s.pos + 1, k)).alias("w")))
    return (re.select(id_col, F.explode(rows).alias("_s"))
            .select(id_col, F.col("_s.pos").alias("pos"),
                    F.col("_s.fp").alias("fp"),
                    F.col("_s.w").alias("_w")))


def _light_candidates(docs: DataFrame, id_col: str, text_col: str,
                      k: int, stride: int, winnow: int | None
                      ) -> DataFrame:
    if winnow is not None:
        return _winnow_light(docs, id_col, text_col, k, winnow)
    return window_fingerprints(docs, id_col, text_col, k, stride) \
        .select(id_col, "pos", "fp")


def duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 50,
                    stride: int = 25, winnow: int | None = None
                    ) -> DataFrame:
    """Spans of >= k tokens shared verbatim by >= 2 documents.

    Returns (fp, span_tokens, n_docs, n_sites, site_a, site_b) — one
    row per distinct duplicated window content, with the lexicographic
    min/max (doc, pos) sites as examples.

    Shuffle/compute discipline: the candidate (id, pos, fp) rows are
    computed ONCE and persisted (two consumers below); the hot-fp set
    (>= 2 distinct docs) is broadcast back as a semi-join filter; and
    window TEXT is derived only for the surviving rows, one tokenize
    per surviving doc.  The verify groupBy on (fp, window text) makes
    output spans exact, not probabilistic; example sites are algebraic
    min/max aggregates — no per-bucket lists, so a license header
    duplicated across the whole corpus is one cheap row, not a hub.
    The persisted candidates use Spark's default MEMORY_AND_DISK and
    are left for LRU eviction (repo precedent: emit_triples).
    """
    light = _light_candidates(docs, id_col, text_col, k, stride,
                              winnow).persist()
    hot = (light.groupBy("fp")
           .agg(F.countDistinct(id_col).alias("_nd"))
           .filter(F.col("_nd") >= 2)
           .select("fp"))
    surv = light.join(F.broadcast(hot), "fp", "left_semi")
    withtext = _attach_window_text(surv, docs, id_col, text_col, k)
    site = F.struct(F.col(id_col).alias("doc"), F.col("pos").alias("pos"))
    return (withtext
            .groupBy("fp", "_w")
            .agg(F.countDistinct(id_col).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_sites"),
                 F.min(site).alias("site_a"),
                 F.max(site).alias("site_b"))
            .filter(F.col("n_docs") >= 2)
            .withColumnRenamed("_w", "span_tokens"))


def span_dedup_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 50,
                     stride: int = 25,
                     winnow: int | None = None) -> DataFrame:
    """Per-document duplicated-window share: (id, n_windows, n_dup_windows).

    The curation signal from substring dedup: a doc whose windows are
    mostly duplicated elsewhere is boilerplate even if no single doc
    matches it — exactly the doc the doc-level funnels keep by mistake.
    Pure hash counting — window text never exists on this path.
    """
    light = _light_candidates(docs, id_col, text_col, k, stride,
                              winnow).persist()
    dup_fp = (light.groupBy("fp")
              .agg(F.countDistinct(id_col).alias("nd"))
              .filter(F.col("nd") >= 2)
              .select("fp"))
    flagged = (light.join(F.broadcast(dup_fp), "fp", "left_semi")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_dup_windows")))
    totals = light.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    return (totals.join(flagged, id_col, "left")
            .fillna(0, ["n_dup_windows"]))
