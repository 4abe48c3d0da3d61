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
2. slide a k-token window with stride s (``posexplode`` over
   ``sequence``-built offsets — no Python),
3. fingerprint each window (``xxhash64`` over the joined tokens),
4. ``groupBy`` fingerprint, keep buckets hit by >= 2 distinct docs,
5. verify by joining the actual window text back and equality-checking
   inside the bucket (hash collisions die here, not in the output).

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

At 100 TB the first shuffle carries (hash, doc, pos) rows — ~24
bytes/window — NOT the text; only surviving buckets ship their window
text for the verify join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col

__all__ = ["window_fingerprints", "winnowed_fingerprints",
           "duplicate_spans", "span_dedup_stats"]


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
    win = (toks
           .filter(n >= k)
           .select(id_col, F.explode(starts).alias("pos"), "_ts")
           .select(id_col, "pos",
                   F.concat_ws("\x1f", F.slice("_ts", F.col("pos") + 1,
                                               k)).alias("_w"))
           .select(id_col, "pos", F.xxhash64("_w").alias("fp"),
                   F.col("_w")))
    return win


def winnowed_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 50,
                          w: int = 8) -> DataFrame:
    """(id, pos, fp, _w) for the WINNOWED k-token windows of each doc.

    Winnowing (Schleimer et al. 2003): a window position is selected
    iff it is the rightmost minimum hash of some run of ``w``
    consecutive window hashes — equivalently, iff the ``a`` hashes
    immediately left are all >= it and the ``w-1-a`` immediately right
    are all strictly > it for some split ``a``.  Selection is a pure
    function of local content, so two documents sharing a span select
    the SAME fingerprints inside it: any shared span of
    >= k + w - 1 tokens is guaranteed to collide, at ~2/(w+1) of the
    stride-1 row volume.  Docs with fewer than ``w`` windows emit all
    their windows (no full run exists; they are tiny anyway).

    Implementation is one codegen pass per doc: the token array, the
    window-text array and the hash array are each let-bound through
    ``explode(array(...))`` (a Generate output cannot be re-inlined by
    Catalyst into every ``element_at`` — the gopher-stats lesson), and
    selection is a higher-order ``filter``/``exists`` over in-bounds
    slices.  Cost O(windows * w^2) comparisons per doc, w is small.
    """
    if k < 2:
        raise ValueError("window length k must be >= 2 tokens")
    if w < 1:
        raise ValueError("winnow run length w must be >= 1")
    toks = docs.select(
        F.col(id_col), F.explode(F.array(tokens_col(F.col(text_col))))
        .alias("_ts"))
    n = F.size("_ts")
    wa_expr = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws("\x1f", F.slice("_ts", i + 1, k)))
    step = (toks.filter(n >= k)
            .select(id_col, F.explode(F.array(wa_expr)).alias("_wa")))
    fpa_expr = F.transform("_wa", lambda x: F.xxhash64(x))
    step = step.select(id_col, "_wa",
                       F.explode(F.array(fpa_expr)).alias("_fpa"))
    m = F.size("_fpa")

    def fp_at(i):
        return F.element_at("_fpa", i + 1)

    def selected(i):
        def split_ok(a):
            left_ok = (a == 0) | (
                F.array_min(F.slice("_fpa", i - a + 1, a)) >= fp_at(i))
            right_len = F.lit(w) - 1 - a
            right_ok = (right_len == 0) | (
                F.array_min(F.slice("_fpa", i + 2, right_len)) > fp_at(i))
            return ((i - a >= 0) & (i - a + F.lit(w) <= m)
                    & left_ok & right_ok)
        return F.exists(F.sequence(F.lit(0), F.lit(w - 1)), split_ok)

    positions = F.when(m < w, F.sequence(F.lit(0), m - 1)) \
        .otherwise(F.filter(F.sequence(F.lit(0), m - 1), selected))
    pairs = F.transform(
        positions,
        lambda p: F.struct(p.alias("pos"), fp_at(p).alias("fp"),
                           F.element_at("_wa", p + 1).alias("w")))
    return (step.select(id_col, F.explode(pairs).alias("_s"))
            .select(id_col, F.col("_s.pos").alias("pos"),
                    F.col("_s.fp").alias("fp"),
                    F.col("_s.w").alias("_w")))


def duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 50,
                    stride: int = 25, winnow: int | None = None
                    ) -> DataFrame:
    """Spans of >= k tokens shared verbatim by >= 2 documents.

    Returns (fp, span_tokens, n_docs, n_sites, site_a, site_b) — one
    row per distinct duplicated window content, with the lexicographic
    min/max (doc, pos) sites as examples.

    Two-phase shuffle discipline: phase 1 aggregates (fp, id, pos) only
    — 8-byte hashes, never text — to find fingerprints hit by >= 2
    docs; that hot-fp set is tiny (it IS the duplication) and is
    broadcast back as a semi-join filter, so window text reaches the
    verify groupBy only for surviving windows.  The verify groups on
    (fp, window-text): a hash collision can only SPLIT a bucket, never
    merge two distinct spans, so output spans are exact, not
    probabilistic.  Example sites are algebraic min/max aggregates —
    no collect_list, so a license header duplicated across the whole
    corpus is one cheap row, not a hub.
    """
    if winnow is not None:
        win = winnowed_fingerprints(docs, id_col, text_col, k, winnow)
    else:
        win = window_fingerprints(docs, id_col, text_col, k, stride)
    hot = (win.groupBy("fp")
           .agg(F.countDistinct(id_col).alias("_nd"))
           .filter(F.col("_nd") >= 2)
           .select("fp"))
    site = F.struct(F.col(id_col).alias("doc"), F.col("pos").alias("pos"))
    return (win.join(F.broadcast(hot), "fp", "left_semi")
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
    """
    if winnow is not None:
        win = winnowed_fingerprints(docs, id_col, text_col, k, winnow)
    else:
        win = window_fingerprints(docs, id_col, text_col, k, stride)
    dup_fp = (win.groupBy("fp")
              .agg(F.countDistinct(id_col).alias("nd"))
              .filter(F.col("nd") >= 2)
              .select("fp"))
    flagged = (win.join(F.broadcast(dup_fp), "fp", "left_semi")
               .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup_windows")))
    totals = win.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    return (totals.join(flagged, id_col, "left")
            .fillna(0, ["n_dup_windows"]))
