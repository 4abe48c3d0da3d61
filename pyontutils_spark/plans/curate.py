"""End-to-end corpus curation — the standard pretraining-data funnel
composed from this engine's operators as ONE declarative plan:

1. canonical-URL collapse (``filters.url_dedup_groups`` semantics —
   tracking-param/userinfo/fragment variants of one page keep a single
   representative row),
2. exact-content dedup (md5 digest groupBy, min-id representative),
3. near-dup clustering (MinHash-LSH star edges -> hub-safe connected
   components -> keep each cluster's min id — the
   ``dedup_clusters`` composition),
4. quality gate (Gopher-style rules: token count, mean word length,
   top-bigram repetition share),
5. reproducible stratified sampling (content-hash threshold — stable
   under any partitioning, monotone under rate increases).

Every stage is a semi/anti-join or hash aggregate — no windows over
the corpus, no driver-side loops, no forced broadcasts; each stage
shrinks the surviving set, so downstream stages touch less data.  At
100 TB the funnel order matters: URL + exact dedup (cheap codegen
hashing) run before the MinHash stage so the expensive signature pass
sees only content-distinct documents.

The optional per-stage report executes one count per retained stage
boundary (5 small jobs over already-pruned data) — skip it
(``report=False``) inside larger DAGs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..operators.components import connected_components_ids
from ..operators.dedup import exact_dedup_groups, lsh_bucket_star_edges
from ..operators.filters import normalize_url_col
from ..operators.sampling import hash_sample
from ..operators.textstats import gopher_quality_flags

__all__ = ["curate_corpus", "CurationResult"]


@dataclass
class CurationResult:
    docs: DataFrame
    counts: dict = field(default_factory=dict)
    # every stage boundary as a (name, surviving-docs DataFrame) pair —
    # lazy plans (no extra jobs); lets callers audit/oracle the funnel
    # per stage instead of only its final output
    stages: list = field(default_factory=list)


def _keep_url_representatives(docs: DataFrame, id_col: str,
                              url_col: str) -> DataFrame:
    # A null url (or a url the normalizer cannot parse -> null) must NOT
    # collapse with every other null into one group — that would keep a
    # single document for the whole null stratum.  Group such rows on a
    # per-id sentinel key instead, so they all survive this stage and
    # fall through to content-based dedup.
    cu = normalize_url_col(F.col(url_col))
    key = F.coalesce(cu, F.concat(F.lit("\x00nourl\x00"),
                                  F.col(id_col).cast("string")))
    reps = (docs
            .select(key.alias("cu"), F.col(id_col))
            .groupBy("cu").agg(F.min(id_col).alias(id_col))
            .select(id_col))
    return docs.join(reps, id_col, "left_semi")


def _keep_exact_representatives(docs: DataFrame, id_col: str,
                                text_col: str) -> DataFrame:
    reps = (exact_dedup_groups(docs, id_col, text_col)
            .select(F.col("representative").alias(id_col)))
    return docs.join(reps, id_col, "left_semi")


def _drop_near_dups(docs: DataFrame, id_col: str, text_col: str,
                    k: int, bands: int) -> DataFrame:
    edges = lsh_bucket_star_edges(docs, id_col, text_col, k=k,
                                  bands=bands)
    comp = connected_components_ids(
        edges.select(F.col("u"), F.col("v")))
    losers = (comp.filter(F.col("node") != F.col("component"))
              .select(F.col("node").alias(id_col)))
    return docs.join(losers, id_col, "left_anti")


def curate_corpus(docs: DataFrame, id_col: str = "doc_id",
                  url_col: str | None = "url",
                  text_col: str = "text",
                  lang_col: str | None = "lang",
                  lsh_k: int = 16, lsh_bands: int = 4,
                  quality_kwargs: dict | None = None,
                  sample_num: int | None = None,
                  sample_den: int = 100,
                  sample_rates: dict | None = None,
                  sample_salt: str = "curate",
                  robots: DataFrame | None = None,
                  robots_user_agent: str = "pyontutils-spark",
                  span_winnow: int | None = None,
                  span_k: int = 50,
                  max_dup_window_share: float = 0.5,
                  report: bool = True) -> CurationResult:
    """Run the curation funnel (module docstring) over
    ``docs(id, [url], text, [lang])`` and return the surviving rows
    plus (optionally) per-stage surviving counts.

    Near-dup clustering keys on LSH bucket connectivity (cluster min
    id survives); pass ``sample_num`` (and optionally per-``lang_col``
    ``sample_rates``) to finish with the reproducible hash sample, or
    leave it None to keep every survivor.  IDs must be stable content
    ids — every stage's keep-decision is a pure function of
    (id, content), so re-running over a grown corpus never flips an
    old decision except through genuinely new duplicate clusters."""
    counts: dict = {}
    stages: list = []

    def note(name: str, df: DataFrame) -> DataFrame:
        stages.append((name, df))
        if report:
            counts[name] = df.count()
        return df

    cur = note("input", docs)
    if robots is not None:
        if url_col is None or url_col not in docs.columns:
            raise ValueError("robots admission needs a url column")
        from ..operators.crawl import robots_filter
        cur = note("robots", robots_filter(
            cur, robots, robots_user_agent, url_col=url_col))
    if url_col is not None and url_col in docs.columns:
        cur = note("url_dedup",
                   _keep_url_representatives(cur, id_col, url_col))
    cur = note("exact_dedup",
               _keep_exact_representatives(cur, id_col, text_col))
    cur = note("near_dedup",
               _drop_near_dups(cur, id_col, text_col, lsh_k, lsh_bands))
    if span_winnow is not None:
        # substring-level gate: drop docs that are mostly duplicated
        # windows even if no whole-doc near-dup matched them (license
        # walls, boilerplate shells).  Docs shorter than span_k tokens
        # have no stats row and pass through.  Like near-dedup, the
        # keep-decision is corpus-relative by nature.
        from ..operators.spandedup import span_dedup_stats
        stats = span_dedup_stats(cur, id_col, text_col, k=span_k,
                                 winnow=span_winnow)
        joined = cur.join(stats, id_col, "left")
        cur = note("span_dedup", joined.filter(
            F.col("n_windows").isNull()
            | (F.col("n_dup_windows")
               <= F.col("n_windows") * F.lit(max_dup_window_share)))
            .select(*cur.columns))
    flags = gopher_quality_flags(cur, id_col, text_col,
                                 **(quality_kwargs or {}))
    keep_ids = flags.filter(F.col("keep")).select(
        F.col("id").alias(id_col))
    cur = note("quality", cur.join(keep_ids, id_col, "left_semi"))
    if sample_num is not None:
        cur = note("sample", hash_sample(
            cur, id_col, sample_num, den=sample_den, salt=sample_salt,
            rates=sample_rates,
            stratum_col=lang_col if sample_rates else None))
    return CurationResult(docs=cur, counts=counts, stages=stages)
