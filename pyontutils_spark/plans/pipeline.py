"""End-to-end triple factory: pages -> text -> mentions -> links -> triples.

The Spark instantiation of the reference's build pipeline
(``Ont`` lifecycle: sources -> triple generators -> validate -> write,
``pyontutils/core.py:1183-1346, 1496-1541``), shaped for 10^12 pages:

- one linear DAG, no driver-side loops over data
- all joins broadcast (lexicon/candidates are the small side)
- set semantics via distinct (map-side partial aggregation)
- deterministic output independent of partitioning
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..operators import emit, linking, mentions as mention_ops
from ..operators.extract import with_extracted_text


@dataclass
class TripleFactoryResult:
    pages_with_text: DataFrame
    mentions: DataFrame
    linked: DataFrame
    triples: DataFrame


def run_triple_factory(spark: SparkSession, pages: DataFrame,
                       lexicon: list[dict], min_length: int = 3,
                       lang_filter: str | None = "en") -> TripleFactoryResult:
    # pages_with_text is exposed for inspection/tests; the triples DAG
    # does NOT depend on it — the fused mention stage extracts inside the
    # same Python pass (one Arrow round-trip instead of three).
    withtext = with_extracted_text(pages)
    ac_bc = mention_ops.broadcast_automaton(spark, lexicon, min_length)
    # offset-bearing mention view (the annotate contract) — exposed for
    # inspection/tests; lazy, so it only executes if consumed
    ments = mention_ops.detect_mentions_fused(pages, ac_bc,
                                              lang_filter=lang_filter)
    # the triples DAG consumes only (url, pattern_norm): use the hybrid
    # stage — pre-extracted rows match in pure JVM (whole-stage codegen,
    # no Python), html rows extract+match in one fused Arrow pass
    ments_for_link = mention_ops.detect_mentions_hybrid(
        pages, lexicon, ac_bc, lang_filter=lang_filter,
        min_length=min_length)
    cands = linking.candidates_df(spark, lexicon, min_length, best_only=True)
    linked = linking.link_mentions(ments_for_link, cands)
    # raw pages (url only) for the page-type triples — the extraction UDF
    # must not run for them; linked is persisted inside emit_triples.
    triples = emit.emit_triples(spark, pages, linked, lexicon)
    return TripleFactoryResult(withtext, ments, linked, triples)


def canonicalize_triples(triples):
    """Entity-canonicalization pass over factory output: sameAs candidate
    edges from duplicate rdfs:label values, connected components, rewrite
    every triple through (iri -> natsort-min canonical), emit owl:sameAs
    provenance — the reference's synonym/label collapsing
    (get_label2rows interlex_sql.py:271-282 + switchURIs/swapUriSwitch
    ontutils.py:71-91, 521-583) as one declarative pass."""
    from pyspark.sql import functions as F

    from ..operators import vocab
    from ..operators.components import (
        canonical_mapping, rewrite_triples, sameas_candidates_from_lexicon)

    labels = (triples.filter(F.col("pred") == vocab.RDFS_LABEL)
              .select(F.col("subj").alias("iri"),
                      F.lower(F.trim("obj")).alias("label_norm"))
              .distinct())
    edges = sameas_candidates_from_lexicon(labels)
    mapping = canonical_mapping(edges)
    return rewrite_triples(triples, mapping)
