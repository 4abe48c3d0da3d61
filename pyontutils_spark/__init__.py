"""pyontutils_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of ``memartone/pyontutils``.

The reference is a single-node rdflib toolkit; this engine re-expresses the
same computations (CURIE/prefix management, label→IRI resolution, mention
detection, triple emission, synonym/label collapsing, deterministic
serialization ordering) as idiomatic Spark DataFrame pipelines designed for
~100 TB Common-Crawl-style corpora.

Layout:
  kernel/     pure-Python, broadcast-safe primitives (no Spark imports)
  synth/      deterministic synthetic corpus generators (tests + bench)
  operators/  DataFrame-level operators (extract, mentions, link, emit, ...)
  plans/      end-to-end pipelines with lineage/metrics
  streaming/  Structured Streaming variants
"""

__version__ = "0.1.0"
