"""Deterministic synthetic corpus generators (seeded, no external data).

Every generator is a pure function of (index, params) so the same corpus
can be built single-threaded for pytest and distributed via
``spark.range(n).mapInPandas`` for bench — identical bytes either way.
"""
