"""polar_spark — a PySpark-native link-graph analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of
cmu-sei/Polar (reference at /root/reference, cited by file:line in
docstrings) on idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, vectorized Arrow UDFs for the few things built-ins cannot
express, and Pregel-style join-aggregate iterations for the
link-graph layer (PageRank, connected components, label propagation,
triangle counting).

Layout
------
- ``session``      SparkSession factory tuned for the target scale
- ``sources``      deterministic synthetic source-code table + loaders
- ``functions``    scalar function parity layer (URL/registry/digest/purl)
- ``operators``    extraction, graph store (upsert algebra), dedup,
                   text analysis, similarity search, multimodal plumbing
- ``plans``        iterative engine (pregel driver + algorithms)
- ``streaming``    Structured Streaming ingestion parity
"""

__version__ = "0.1.0"
