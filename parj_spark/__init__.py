"""parj_spark — a from-scratch PySpark-native knowledge-graph engine.

Re-expresses the capabilities of the dbilid/PARJ reference engine
(an in-memory single-node SPARQL BGP engine, see /root/reference)
as an idiomatic Spark pipeline:

- ``parj_spark.fixtures``   — deterministic interleaved text+media document
  generator with embedded ground-truth KG (the BASELINE input_hint shape).
- ``parj_spark.construct``  — docs → mentions → linked entities → union-find
  canonicalization → dictionary encoding → SPO/POS/OSP materialization.
- ``parj_spark.query``      — BGP (basic-graph-pattern) multi-way join builder
  over the materialized permutation tables (PARJ's live query surface,
  SURVEY.md §2.3 J1/J4).
- ``parj_spark.operators``  — training-data-pipeline operators: dedup
  (exact/MinHash-LSH/SimHash/Jaccard), similarity search, text analysis,
  multimodal plumbing.

Everything is DataFrame-first: Catalyst plans the joins, AQE handles skew,
pandas/Arrow UDFs are used only where built-ins cannot express the semantics
(batched mention detection per BASELINE input_hint).
"""

__version__ = "0.1.0"
