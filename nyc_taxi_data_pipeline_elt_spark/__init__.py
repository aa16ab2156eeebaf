"""A PySpark-native analytics engine with the query and data-processing
capabilities of ``jefferson-henrique-altoe/nyc-taxi-data-pipeline-elt``.

The reference is a serverless AWS ELT pipeline (landing -> consumer ->
reporting medallion over NYC TLC trip parquet; see SURVEY.md). This package
re-expresses its semantics as a self-contained, locally-runnable,
cluster-scalable Spark library:

- ``session``     SparkSession factory + oracle-safe runtime tuning
- ``schemas``     declared StructTypes for the reference table shapes
- ``sources``     scans/sinks: mergeSchema parquet, partitioned dynamic
                  overwrite, empty-schema writes, catalog sync, ingest
- ``operators``   schema conformance, data-quality rules + DLQ, dedup,
                  similarity search, text analysis, multimodal plumbing
- ``functions``   scalar helpers shared across plans
- ``plans``       the reference's Q1/Q2 reports + the extension query corpus
- ``streaming``   Structured Streaming windows/watermark over event streams
- ``pipeline``    the Step-Functions-equivalent in-process runner

Everything is the DataFrame/SQL API — no RDDs, no row-at-a-time Python UDFs
on any hot path — so Catalyst keeps pushdown/pruning/codegen and plans stay
valid from local[32] to a 1000-executor cluster.
"""

__version__ = "0.1.0"
