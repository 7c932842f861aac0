"""strawboat_spark — a PySpark-native analytics engine with the
capabilities of sundy-li/strawboat (columnar storage format +
Spark-first query surface + LLM-data-pipeline operators).

Layout:
  sources/    the strawboat columnar file format (pyarrow page codecs,
              footer, adaptive compression) + Spark Python DataSource
  operators/  relational operators Spark lacks as built-ins
              (as-of join, top-k, dedup, similarity search)
  functions/  column-level function libraries (text analysis, vectors)
  plans/      plan introspection / explain helpers
  streaming/  Structured Streaming pipelines over the events table
"""

from strawboat_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
