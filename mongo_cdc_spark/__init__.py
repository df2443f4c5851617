"""mongo_cdc_spark — a PySpark-native engine with the query and
data-processing capabilities of the reference CDC relay
(wirelessr/mongo-cdc, /root/reference/main.go), re-expressed Spark-first.

Layout:
  cdc/        — the reference's entire surface: change-event envelope schema,
                PERMISSIVE parse with skip-on-error, dynamic topic routing,
                Kafka Connect key envelope, canonical Extended JSON, Kafka sink.
  operators/  — the analytical surface (SURVEY.md §2.2/§2.3): relational
                queries, joins, windows, set ops, dedup, similarity search,
                text analysis, multimodal plumbing.
  streaming/  — Structured Streaming: watermarked windows, streaming dedup,
                stateful ops (applyInPandasWithState).
"""

__version__ = "0.1.0"

from mongo_cdc_spark.session import get_spark  # noqa: F401
