"""kafka_delta_ingest_spark — a PySpark-native streaming ingest engine.

A from-scratch rebuild of the capabilities of delta-io/kafka-delta-ingest
(reference surveyed in SURVEY.md) on Spark Structured Streaming +
DataFrame API, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Nothing here is a port: the reference is a single-threaded Rust daemon;
this package declares the same dataflow as Catalyst logical plans and
lets Spark pick the physical execution.
"""

from kafka_delta_ingest_spark.session import get_spark
from kafka_delta_ingest_spark.config import IngestOptions
from kafka_delta_ingest_spark.ingest import IngestJob

__all__ = ["get_spark", "IngestOptions", "IngestJob"]
__version__ = "0.1.0"
