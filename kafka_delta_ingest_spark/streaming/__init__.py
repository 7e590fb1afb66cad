from kafka_delta_ingest_spark.streaming.windows import (
    sessionize,
    windowed_counts,
)

__all__ = ["sessionize", "windowed_counts"]
