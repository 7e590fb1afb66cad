from kafka_delta_ingest_spark.sinks.delta_like import DeltaLikeTable

__all__ = ["DeltaLikeTable"]
