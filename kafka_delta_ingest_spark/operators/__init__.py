"""Large-scale data-pipeline operators (beyond the reference surface).

The reference is "pure message transformation only"
(reference doc/DESIGN.md:52); these modules add the operations a
training-data pipeline needs over the ingested tables — deduplication,
similarity search, text analysis, multimodal plumbing — each designed
for 100 TB partitioned execution (no driver-side loops, broadcast-able
small sides, bounded shuffles).
"""

from kafka_delta_ingest_spark.operators import dedup, similarity, text  # noqa: F401
