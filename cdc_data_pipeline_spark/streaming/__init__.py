from cdc_data_pipeline_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_windows,
)
from cdc_data_pipeline_spark.streaming.cdc import stream_upsert_to_parquet

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "stream_upsert_to_parquet",
]
