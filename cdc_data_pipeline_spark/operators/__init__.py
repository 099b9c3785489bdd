from cdc_data_pipeline_spark.operators.incremental import (
    get_watermark,
    full_load,
    upsert,
    upsert_dedup,
    latest_per_key,
    snapshot_load,
)
from cdc_data_pipeline_spark.operators.scd2 import scd2_merge, scd2_current

__all__ = [
    "get_watermark",
    "full_load",
    "upsert",
    "upsert_dedup",
    "latest_per_key",
    "snapshot_load",
    "scd2_merge",
    "scd2_current",
]
