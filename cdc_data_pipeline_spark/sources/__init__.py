from cdc_data_pipeline_spark.sources.readers import read_table, read_tables, TABLES
from cdc_data_pipeline_spark.sources.normalize import (
    drop_fields,
    flatten_structs,
    sanitize_keys,
    normalize_document_frame,
    infer_refined_schema,
)

__all__ = [
    "read_table",
    "read_tables",
    "TABLES",
    "drop_fields",
    "flatten_structs",
    "sanitize_keys",
    "normalize_document_frame",
    "infer_refined_schema",
]
