"""cdc_data_pipeline_spark — a PySpark-native CDC/ELT analytics engine.

Re-expresses the capability surface of the reference CDC pipeline
(MongoDB/Postgres -> staging -> ClickHouse -> dbt star schema) as an
idiomatic Spark engine:

- ``sources``    : batch/stream readers + row-normalization ops
- ``functions``  : scalar/text/vector column expression helpers
- ``operators``  : incremental merges (full/upsert/upsert_dedup/snapshot),
                   SCD Type 2, dedup (exact/minhash/simhash/jaccard),
                   similarity search, data-quality assertions, multimodal
- ``plans``      : model registry + topological pipeline execution
- ``streaming``  : Structured Streaming wrappers (foreachBatch CDC merges,
                   windowed aggregations with watermarks)

Everything is expressed through the DataFrame API / Spark SQL so Catalyst
handles pushdown, pruning, join selection and codegen; Python UDFs are
avoided in hot paths (Pandas UDFs only where built-ins cannot express the
semantics, e.g. multimodal decode).
"""

from cdc_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
