from cdc_data_pipeline_spark.functions import scalars, text, vectors

__all__ = ["scalars", "text", "vectors"]
