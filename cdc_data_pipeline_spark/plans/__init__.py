from cdc_data_pipeline_spark.plans.registry import ModelRegistry
from cdc_data_pipeline_spark.plans import models

__all__ = ["ModelRegistry", "models"]
