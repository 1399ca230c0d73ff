"""End-to-end pipelines assembled from the engine's operators."""

from db_cdc_poc_spark.pipelines.inventory import build_inventory_pipeline

__all__ = ["build_inventory_pipeline"]
