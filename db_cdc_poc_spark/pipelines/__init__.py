"""End-to-end pipelines assembled from the engine's operators."""

from db_cdc_poc_spark.pipelines.inventory import (
    build_inventory_pipeline,
    gold_current_inventory_sql,
)

__all__ = ["build_inventory_pipeline", "gold_current_inventory_sql"]
