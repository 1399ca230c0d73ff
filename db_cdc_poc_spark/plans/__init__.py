"""Pipeline plumbing: the mini-DLT table registry (declare -> resolve ->
topological build -> materialize)."""

from db_cdc_poc_spark.plans.registry import TableRegistry

__all__ = ["TableRegistry"]
