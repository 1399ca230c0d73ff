"""Sources & sinks: batch CSV/parquet scans, file-based streaming sources,
and (optionally, when a broker/package is configured) Kafka."""

from db_cdc_poc_spark.sources.files import read_csv, read_parquet
from db_cdc_poc_spark.sources.testdata import TABLES, load_table, register_views

__all__ = ["read_csv", "read_parquet", "load_table", "register_views", "TABLES"]
