"""Batch file scans with explicit schemas.

Mirrors the reference's CSV ingestion surface (S1/S2 in SURVEY.md §2.1;
reference: 02_Data_Generation.py:54-62,97-106; 03_Data_Ingestion.py:66-74,
95-103,121-129): header=True, declared StructType, explicit
timestampFormat. A list of paths is one DataFrame — Spark's multi-file
scan is the implicit UNION ALL the reference relies on for its two store
feeds.

Scale notes: CSV scans parallelize per-file/per-split;
``spark.sql.files.maxPartitionBytes`` bounds split size. Explicit schemas
avoid the inference pass. Column pruning + predicate pushdown reach the
parquet reader automatically when scans stay declarative.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType,
    header: bool = True,
    timestamp_format: str | None = None,
    sep: str = ",",
) -> DataFrame:
    """CSV scan with a declared schema (never inferSchema)."""
    reader = spark.read.options(header=str(header).lower(), sep=sep)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    if isinstance(paths, str):
        paths = [paths]
    return reader.csv(list(paths), schema=schema)


def read_parquet(spark: SparkSession, paths: str | Sequence[str]) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.parquet(*paths)
