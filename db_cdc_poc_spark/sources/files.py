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
from pyspark.sql import functions as F
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


def read_json_permissive(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines scan that SURVIVES malformed rows instead of failing
    the job: PERMISSIVE mode parses what it can, nulls what it can't,
    and captures the raw text of unparseable lines in ``corrupt_col``.

    At 100 TB a fraction of bad records is a certainty, and the two
    failure postures Spark offers per-job — FAILFAST (one bad line
    kills a multi-hour job) or silent DROPMALFORMED — are both wrong
    for a pipeline: the right shape is parse-what-you-can plus an
    explicit quarantine stream (``split_corrupt``) that is counted,
    stored, and debuggable. The corrupt column must NOT be the only
    column referenced in a query (Spark requires a full-schema
    reference to materialize it; split_corrupt caches to respect
    that).
    """
    out_schema = schema
    if corrupt_col not in [f.name for f in schema.fields]:
        from pyspark.sql.types import StringType, StructField

        out_schema = StructType(
            [*schema.fields, StructField(corrupt_col, StringType())]
        )
    if isinstance(paths, str):
        paths = [paths]
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(list(paths), schema=out_schema)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a PERMISSIVE scan: clean rows lose the
    corrupt column; quarantine rows carry the raw line. The input is
    cached first — Spark refuses corrupt-only projections over the
    live scan, and the cache also keeps the two halves consistent
    across the double read."""
    df = df.cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw")
    )
    return clean, bad

