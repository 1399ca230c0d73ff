"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

The testdata is pandas-written parquet with nanosecond TIMESTAMP
columns, which Spark has no type for: with
``spark.sql.legacy.parquet.nanosAsLong`` (set in session.RUNTIME_CONFS)
they scan as LongType nanoseconds. ``load_table`` restores proper
TimestampType via floor-division to micros — the same truncation DuckDB
applies when it reads the file, so oracle comparisons see identical
values.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_columns(path: str) -> tuple[str, ...]:
    """Names of timestamp[ns] columns in a parquet file's footer."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    schema = pq.read_schema(path)
    return tuple(
        f.name for f in schema if pt.is_timestamp(f.type) and f.type.unit == "ns"
    )


#: Tables whose downstream operators are expression-heavy per row
#: (shingling, norms) and benefit from splitting a one-row-group file,
#: mapped to their id column: the spread hash-partitions on the id so
#: any downstream join/agg keyed on it reuses the partitioning
#: (HashPartitioning satisfies ClusteredDistribution — no second
#: Exchange), while paths that shuffle on other keys (shingle, band)
#: pay the same one shuffle they would under a round-robin spread.
_EXPRESSION_HEAVY = {"documents": "doc_id", "embeddings": "vec_id"}


#: Built-DataFrame cache keyed on (session, path, file stat). A
#: DataFrame is an immutable PLAN — nothing here persists data or
#: results: every action on a cached frame recomputes from the parquet
#: files. What the cache skips is the per-call driver work of
#: ``spark.read.parquet`` (file listing + footer schema inference — a
#: visible ~50 ms "parquet at ..." job at the head of every query) and
#: the expression rebuild, which the bench pays once per measured pass
#: per table otherwise. Keyed on mtime+size so a regenerated file
#: invalidates.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    key = None
    try:
        st = os.stat(path)
        key = (spark.sparkContext.applicationId, path, st.st_mtime_ns, st.st_size)
    except OSError:
        pass
    if key is not None and key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    df = spark.read.parquet(path)
    for col in _nanos_columns(path):
        # ns -> µs truncation (floor), matching DuckDB's conversion.
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if name in _EXPRESSION_HEAVY:
        # A single-row-group parquet file scans as ONE task, so every
        # per-row HOF chain (8-gram shingles, vector norms) serializes
        # on one core. Spread it — measured ~2x on the doc-heavy
        # headline queries at sf0.1. Gated on the narrow-scan case
        # only: at real scale inputs arrive pre-split and an
        # unconditional repartition would be a full-corpus shuffle.
        # Width comes from the LOGICAL plan (file sizes vs
        # maxPartitionBytes, partitioning.estimated_scan_width) — the
        # previous ``df.rdd.getNumPartitions()`` probe forced full
        # physical planning on EVERY load of these tables, a fixed
        # driver cost paid once per query call (ADVICE r11 flagged the
        # same probe in spread_scan; this was the remaining site).
        from db_cdc_poc_spark.partitioning import estimated_scan_width

        width = estimated_scan_width(df)
        if width is not None and width == 1:
            df = df.repartition(
                spark.sparkContext.defaultParallelism,
                F.col(_EXPRESSION_HEAVY[name]),
            )
    if key is not None:
        _TABLE_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
