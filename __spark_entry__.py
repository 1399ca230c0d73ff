"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real registry lives in ``db_cdc_poc_spark.queries`` — one entry
per operator family from SURVEY.md §2 plus the LLM-data-pipeline
extensions (fuzzy dedup, similarity search, text analysis, multimodal
plumbing, streaming dedup/CDC).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from db_cdc_poc_spark import queries as Q  # noqa: E402
from db_cdc_poc_spark.session import apply_runtime_confs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the gold current-state aggregate
    (snapshot LEFT JOIN post-snapshot changes — the reference's
    04_Current_Inventory.sql shape re-expressed over testdata)."""
    apply_runtime_confs(spark)
    return Q.q11_current_state(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in Q.registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; entries without SQL-expressible
    semantics (xxhash64-based LSH internals) are omitted -> the driver
    records a rows-only check for those."""
    return {name: q.oracle for name, q in Q.registry().items() if q.oracle is not None}
