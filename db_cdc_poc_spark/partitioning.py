"""Scan-width repair for heavy fan-out stages.

The engine's hottest operators multiply per-row work by a large factor
inside the SAME stage as the scan that feeds them — a shingle explode
turns 73 MB of documents into gigabytes of (id, gram) rows, a
broadcast-codebook pass evaluates nlist cosines per vector. Spark
sizes that stage's parallelism from the SCAN (file splits, bounded by
parquet row groups), not from the work: at sf10 the documents table is
one 73 MB file with 3 row groups, so the entire corpus tokenization
runs on <= 3 of 32 cores — the measured dominant cost of the sf10
text-pipeline profile (SCALING.md round-11 entry; the same defect cost
q147 12x on the vector side).

``spread_scan`` repartitions a DataFrame up to the session's default
parallelism when its current plan yields fewer partitions. The
round-robin exchange moves only the INPUT bytes (trivial next to the
fan-out's output) and is a no-op on a real cluster whose scans already
exceed core count — which is exactly the 100 TB posture: files there
split into thousands of tasks, and this guard never fires.

Apply it where a stage's work-per-row is large (explodes, broadcast
fan-outs), NOT as a blanket scan wrapper — a plain filter/projection
scan is better off with Spark's own split sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff its
    current partitioning is narrower. Result-identical: every consumer
    downstream is key-based (joins/aggregations) or order-normalized."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
