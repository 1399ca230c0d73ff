"""Python Data Source API surface (sources/pydatasource.py): the
pure-Python custom batch source registers, partitions, and produces
exactly the deterministic rows its formula declares."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_cdc_poc_spark.sources import pydatasource


def _read(spark, n_rows: int, partitions: int):
    pydatasource.register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n_rows", n_rows)
        .option("partitions", partitions)
        .load()
    )


def test_rows_match_formula_exactly(spark):
    got = sorted(
        tuple(r) for r in _read(spark, 100, 4).collect()
    )
    want = sorted(pydatasource.synth_row(i) for i in range(100))
    assert got == want


def test_partitioning_is_real_and_invariant(spark):
    # the read fans out across InputPartitions...
    df = _read(spark, 1000, 7)
    assert df.rdd.getNumPartitions() == 7
    # ...and the result set does not depend on the partition count
    a = sorted(tuple(r) for r in _read(spark, 1000, 7).collect())
    b = sorted(tuple(r) for r in _read(spark, 1000, 2).collect())
    assert a == b


def test_aggregates_push_into_source_plan(spark):
    df = _read(spark, 1000, 4).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = {r.event_type: r.n for r in df.collect()}
    assert out == {"click": 250, "view": 250, "purchase": 250, "refund": 250}
