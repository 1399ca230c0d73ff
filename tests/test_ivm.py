"""Incremental view maintenance: delta rules vs full recompute across
insert/update/delete batches, delete-to-zero group removal, cost shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.ivm import cdc_deltas, delta_aggregate

SCHEMA = (
    "op string, "
    "before struct<k:string, v:long>, "
    "after struct<k:string, v:long>"
)


def _agg(df):
    return df.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").cast("long").alias("v")
    )


def _rows(df):
    return {(r.k, r.n, r.v) for r in df.collect()}


def test_delta_rules_match_recompute(spark):
    t0 = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("c", 7)], "k string, v long"
    )
    base = _agg(t0)
    # update a:10->11, delete b:5, insert d:100, insert a:1
    changes = spark.createDataFrame(
        [
            ("u", ("a", 10), ("a", 11)),
            ("d", ("b", 5), None),
            ("c", None, ("d", 100)),
            ("c", None, ("a", 1)),
        ],
        SCHEMA,
    )
    t1 = spark.createDataFrame(
        [("a", 11), ("a", 20), ("a", 1), ("c", 7), ("d", 100)], "k string, v long"
    )
    got = delta_aggregate(base, changes, keys=["k"], measures=["v"])
    assert _rows(got) == _rows(_agg(t1))


def test_delete_to_zero_removes_group(spark):
    base = _agg(spark.createDataFrame([("a", 10), ("b", 5)], "k string, v long"))
    changes = spark.createDataFrame([("d", ("b", 5), None)], SCHEMA)
    got = delta_aggregate(base, changes, keys=["k"], measures=["v"])
    assert _rows(got) == {("a", 1, 10)}


def test_snapshot_read_op_counts_as_insert(spark):
    base = _agg(spark.createDataFrame([("a", 1)], "k string, v long"))
    changes = spark.createDataFrame([("r", None, ("a", 2))], SCHEMA)
    got = delta_aggregate(base, changes, keys=["k"], measures=["v"])
    assert _rows(got) == {("a", 2, 3)}


def test_cdc_deltas_signs(spark):
    changes = spark.createDataFrame(
        [("c", None, ("a", 1)), ("u", ("a", 1), ("a", 2)), ("d", ("a", 2), None)],
        SCHEMA,
    )
    rows = sorted(
        (r.sign, r.v) for r in cdc_deltas(changes, ["k"], ["v"]).collect()
    )
    # +1 insert, (+1,-1) update pair, -1 delete
    assert rows == [(-1, 1), (-1, 2), (1, 1), (1, 2)]


def test_batches_compose(spark):
    # applying two batches sequentially == applying their union
    t0 = spark.createDataFrame([("a", 3), ("b", 4)], "k string, v long")
    b1 = spark.createDataFrame([("c", None, ("a", 5))], SCHEMA)
    b2 = spark.createDataFrame([("u", ("b", 4), ("b", 6))], SCHEMA)
    seq = delta_aggregate(
        delta_aggregate(_agg(t0), b1, ["k"], ["v"]), b2, ["k"], ["v"]
    )
    both = delta_aggregate(_agg(t0), b1.unionByName(b2), ["k"], ["v"])
    assert _rows(seq) == _rows(both)
