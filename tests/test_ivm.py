"""Incremental view maintenance: delta rules vs full recompute across
insert/update/delete batches, delete-to-zero group removal, cost shape."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from db_cdc_poc_spark.operators.ivm import (
    cdc_deltas,
    delta_aggregate,
    delta_minmax,
)

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


# -- min/max with delete rescan ---------------------------------------------


def _mm_agg(df):
    return df.groupBy("k").agg(
        F.count("*").alias("n"),
        F.min("v").cast("long").alias("lo"),
        F.max("v").cast("long").alias("hi"),
    )


MM_SCHEMA = (
    "op string, "
    "before struct<k:string, lo:long, hi:long>, "
    "after struct<k:string, lo:long, hi:long>"
)


def _mm_rows(df):
    return {(r.k, r.n, r.lo, r.hi) for r in df.collect()}


def _apply_mm(spark, t0_rows, change_rows):
    """Run delta_minmax for a (k, v) fact table storing min as lo and
    max as hi, and return (incremental result, recompute result)."""
    t0 = spark.createDataFrame(t0_rows, "k string, v long")
    base = _mm_agg(t0)
    changes = spark.createDataFrame(
        [(op, b and (b[0], b[1], b[1]), a and (a[0], a[1], a[1]))
         for op, b, a in change_rows],
        MM_SCHEMA,
    )
    # post-batch facts: apply inserts/deletes/updates to the rows
    rows = list(t0_rows)
    for op, b, a in change_rows:
        if op in ("c", "r"):
            rows.append(a)
        elif op == "d":
            rows.remove(b)
        elif op == "u":
            rows.remove(b)
            rows.append(a)
    t1 = spark.createDataFrame(rows, "k string, v long") if rows else t0.limit(0)
    facts = t1.select("k", F.col("v").alias("lo"), F.col("v").alias("hi"))
    got = delta_minmax(
        base, changes, facts, keys=["k"], min_cols=["lo"], max_cols=["hi"]
    )
    return got, _mm_agg(t1).select("k", "n", "lo", "hi")


def test_minmax_insert_only_merges_without_rescan(spark):
    got, want = _apply_mm(
        spark,
        [("a", 10), ("a", 20), ("b", 5)],
        [("c", None, ("a", 1)), ("c", None, ("a", 30)), ("c", None, ("z", 7))],
    )
    assert _mm_rows(got) == _mm_rows(want)


def test_minmax_delete_of_current_extreme_rescans(spark):
    # delete a's max (20) and b's min (5, its only row's value twin 6
    # stays) — both extremes must come back from the fact rescan
    got, want = _apply_mm(
        spark,
        [("a", 10), ("a", 20), ("a", 15), ("b", 5), ("b", 6)],
        [("d", ("a", 20), None), ("d", ("b", 5), None)],
    )
    assert _mm_rows(got) == _mm_rows(want)
    assert _mm_rows(got) == {("a", 2, 10, 15), ("b", 1, 6, 6)}


def test_minmax_delete_nonextreme_no_change(spark):
    got, want = _apply_mm(
        spark,
        [("a", 10), ("a", 20), ("a", 15)],
        [("d", ("a", 15), None)],
    )
    assert _mm_rows(got) == _mm_rows(want)
    assert _mm_rows(got) == {("a", 2, 10, 20)}


def test_minmax_update_moves_extreme(spark):
    # update retracts the current max and inserts a new non-extreme
    got, want = _apply_mm(
        spark,
        [("a", 10), ("a", 20)],
        [("u", ("a", 20), ("a", 12))],
    )
    assert _mm_rows(got) == _mm_rows(want)
    assert _mm_rows(got) == {("a", 2, 10, 12)}


def test_minmax_delete_to_zero_removes_group(spark):
    got, want = _apply_mm(
        spark,
        [("a", 10), ("b", 5)],
        [("d", ("b", 5), None)],
    )
    assert _mm_rows(got) == _mm_rows(want)
    assert _mm_rows(got) == {("a", 1, 10, 10)}


def test_minmax_duplicate_extreme_survives_single_delete(spark):
    # two rows share the max; deleting one must keep it (rescan finds
    # the surviving twin)
    got, want = _apply_mm(
        spark,
        [("a", 10), ("a", 20), ("a", 20)],
        [("d", ("a", 20), None)],
    )
    assert _mm_rows(got) == _mm_rows(want)
    assert _mm_rows(got) == {("a", 2, 10, 20)}


def test_minmax_insert_delete_same_key_nets_out(spark):
    # brand-new key inserted and deleted within one batch: no group
    got, want = _apply_mm(
        spark,
        [("a", 10)],
        [("c", None, ("z", 7)), ("d", ("z", 7), None)],
    )
    assert _mm_rows(got) == _mm_rows(want)
    assert _mm_rows(got) == {("a", 1, 10, 10)}


def test_minmax_overlapping_min_max_col_raises(spark):
    base = spark.createDataFrame([("a", 1, 5)], "k string, n long, v long")
    changes = spark.createDataFrame([], SCHEMA)
    facts = spark.createDataFrame([("a", 5)], "k string, v long")
    with pytest.raises(ValueError, match="both min and max"):
        delta_minmax(
            base, changes, facts, keys=["k"], min_cols=["v"], max_cols=["v"]
        )
