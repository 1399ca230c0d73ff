"""CDC apply edge semantics (SURVEY §7 step 2: the hardest correctness
surface — out-of-order sequences, delete-then-reinsert, ties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.cdc import apply_changes, latest_by_key

SCHEMA = "item_id int, store_id int, quantity int, op string, ts_ms long"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_latest_by_key_basic(spark):
    df = _rows(
        spark,
        [
            (1, 1, 10, "u", 100),
            (1, 1, 20, "u", 200),
            (2, 1, 5, "u", 150),
        ],
    )
    out = {
        (r.item_id, r.store_id): r.quantity
        for r in latest_by_key(df, ["item_id", "store_id"], "ts_ms").collect()
    }
    assert out == {(1, 1): 20, (2, 1): 5}


def test_latest_by_key_out_of_order_arrival(spark):
    # sequence order, not arrival/row order, decides the survivor
    df = _rows(
        spark,
        [
            (1, 1, 99, "u", 300),
            (1, 1, 10, "u", 100),
            (1, 1, 50, "u", 200),
        ],
    )
    [r] = latest_by_key(df, ["item_id", "store_id"], "ts_ms").collect()
    assert r.quantity == 99


def test_latest_by_key_tie_break_deterministic(spark):
    # equal ts_ms: tie_breakers decide, not arrival order
    df = _rows(
        spark,
        [
            (1, 1, 7, "u", 100),
            (1, 1, 3, "u", 100),
        ],
    )
    [r] = latest_by_key(
        df, ["item_id", "store_id"], "ts_ms", tie_breakers="quantity"
    ).collect()
    assert r.quantity == 7


def test_apply_changes_delete_removes_key(spark):
    df = _rows(
        spark,
        [
            (1, 1, 10, "u", 100),
            (1, 1, 0, "d", 200),
            (2, 1, 5, "u", 100),
        ],
    )
    out = apply_changes(
        df,
        keys=["item_id", "store_id"],
        sequence_by="ts_ms",
        apply_as_deletes="op = 'd'",
        except_columns=["op", "ts_ms"],
    )
    rows = out.collect()
    assert [(r.item_id, r.quantity) for r in rows] == [(2, 5)]
    assert out.columns == ["item_id", "store_id", "quantity"]


def test_apply_changes_delete_then_reinsert_keeps_reinsert(spark):
    # reference semantics (03_Ingestion.py:320-326): only the LATEST row
    # per key is consulted, so a reinsert after a delete survives
    df = _rows(
        spark,
        [
            (1, 1, 10, "u", 100),
            (1, 1, 0, "d", 200),
            (1, 1, 42, "u", 300),
        ],
    )
    [r] = apply_changes(
        df, keys=["item_id", "store_id"], sequence_by="ts_ms",
        apply_as_deletes="op = 'd'",
    ).collect()
    assert r.quantity == 42


def test_apply_changes_stale_delete_ignored(spark):
    # delete with an OLDER sequence than the live row must not delete
    df = _rows(
        spark,
        [
            (1, 1, 10, "u", 300),
            (1, 1, 0, "d", 200),
        ],
    )
    [r] = apply_changes(
        df, keys=["item_id", "store_id"], sequence_by="ts_ms",
        apply_as_deletes="op = 'd'",
    ).collect()
    assert r.quantity == 10


def test_latest_by_key_preserves_column_order(spark):
    df = _rows(spark, [(1, 1, 10, "u", 100)])
    assert latest_by_key(df, "item_id", "ts_ms").columns == df.columns


def test_latest_by_key_plan_is_aggregate_not_window(spark):
    # the scale contract: one shuffle via partial aggregate, no Window
    df = _rows(spark, [(1, 1, 10, "u", 100)])
    plan = latest_by_key(df, "item_id", "ts_ms")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan
