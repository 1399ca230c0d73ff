"""MERGE INTO and SCD Type 2: clause semantics on hand-built frames,
type-1/type-2 consistency, duplicate-source validation, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.cdc import apply_changes, apply_changes_scd2
from db_cdc_poc_spark.operators.merge import merge_into


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (3, "c", 300)],
        "k long, name string, bal long",
    )


def _source(spark):
    # k=1 update, k=2 delete, k=9 insert, k=3 untouched (absent)
    return spark.createDataFrame(
        [(1, 50, False), (2, 0, True), (9, 999, False)],
        "k long, delta long, churn boolean",
    )


def test_merge_all_three_clauses(spark):
    out = merge_into(
        _target(spark),
        _source(spark),
        on="k",
        matched_update={"bal": "t.bal + s.delta"},
        matched_delete="s.churn",
        not_matched_insert={"name": "'new'", "bal": "s.delta"},
    )
    rows = {r.k: (r.name, r.bal) for r in out.collect()}
    assert rows == {1: ("a", 150), 3: ("c", 300), 9: ("new", 999)}


def test_merge_update_only_and_no_insert(spark):
    out = merge_into(
        _target(spark),
        _source(spark),
        on="k",
        matched_update={"bal": "s.delta"},
    )
    rows = {r.k: r.bal for r in out.collect()}
    # no delete clause: k=2 stays (updated); no insert: k=9 dropped
    assert rows == {1: 50, 2: 0, 3: 300}


def test_merge_insert_true_copies_by_name(spark):
    src = spark.createDataFrame([(9, "z", 9)], "k long, name string, bal long")
    out = merge_into(_target(spark), src, on="k", not_matched_insert=True)
    rows = {r.k: (r.name, r.bal) for r in out.collect()}
    assert rows[9] == ("z", 9) and len(rows) == 4


def test_merge_validate_unique_raises(spark):
    dup = spark.createDataFrame([(1, 1, False), (1, 2, False)], "k long, delta long, churn boolean")
    with pytest.raises(ValueError, match="duplicate"):
        merge_into(_target(spark), dup, on="k", validate_unique=True)


def test_merge_single_join_no_cartesian(spark):
    plan = (
        merge_into(_target(spark), _source(spark), on="k", not_matched_insert=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert plan.count("Join") >= 1


def _changelog(spark):
    # key 1: insert@1, update@3, delete@5, reinsert@7 (current)
    # key 2: insert@2 (current)   key 3: insert@1, delete@2 (gone)
    return spark.createDataFrame(
        [
            (1, "v1", 1, "u"),
            (1, "v2", 3, "u"),
            (1, None, 5, "d"),
            (1, "v3", 7, "u"),
            (2, "w1", 2, "u"),
            (3, "x1", 1, "u"),
            (3, None, 2, "d"),
        ],
        "k long, val string, seq long, op string",
    )


def test_scd2_intervals(spark):
    hist = apply_changes_scd2(
        _changelog(spark),
        keys="k",
        sequence_by="seq",
        apply_as_deletes="op = 'd'",
        except_columns=["op", "seq"],
    )
    rows = {
        (r["k"], r["__START_AT"]): (r["val"], r["__END_AT"])
        for r in hist.collect()
    }
    assert rows == {
        (1, 1): ("v1", 3),  # closed by the update
        (1, 3): ("v2", 5),  # closed by the delete, which emits nothing
        (1, 7): ("v3", None),  # reinsert after delete -> current
        (2, 2): ("w1", None),
        (3, 1): ("x1", 2),  # closed by delete; key 3 has no current row
    }


def test_scd2_current_matches_type1(spark):
    log = _changelog(spark)
    current = (
        apply_changes_scd2(
            log, keys="k", sequence_by="seq", apply_as_deletes="op = 'd'",
            except_columns=["op", "seq"],
        )
        .filter(F.col("__END_AT").isNull())
        .select("k", "val")
    )
    type1 = apply_changes(
        log, keys="k", sequence_by="seq", apply_as_deletes="op = 'd'",
        except_columns=["op", "seq"],
    ).select("k", "val")
    assert {tuple(r) for r in current.collect()} == {
        tuple(r) for r in type1.collect()
    }


def test_scd2_single_window_shuffle(spark):
    plan = (
        apply_changes_scd2(_changelog(spark), keys="k", sequence_by="seq")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
