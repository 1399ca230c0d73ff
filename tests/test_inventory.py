"""Golden tests for the gold current-inventory pipeline against the
reference's own 1000-item dataset, cross-checked value-for-value
against a DuckDB implementation of the same dataflow."""

from __future__ import annotations

import duckdb
import pytest

from db_cdc_poc_spark.pipelines.inventory import REFERENCE_1000, build_inventory_pipeline

GOLD_DUCKDB_SQL = f"""
WITH raw AS (
    SELECT * FROM read_csv(
        ['{REFERENCE_1000}/inventory_change_store001_1000.txt',
         '{REFERENCE_1000}/inventory_change_online_1000.txt'],
        header=true,
        columns={{'trans_id': 'VARCHAR', 'item_id': 'INTEGER',
                  'store_id': 'INTEGER', 'date_time': 'TIMESTAMP',
                  'quantity': 'INTEGER', 'change_type_id': 'INTEGER'}})
), change AS (  -- dedup: earliest event wins, store_id DESC tiebreak
    SELECT trans_id, item_id, store_id, date_time, quantity, change_type_id
    FROM (SELECT *, row_number() OVER (PARTITION BY trans_id, item_id
                                       ORDER BY date_time, store_id DESC) AS rn
          FROM raw)
    WHERE rn = 1
), snap_raw AS (
    SELECT * FROM read_csv(
        ['{REFERENCE_1000}/inventory_snapshot_store001_1000.txt',
         '{REFERENCE_1000}/inventory_snapshot_online_1000.txt'],
        header=true,
        columns={{'item_id': 'INTEGER', 'employee_id': 'INTEGER',
                  'store_id': 'INTEGER', 'date_time': 'TIMESTAMP',
                  'quantity': 'INTEGER'}})
), snap AS (  -- latest snapshot per (item, store)
    SELECT item_id, store_id, quantity, date_time AS date_time_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY item_id, store_id
                                       ORDER BY date_time DESC, employee_id DESC) AS rn
          FROM snap_raw)
    WHERE rn = 1
), store AS (
    SELECT * FROM read_csv('{REFERENCE_1000}/store.txt', header=true,
        columns={{'store_id': 'INTEGER', 'name': 'VARCHAR'}})
), ctype AS (
    SELECT * FROM read_csv('{REFERENCE_1000}/inventory_change_type.txt', header=true,
        columns={{'change_type_id': 'INTEGER', 'change_type': 'VARCHAR'}})
)
SELECT a.store_id, a.item_id,
       a.quantity AS snapshot_quantity,
       coalesce(sum(b.quantity), 0) AS change_quantity,
       a.quantity + coalesce(sum(b.quantity), 0) AS current_inventory,
       greatest(a.date_time_ts, coalesce(max(b.date_time), a.date_time_ts)) AS date_time
FROM snap a
LEFT JOIN (
    SELECT x.store_id, x.item_id, x.date_time, x.quantity
    FROM change x
    JOIN store y ON x.store_id = y.store_id
    JOIN ctype z ON x.change_type_id = z.change_type_id
    WHERE NOT (y.name = 'online' AND z.change_type = 'bopis')
) b ON a.store_id = b.store_id AND a.item_id = b.item_id
   AND a.date_time_ts <= b.date_time
GROUP BY a.store_id, a.item_id, a.quantity, a.date_time_ts
"""


@pytest.fixture(scope="module")
def registry(spark):
    return build_inventory_pipeline(spark)


def test_gold_cardinality(registry):
    # 999 items x 2 stores (SURVEY §6 verified figure)
    assert registry.build("inventory_current").count() == 1998


def test_dedup_removes_exactly_21_bopis_duplicates(registry):
    raw = registry.build("inventory_change_raw").count()
    deduped = registry.build("inventory_change").count()
    assert raw - deduped == 21


def test_gold_matches_duckdb_exactly(registry):
    spark_rows = sorted(
        tuple(r) for r in registry.build("inventory_current").collect()
    )
    duck_rows = sorted(tuple(r) for r in duckdb.sql(GOLD_DUCKDB_SQL).fetchall())
    assert len(spark_rows) == len(duck_rows)
    assert spark_rows == duck_rows


def test_gold_invariant_current_equals_snapshot_plus_change(registry):
    gold = registry.build("inventory_current")
    bad = gold.filter(
        "current_inventory != snapshot_quantity + change_quantity"
    ).count()
    assert bad == 0


def test_snapshot_one_row_per_key(registry):
    snap = registry.build("inventory_snapshot")
    assert snap.count() == snap.select("item_id", "store_id").distinct().count()


def test_gold_sql_form_matches_dataframe_form(registry):
    from db_cdc_poc_spark.pipelines.inventory import gold_current_inventory_sql

    df_rows = sorted(tuple(r) for r in registry.build("inventory_current").collect())
    sql_rows = sorted(tuple(r) for r in gold_current_inventory_sql(registry).collect())
    assert sql_rows == df_rows


def test_dim_joins_are_broadcast(registry):
    plan = (
        registry.build("inventory_current")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_silver_expectations_report_zero_violations(spark):
    """The reference dataset is clean: the silver change table's
    warn-only expectations meter zero violations, and attaching them
    changes nothing downstream (golden tests above stay the proof)."""
    from db_cdc_poc_spark.pipelines.inventory import build_inventory_pipeline

    reg = build_inventory_pipeline(spark)
    reg.build("inventory_change")
    rep = reg.quality_report("inventory_change")
    assert rep == {
        "valid_change_type": 0,
        "nonzero_quantity": 0,
        "known_store": 0,
    }
