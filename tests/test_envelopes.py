"""Envelope extraction: JSON transaction events and Debezium CDC."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from db_cdc_poc_spark.operators.envelopes import (
    parse_cdc_envelope,
    parse_transaction_events,
)

EVENT = {
    "trans_id": "60BE8AA9-7ECE-4337-9A62-799ADD5B2476",
    "store_id": 0,
    "date_time": "2021-01-01T01:03:55.000Z",
    "change_type_id": 1,
    "items": [
        {"item_id": 100893, "quantity": -4},
        {"item_id": 100007, "quantity": -1},
    ],
}

CDC = {
    "key": {"item_id": 100002, "store_id": 0},
    "value": {
        "before": None,
        "after": {
            "item_id": 100002,
            "store_id": 0,
            "employee_id": 1,
            "date_time": 1609459200000000,
            "quantity": 100,
        },
        "op": "c",
        "ts_ms": 1700586815385,
        "transaction": None,
    },
}


def test_parse_transaction_events_explodes_items(spark):
    raw = spark.createDataFrame([(json.dumps(EVENT),)], "value string")
    rows = parse_transaction_events(raw).collect()
    assert len(rows) == 2
    assert {r.item_id for r in rows} == {100893, 100007}
    for r in rows:
        assert r.trans_id == EVENT["trans_id"]
        assert r.store_id == 0
        assert r.change_type_id == 1
        assert r.date_time == dt.datetime(2021, 1, 1, 1, 3, 55)


def test_parse_transaction_events_outer_keeps_empty_items(spark):
    empty = dict(EVENT, items=[])
    raw = spark.createDataFrame([(json.dumps(empty),)], "value string")
    rows = parse_transaction_events(raw).collect()
    assert len(rows) == 1
    assert rows[0].item_id is None and rows[0].quantity is None


def test_parse_transaction_events_bad_json_yields_nulls(spark):
    raw = spark.createDataFrame([("{not json",)], "value string")
    rows = parse_transaction_events(raw).collect()
    assert len(rows) == 1
    assert rows[0].trans_id is None


def test_parse_cdc_envelope(spark):
    raw = spark.createDataFrame(
        [(json.dumps(CDC["key"]), json.dumps(CDC["value"]))], "key string, value string"
    )
    [r] = parse_cdc_envelope(raw).collect()
    assert (r.item_id, r.store_id) == (100002, 0)
    assert r.ts_ms == 1700586815385
    assert r.op == "c"
    assert r.quantity == 100
    # epoch µs 1609459200000000 == 2021-01-01 00:00:00 UTC (F7)
    assert r.date_time_ts == dt.datetime(2021, 1, 1, 0, 0, 0)


def test_parse_cdc_envelope_binary_input(spark):
    # Kafka delivers binary; cast-to-string must handle it (F3)
    raw = spark.createDataFrame(
        [(json.dumps(CDC["key"]).encode(), json.dumps(CDC["value"]).encode())],
        "key binary, value binary",
    )
    [r] = parse_cdc_envelope(raw).collect()
    assert r.quantity == 100


def test_read_json_permissive_quarantines_bad_lines(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from db_cdc_poc_spark.sources.files import read_json_permissive, split_corrupt

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "this is not json\n"
        '{"id": 2, "name": "also ok"}\n'
        '{"id": "NaNo", "name": 3}\n'  # type mismatch: id unparseable
        '{"id": 4}\n'  # missing field -> null, NOT corrupt
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    df = read_json_permissive(spark, str(p), schema)
    clean, bad = split_corrupt(df)
    got = {(r.id, r.name) for r in clean.collect()}
    assert (1, "ok") in got and (2, "also ok") in got and (4, None) in got
    raws = [r.raw for r in bad.collect()]
    assert "this is not json" in raws
    assert any("NaNo" in r for r in raws)
    assert clean.count() + bad.count() == 5
    df.unpersist()


def test_read_json_permissive_counts_survive_full_scan(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from db_cdc_poc_spark.sources.files import read_json_permissive, split_corrupt

    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(['{"id": %d}' % i for i in range(50)] + ["junk"] * 3))
    df = read_json_permissive(spark, str(p), StructType([StructField("id", LongType())]))
    clean, bad = split_corrupt(df)
    assert clean.count() == 50 and bad.count() == 3
    df.unpersist()
