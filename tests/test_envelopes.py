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
