"""Envelope extraction: Kafka-style (key, value) binary payloads into
typed rows — the JSON event path and the Debezium CDC path.

Re-expresses the reference's two silver extraction stages
(reference: notebooks/03_Data_Ingestion.py:201-221 transaction events;
03:304-315 Debezium envelope) as reusable batch/streaming DataFrame
transforms. Works identically on a Kafka stream's (key, value) binary
columns and on file-based stand-ins with the same shape.

Scale: both transforms are map-only projections (cast -> from_json
against a DECLARED schema -> nested-field select [-> explode]) that
pipeline with the scan; no shuffle, no Python. from_json with an
explicit schema never triggers inference over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_cdc_poc_spark.schemas import (
    CDC_KEY_SCHEMA,
    CDC_VALUE_SCHEMA,
    TRANSACTION_EVENT_SCHEMA,
)


def parse_transaction_events(
    raw: DataFrame, value_col: str = "value", keep_envelope: bool = False
) -> DataFrame:
    """Kafka value bytes -> one row per (transaction, item).

    Mirrors reference 03:201-217: cast binary to string (F3),
    ``from_json`` against the declared transaction schema (F4), project
    nested fields (P1), ``explode_outer`` of the items array (F5 —
    outer keeps item-less transactions as null-item rows).

    Output: trans_id, store_id, date_time, change_type_id, item_id,
    quantity (+ the parsed ``event`` struct when keep_envelope).
    """
    parsed = raw.withColumn(
        "event",
        F.from_json(F.col(value_col).cast("string"), TRANSACTION_EVENT_SCHEMA),
    )
    cols = [
        F.col("event.trans_id").alias("trans_id"),
        F.col("event.store_id").alias("store_id"),
        F.col("event.date_time").alias("date_time"),
        F.col("event.change_type_id").alias("change_type_id"),
        F.explode_outer("event.items").alias("item"),
    ]
    if keep_envelope:
        cols.insert(0, F.col("event"))
    return (
        parsed.select(*cols)
        .withColumn("item_id", F.col("item.item_id"))
        .withColumn("quantity", F.col("item.quantity"))
        .drop("item")
    )


def parse_cdc_envelope(
    raw: DataFrame, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """Debezium (key, value) bytes -> flattened change rows.

    Mirrors reference 03:304-315: key/value cast + from_json against
    the declared Debezium schemas, after-image field extraction, and
    the epoch-MICROseconds -> timestamp conversion (F7; ``ts_ms``
    stays a long — it is the CDC sequencing column, 03:324).

    Output: item_id, store_id, ts_ms, op, date_time (epoch µs),
    quantity, date_time_ts (timestamp).
    """
    return (
        raw.withColumn(
            "key_json", F.from_json(F.col(key_col).cast("string"), CDC_KEY_SCHEMA)
        )
        .withColumn(
            "value_json",
            F.from_json(F.col(value_col).cast("string"), CDC_VALUE_SCHEMA),
        )
        .select(
            "key_json.item_id",
            "key_json.store_id",
            "value_json.ts_ms",
            "value_json.op",
            "value_json.after.date_time",
            "value_json.after.quantity",
        )
        .withColumn(
            "date_time_ts", (F.col("date_time") / F.lit(1000000.0)).cast("timestamp")
        )
    )
