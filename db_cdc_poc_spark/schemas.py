"""Explicit schemas for every ingestion point.

The reference declares every schema explicitly and never infers on the hot
path (reference: notebooks/02_Data_Generation.py:38-45,82-88;
notebooks/03_Data_Ingestion.py:53-56,81-86,109-112,182-193,288-300).
We keep that discipline: schema inference on 100 TB of files is a full
extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: CSV timestamp format used by all POS files
#: (reference: 02_Data_Generation.py:61,103).
POS_TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm:ss"

#: Inventory change event rows as they appear in the CSV change feeds
#: (reference: 02_Data_Generation.py:38-45).
INVENTORY_CHANGE_SCHEMA = StructType(
    [
        StructField("trans_id", StringType()),
        StructField("item_id", IntegerType()),
        StructField("store_id", IntegerType()),
        StructField("date_time", TimestampType()),
        StructField("quantity", IntegerType()),
        StructField("change_type_id", IntegerType()),
    ]
)

#: Per-transaction JSON event on the wire: one message per (trans_id),
#: items grouped into an array of structs
#: (reference: 03_Data_Ingestion.py:182-193, example 03:166-177).
TRANSACTION_EVENT_SCHEMA = StructType(
    [
        StructField("trans_id", StringType()),
        StructField("store_id", IntegerType()),
        StructField("date_time", TimestampType()),
        StructField("change_type_id", IntegerType()),
        StructField(
            "items",
            ArrayType(
                StructType(
                    [
                        StructField("item_id", IntegerType()),
                        StructField("quantity", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

#: Inventory snapshot rows (CSV) (reference: 02_Data_Generation.py:82-88).
INVENTORY_SNAPSHOT_SCHEMA = StructType(
    [
        StructField("item_id", IntegerType()),
        StructField("employee_id", IntegerType()),
        StructField("store_id", IntegerType()),
        StructField("date_time", TimestampType()),
        StructField("quantity", IntegerType()),
    ]
)

#: Dimensions (reference: 03_Data_Ingestion.py:53-56, 81-86, 109-112).
STORE_SCHEMA = StructType(
    [StructField("store_id", IntegerType()), StructField("name", StringType())]
)

ITEM_SCHEMA = StructType(
    [
        StructField("item_id", IntegerType()),
        StructField("name", StringType()),
        StructField("supplier_id", IntegerType()),
        StructField("safety_stock_quantity", IntegerType()),
    ]
)

CHANGE_TYPE_SCHEMA = StructType(
    [
        StructField("change_type_id", IntegerType()),
        StructField("change_type", StringType()),
    ]
)

#: Debezium CDC message key (reference: 03_Data_Ingestion.py:288-291).
CDC_KEY_SCHEMA = StructType(
    [StructField("item_id", LongType()), StructField("store_id", LongType())]
)

#: Debezium CDC envelope value (reference: 03_Data_Ingestion.py:293-300,
#: examples 03:256-286). ``after.date_time`` is epoch MICROseconds;
#: ``ts_ms`` is epoch milliseconds and is the sequencing column (03:324).
CDC_AFTER_SCHEMA = StructType(
    [
        StructField("item_id", IntegerType()),
        StructField("store_id", IntegerType()),
        StructField("employee_id", IntegerType()),
        StructField("date_time", LongType()),
        StructField("quantity", IntegerType()),
    ]
)

CDC_VALUE_SCHEMA = StructType(
    [
        StructField("before", CDC_AFTER_SCHEMA),
        StructField("after", CDC_AFTER_SCHEMA),
        StructField("op", StringType()),
        StructField("ts_ms", LongType()),
        StructField("transaction", StringType()),
    ]
)
