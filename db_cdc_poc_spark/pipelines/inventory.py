"""The POS current-inventory pipeline — the reference's entire product,
re-expressed as engine operators over a mini-DLT registry.

Mirrors the medallion dataflow (reference: notebooks/03_Data_Ingestion.py
+ 04_Current_Inventory.sql) in batch form over the reference's own CSV
data (the Kafka/Postgres legs collapse to their file payloads — SURVEY
§7 step 3 covers the streaming forms):

    csv dims  ─────────────► store / item / inventory_change_type
    csv change feeds ──────► inventory_change_raw ─► inventory_change
                              (multi-file UNION)      (dedup A6)
    csv snapshot feeds ────► inventory_snapshot   (latest-per-key A7)
    all silver ────────────► inventory_current    (gold: 04's query)

Scale notes: dims broadcast (2/999/4 rows — J1); the gold left join is
an equi join on (store_id, item_id) with the range predicate as a
residual (SortMergeJoin at scale — J2); dedup and snapshot-latest are
max_by aggregates with map-side partials, so their shuffles carry ~key
space, not the changelog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_cdc_poc_spark import schemas
from db_cdc_poc_spark.operators.cdc import latest_by_key
from db_cdc_poc_spark.operators.dedup import dedup_exact
from db_cdc_poc_spark.plans.registry import Expectation, TableRegistry
from db_cdc_poc_spark.sources.files import read_csv

REFERENCE_1000 = "/root/reference/data/point_of_sale_simulated_1000"


def build_inventory_pipeline(
    spark: SparkSession,
    data_dir: str = REFERENCE_1000,
    dataset_suffix: str = "_1000",
) -> TableRegistry:
    """Register the full pipeline against a reference-format data dir.

    File layout matches the reference config (01_Environment_Setup.py:
    35-52): store.txt, item{suffix}.txt, inventory_change_type.txt,
    inventory_change_{store001,online}{suffix}.txt,
    inventory_snapshot_{store001,online}{suffix}.txt.
    """
    reg = TableRegistry(spark)
    d = data_dir.rstrip("/")

    # -- static dims (S1; reference 03:53-129, 24h trigger 03:63,92,118) --

    @reg.table(tier="silver", trigger="24 hours", comment="store dim")
    def store() -> DataFrame:
        return read_csv(spark, f"{d}/store.txt", schemas.STORE_SCHEMA)

    @reg.table(tier="silver", trigger="24 hours", comment="item dim")
    def item() -> DataFrame:
        return read_csv(spark, f"{d}/item{dataset_suffix}.txt", schemas.ITEM_SCHEMA)

    @reg.table(tier="silver", trigger="24 hours", comment="change-type dim")
    def inventory_change_type() -> DataFrame:
        return read_csv(spark, f"{d}/inventory_change_type.txt", schemas.CHANGE_TYPE_SCHEMA)

    # -- change feed (S2 multi-file UNION ALL; reference 02:48-62) -------

    @reg.table(tier="bronze", comment="raw change events, both store feeds")
    def inventory_change_raw() -> DataFrame:
        paths = [
            f"{d}/inventory_change_store001{dataset_suffix}.txt",
            f"{d}/inventory_change_online{dataset_suffix}.txt",
        ]
        return read_csv(
            spark,
            paths,
            schemas.INVENTORY_CHANGE_SCHEMA,
            timestamp_format=schemas.POS_TIMESTAMP_FORMAT,
        )

    # -- silver: dedup (A6; reference 03:219). BOPIS orders appear in both
    # feeds (21 duplicate (trans_id, item_id) pairs in the 1000-item set);
    # survivor = earliest event (the online order precedes the pickup).

    @reg.table(
        tier="silver",
        comment="deduped change events",
        # warn-only data-quality meters (@dlt.expect): violation counts
        # ride the consumer's action via observe — outputs unchanged
        expect=[
            Expectation("valid_change_type", "change_type_id BETWEEN 1 AND 4"),
            Expectation("nonzero_quantity", "quantity <> 0"),
            Expectation("known_store", "store_id IS NOT NULL"),
        ],
    )
    def inventory_change() -> DataFrame:
        raw = reg.read("inventory_change_raw")
        # dedup_exact keeps the GREATEST order_by; negate the epoch so
        # the earliest event wins (the online order precedes the pickup)
        return dedup_exact(
            raw.withColumn("_neg_ts", -F.unix_seconds("date_time")),
            keys=["trans_id", "item_id"],
            order_by=["_neg_ts", "store_id"],
        ).drop("_neg_ts")

    # -- silver: snapshot latest-per-key (A7 batch; reference 03:318-326 —
    # the CDC apply collapses to latest (item, store) row; CSV rows carry
    # event-time date_time as the sequence column).

    @reg.table(tier="silver", comment="latest snapshot per (item, store)")
    def inventory_snapshot() -> DataFrame:
        paths = [
            f"{d}/inventory_snapshot_store001{dataset_suffix}.txt",
            f"{d}/inventory_snapshot_online{dataset_suffix}.txt",
        ]
        snaps = read_csv(
            spark,
            paths,
            schemas.INVENTORY_SNAPSHOT_SCHEMA,
            timestamp_format=schemas.POS_TIMESTAMP_FORMAT,
        )
        return latest_by_key(
            snaps, keys=["item_id", "store_id"], sequence_by="date_time",
            tie_breakers="employee_id",
        ).select(
            "item_id",
            "store_id",
            "quantity",
            F.col("date_time").alias("date_time_ts"),
        )

    # -- gold (reference 04_Current_Inventory.sql:11-38) ------------------

    @reg.table(tier="gold", trigger="5 minute", comment="current inventory")
    def inventory_current() -> DataFrame:
        snap = reg.read("inventory_snapshot").alias("a")
        changes = corrected_changes(reg).alias("b")
        joined = snap.join(
            changes,
            (F.col("a.store_id") == F.col("b.store_id"))
            & (F.col("a.item_id") == F.col("b.item_id"))
            & (F.col("a.date_time_ts") <= F.col("b.date_time")),
            "left",
        )
        # FIRST(a.quantity) in the reference (04:14) is safe only because
        # the snapshot side is 1 row/key; grouping by the snapshot columns
        # makes that explicit and deterministic.
        return (
            joined.groupBy(
                F.col("a.store_id").alias("store_id"),
                F.col("a.item_id").alias("item_id"),
                F.col("a.quantity").alias("snapshot_quantity"),
                F.col("a.date_time_ts").alias("_snap_ts"),
            )
            .agg(
                F.coalesce(F.sum("b.quantity"), F.lit(0)).alias("change_quantity"),
                F.max("b.date_time").alias("_max_change_ts"),
            )
            .select(
                "store_id",
                "item_id",
                "snapshot_quantity",
                "change_quantity",
                (F.col("snapshot_quantity") + F.col("change_quantity")).alias(
                    "current_inventory"
                ),
                F.greatest("_snap_ts", "_max_change_ts").alias("date_time"),
            )
            .orderBy(F.col("date_time").desc())
        )

    return reg


def corrected_changes(reg: TableRegistry) -> DataFrame:
    """The BOPIS-corrected change rows feeding gold (04:18-28): deduped
    silver changes joined to the store/change-type dims (broadcast),
    with the online-bopis informational rows dropped — the stock moves
    when the store fulfills the pickup, not when the order is placed.
    Shared by the batch gold builder and the incremental gold stream
    (streaming/gold.py)."""
    return (
        reg.read("inventory_change").alias("x")
        .join(F.broadcast(reg.read("store").alias("y")), "store_id")
        .join(
            F.broadcast(reg.read("inventory_change_type").alias("z")),
            "change_type_id",
        )
        .filter(~((F.col("y.name") == "online") & (F.col("z.change_type") == "bopis")))
        .select("store_id", "item_id", "date_time", "quantity")
    )


def gold_current_inventory_sql(reg: TableRegistry) -> DataFrame:
    """The gold aggregate through the SQL surface (the reference
    defines it as a CREATE LIVE TABLE SQL statement — 04:5-38): silver
    tables become temp views and one spark.sql text produces the same
    plan Catalyst gives the DataFrame form. Engine formulation, not the
    reference text: max_by replaces FIRST (deterministic), the change
    subquery is a CTE, GREATEST handles the no-changes null branch
    explicitly.
    """
    reg.create_views(
        ["inventory_snapshot", "inventory_change", "store", "inventory_change_type"]
    )
    return reg.spark.sql(
        """
        WITH corrected_changes AS (
            SELECT x.store_id, x.item_id, x.date_time, x.quantity
            FROM inventory_change x
            JOIN store y ON x.store_id = y.store_id
            JOIN inventory_change_type z ON x.change_type_id = z.change_type_id
            WHERE NOT (y.name = 'online' AND z.change_type = 'bopis')
        )
        SELECT a.store_id,
               a.item_id,
               a.quantity AS snapshot_quantity,
               COALESCE(SUM(b.quantity), 0) AS change_quantity,
               a.quantity + COALESCE(SUM(b.quantity), 0) AS current_inventory,
               GREATEST(a.date_time_ts,
                        COALESCE(MAX(b.date_time), a.date_time_ts)) AS date_time
        FROM inventory_snapshot a
        LEFT JOIN corrected_changes b
          ON a.store_id = b.store_id
         AND a.item_id = b.item_id
         AND a.date_time_ts <= b.date_time
        GROUP BY a.store_id, a.item_id, a.quantity, a.date_time_ts
        ORDER BY date_time DESC
        """
    )
