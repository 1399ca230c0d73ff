"""Incremental gold maintenance — the foreachBatch form of the
reference's ``inventory_current`` (04_Current_Inventory.sql:3 runs the
full gold query every 5-minute trigger; at a 100 TB keyspace that full
recompute is the first thing to hurt, so this maintains the SAME result
incrementally).

Semantics (04_Current_Inventory.sql:11-38): per snapshot key,

    current = snapshot_quantity + SUM(corrected changes at/after the
              snapshot time);   date_time = latest of those events

The per-key accumulator (change sum, latest change ts) is associative,
so micro-batches of the corrected change stream can be folded into a
``BucketedStateTable`` in any arrival order:

* seed: one state row per snapshot key — (snapshot_quantity,
  snapshot_ts, change_quantity=0, last_change_ts=null);
* per batch: join the batch's rows to the TOUCHED buckets' state on the
  key (bucket-local — the join reads O(touched state), not the
  keyspace), drop rows before their key's snapshot_ts, aggregate the
  batch's (sum, max ts) per key, and fold into the accumulator;
* read: current = snapshot + accumulated sum; date_time = greatest of
  snapshot/last-change ts. Keys without a snapshot row never enter the
  state — gold is snapshot-driven, same as the reference's LEFT JOIN.

Input contract: the DEDUPED, BOPIS-corrected silver change rows
(``pipelines.inventory.corrected_changes``) — dedup across batches is
the silver stream's job (T2), not gold's.
"""

from __future__ import annotations

import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from db_cdc_poc_spark.streaming.state import BucketedStateTable


class IncrementalGold:
    """foreachBatch-maintained current-inventory aggregate."""

    def __init__(
        self,
        path: str,
        snapshot: DataFrame,
        keys: Sequence[str] = ("store_id", "item_id"),
        snapshot_quantity_col: str = "quantity",
        snapshot_ts_col: str = "date_time_ts",
        num_buckets: int = 16,
    ) -> None:
        self.keys = list(keys)
        self.table = BucketedStateTable(path, self.keys, num_buckets=num_buckets)
        seed = snapshot.select(
            *self.keys,
            F.col(snapshot_quantity_col).alias("snapshot_quantity"),
            F.col(snapshot_ts_col).alias("snapshot_ts"),
            F.lit(0).cast("long").alias("change_quantity"),
            F.lit(None).cast("timestamp").alias("last_change_ts"),
        )
        self._schema: StructType = seed.schema
        self.table.merge_batch(seed, lambda state, b: b)

    # -- merge ------------------------------------------------------------

    def apply_changes_batch(
        self, batch: DataFrame, epoch_id: int | None = None
    ) -> None:
        """Fold one micro-batch of corrected change rows
        (keys..., date_time, quantity) into the accumulator."""

        def merge(state: DataFrame | None, b: DataFrame) -> DataFrame:
            if state is None:
                # these buckets hold no snapshot keys: changes for
                # unknown keys don't create gold rows (reference
                # semantics — snapshot LEFT JOIN changes)
                return b.sparkSession.createDataFrame([], self._schema)
            deltas = (
                b.join(state.select(*self.keys, "snapshot_ts"), self.keys)
                .filter(F.col("date_time") >= F.col("snapshot_ts"))
                .groupBy(*self.keys)
                .agg(
                    F.sum("quantity").cast("long").alias("__dq"),
                    F.max("date_time").alias("__dts"),
                )
            )
            return state.join(deltas, self.keys, "left").select(
                *self.keys,
                "snapshot_quantity",
                "snapshot_ts",
                (F.col("change_quantity") + F.coalesce("__dq", F.lit(0))).alias(
                    "change_quantity"
                ),
                # greatest skips nulls: first delta replaces the null seed
                F.greatest("last_change_ts", "__dts").alias("last_change_ts"),
            )

        self.table.merge_batch(batch, merge)

    # -- read -------------------------------------------------------------

    def current(self, spark: SparkSession) -> DataFrame:
        """The gold table, matching the batch ``inventory_current``
        column-for-column (04:11-17)."""
        state = self.table.state_for(spark)
        if state is None:
            raise ValueError(f"incremental gold {self.table.path} has no state yet")
        return state.select(
            *self.keys,
            "snapshot_quantity",
            "change_quantity",
            (F.col("snapshot_quantity") + F.col("change_quantity")).alias(
                "current_inventory"
            ),
            F.greatest(
                "snapshot_ts", F.coalesce("last_change_ts", "snapshot_ts")
            ).alias("date_time"),
        ).orderBy(F.col("date_time").desc())


def stream_gold_inventory(
    spark: SparkSession,
    changes_path: str,
    snapshot: DataFrame,
    keys: Sequence[str] = ("store_id", "item_id"),
    state_path: str | None = None,
    max_files_per_trigger: int | None = None,
    num_buckets: int = 16,
) -> DataFrame:
    """Corrected-change file stream -> foreachBatch incremental gold ->
    final table. Equals the batch gold recompute over the same inputs
    regardless of micro-batch boundaries (asserted in tests across >=3
    batches with ``maxFilesPerTrigger=1``)."""
    gold = IncrementalGold(
        state_path or tempfile.mkdtemp(prefix="gold_state_"),
        snapshot,
        keys=keys,
        num_buckets=num_buckets,
    )
    static = spark.read.parquet(changes_path)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(changes_path)
    checkpoint = tempfile.mkdtemp(prefix="ckpt_gold_")
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, epoch: gold.apply_changes_batch(batch, epoch)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.awaitTermination()
    return gold.current(spark)
