"""Incremental CDC apply — the streaming form of ``dlt.apply_changes``.

The batch operator (operators/cdc.py) reduces a whole changelog at
once; this module maintains a keyed state table across micro-batches
via ``foreachBatch`` (reference: 03_Ingestion.py:318-326 —
``dlt.create_target_table`` + ``dlt.apply_changes``; OSS Spark has no
managed upsert sink, so we build one on parquet).

State layout: the target stores the LATEST CHANGELOG ROW per key —
including delete markers and the sequencing columns — HASH-BUCKETED by
key into ``num_buckets`` independent version chains::

    <path>/bucket_0007/v_00000003/*.parquet

A micro-batch rewrites ONLY the buckets its keys hash into: merge cost
is O(|touched state|), not O(|total state|) — at a 100 TB keyspace a
small batch touches a handful of buckets and the other chains are not
even read. Bucket routing is ``pmod(xxhash64(keys...), num_buckets)``
— deterministic across sessions, computed on read (partition dirs
carry it; data files don't store the routing column).

Keeping delete rows in state (rather than physically removing keys)
makes the merge associative::

    latest(state ∪ batch) == latest(full changelog so far)

so out-of-order rows *across* micro-batches resolve correctly: a stale
update arriving after a newer one (or after a delete) loses the max_by
and leaves state unchanged. Reads filter deletes and drop bookkeeping
columns.

Versioned directories exist because Spark cannot overwrite a parquet
path it is concurrently reading (self-overwrite corrupts the scan);
each touched bucket writes ``v_{n+1}`` from ``v_n`` ∪ its batch slice,
then old versions are pruned. The merge is ONE Spark job writing
``partitionBy(bucket)`` to a staging dir, then per-bucket directory
renames (an atomic local-FS/HDFS commit; on object stores swap the
rename for the store's commit protocol — or swap the whole class for
Delta/Iceberg MERGE INTO when available).
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.cdc import latest_by_key

_BUCKET_COL = "__cdc_bucket"


class CdcTarget:
    """A keyed upsert target backed by hash-bucketed versioned parquet
    state (S6/S8: the engine's stand-in for ``dlt.create_target_table``)."""

    def __init__(
        self,
        path: str,
        keys: str | Sequence[str],
        sequence_by: str | Sequence[str],
        apply_as_deletes: str | None = None,
        except_columns: Sequence[str] = (),
        tie_breakers: str | Sequence[str] = (),
        keep_versions: int = 2,
        num_buckets: int = 16,
    ) -> None:
        self.path = Path(path)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.sequence_by = sequence_by
        self.apply_as_deletes = apply_as_deletes
        self.except_columns = list(except_columns)
        self.tie_breakers = tie_breakers
        self.keep_versions = keep_versions
        self.num_buckets = num_buckets
        self.path.mkdir(parents=True, exist_ok=True)

    # -- bucket routing ---------------------------------------------------

    def bucket_expr(self) -> Column:
        """Deterministic key->bucket routing (stable across sessions)."""
        return F.pmod(F.xxhash64(*self.keys), F.lit(self.num_buckets)).cast("int")

    # -- state layout -----------------------------------------------------

    def _bucket_dir(self, b: int) -> Path:
        return self.path / f"bucket_{b:04d}"

    def _versions(self, b: int) -> list[Path]:
        return sorted(p for p in self._bucket_dir(b).glob("v_*") if p.is_dir())

    def _latest_paths(self, buckets: Sequence[int] | None = None) -> list[Path]:
        """Latest version dir of each (existing) bucket chain."""
        out = []
        for b in range(self.num_buckets) if buckets is None else buckets:
            versions = self._versions(b)
            if versions:
                out.append(versions[-1])
        return out

    def _state_for(
        self, spark: SparkSession, buckets: Sequence[int]
    ) -> DataFrame | None:
        paths = self._latest_paths(buckets)
        if not paths:
            return None
        return spark.read.parquet(*[str(p) for p in paths])

    # -- merge ------------------------------------------------------------

    def upsert_batch(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """Merge one micro-batch: for every bucket the batch touches,
        new bucket state = latest(bucket state ∪ bucket's batch slice).
        Untouched buckets are neither read nor written. Called from
        foreachBatch.
        """
        spark = batch.sparkSession
        batch = batch.withColumn(_BUCKET_COL, self.bucket_expr())
        # the touched-bucket set is at most num_buckets values — tiny
        touched = sorted(
            r[0] for r in batch.select(_BUCKET_COL).distinct().collect()
        )
        if not touched:
            return
        state = self._state_for(spark, touched)
        if state is not None:
            merged = state.withColumn(_BUCKET_COL, self.bucket_expr()).unionByName(
                batch
            )
        else:
            merged = batch
        new_state = latest_by_key(
            merged, self.keys, self.sequence_by, self.tie_breakers
        )
        # one distributed write, partitioned by bucket; then per-bucket
        # directory renames commit each touched chain's next version
        staging = Path(tempfile.mkdtemp(prefix="cdc_staging_", dir=self.path))
        try:
            new_state.write.partitionBy(_BUCKET_COL).mode("overwrite").parquet(
                str(staging)
            )
            for b in touched:
                src = staging / f"{_BUCKET_COL}={b}"
                if not src.is_dir():  # bucket lost all rows (can't happen:
                    continue  # merges only add) — skip defensively
                versions = self._versions(b)
                next_n = int(versions[-1].name[2:]) + 1 if versions else 0
                self._bucket_dir(b).mkdir(exist_ok=True)
                src.rename(self._bucket_dir(b) / f"v_{next_n:08d}")
                for old in self._versions(b)[: -self.keep_versions]:
                    shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    # -- read -------------------------------------------------------------

    def current(self, spark: SparkSession) -> DataFrame:
        """The applied table: latest rows, deletes filtered, bookkeeping
        columns dropped — what ``dlt.apply_changes`` exposes."""
        paths = self._latest_paths()
        if not paths:
            raise ValueError(f"CDC target {self.path} has no state yet")
        state = spark.read.parquet(*[str(p) for p in paths])
        if self.apply_as_deletes is not None:
            state = state.filter(~F.expr(self.apply_as_deletes))
        drop = [c for c in self.except_columns if c in state.columns]
        return state.drop(*drop) if drop else state


def stream_apply_changes(
    spark: SparkSession,
    source_path: str,
    keys: str | Sequence[str],
    sequence_by: str | Sequence[str],
    apply_as_deletes: str | None = None,
    except_columns: Sequence[str] = (),
    tie_breakers: str | Sequence[str] = (),
    state_path: str | None = None,
    max_files_per_trigger: int | None = None,
    num_buckets: int = 16,
) -> DataFrame:
    """File stream -> foreachBatch incremental CDC apply -> final table.

    Drains ``source_path`` with an ``availableNow`` trigger, merging
    each micro-batch into a ``CdcTarget``, and returns the final
    applied table. Equals batch ``apply_changes`` over the same data
    regardless of how rows split across micro-batches (asserted in
    tests with ``max_files_per_trigger=1`` over multi-file input).
    """
    target = CdcTarget(
        state_path or tempfile.mkdtemp(prefix="cdc_state_"),
        keys=keys,
        sequence_by=sequence_by,
        apply_as_deletes=apply_as_deletes,
        except_columns=except_columns,
        tie_breakers=tie_breakers,
        num_buckets=num_buckets,
    )
    static = spark.read.parquet(source_path)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_path)
    checkpoint = tempfile.mkdtemp(prefix="ckpt_cdc_")
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, epoch: target.upsert_batch(batch, epoch)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.awaitTermination()
    return target.current(spark)
