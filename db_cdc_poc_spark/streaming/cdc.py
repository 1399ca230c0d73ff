"""Incremental CDC apply — the streaming form of ``dlt.apply_changes``.

The batch operator (operators/cdc.py) reduces a whole changelog at
once; this module maintains a keyed state table across micro-batches
via ``foreachBatch`` (reference: 03_Ingestion.py:318-326 —
``dlt.create_target_table`` + ``dlt.apply_changes``; OSS Spark has no
managed upsert sink, so we build one on parquet).

State mechanics (hash-bucketed version chains, touched-buckets-only
rewrites) live in ``streaming/state.py``; this module plugs in the CDC
merge: the target stores the LATEST CHANGELOG ROW per key — including
delete markers and the sequencing columns. Keeping delete rows in
state (rather than physically removing keys) makes the merge
associative::

    latest(state ∪ batch) == latest(full changelog so far)

so out-of-order rows *across* micro-batches resolve correctly: a stale
update arriving after a newer one (or after a delete) loses the max_by
and leaves state unchanged. Reads filter deletes and drop bookkeeping
columns.
"""

from __future__ import annotations

import tempfile
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.cdc import latest_by_key
from db_cdc_poc_spark.streaming.state import (
    BucketedStateTable,
    unify_schemas,
    wider_type,
)


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
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.sequence_by = sequence_by
        self.apply_as_deletes = apply_as_deletes
        self.except_columns = list(except_columns)
        self.tie_breakers = tie_breakers
        self.state = BucketedStateTable(
            path, self.keys, num_buckets=num_buckets, keep_versions=keep_versions
        )

    @property
    def path(self):
        return self.state.path

    @property
    def num_buckets(self) -> int:
        return self.state.num_buckets

    def bucket_expr(self) -> Column:
        return self.state.bucket_expr()

    # -- merge ------------------------------------------------------------

    def upsert_batch(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """Merge one micro-batch: for every bucket the batch touches,
        new bucket state = latest(bucket state ∪ bucket's batch slice).
        Untouched buckets are neither read nor written. Called from
        foreachBatch.
        """

        def merge(state: DataFrame | None, b: DataFrame) -> DataFrame:
            # Schema evolution, two safe forms only:
            # - additive (allowMissingColumns): a batch carrying a NEW
            #   column widens the state, old rows take NULL; a batch
            #   missing a state column keeps it, its rows take NULL.
            # - in-family numeric widening (int->long, float->double):
            #   both sides are cast to the wider type before the union,
            #   so the touched bucket is rewritten widened; untouched
            #   buckets up-cast on read (state._read_chains).
            # Drops/renames/cross-family changes stay hard errors —
            # silent coercion corrupts CDC state.
            if state is not None:
                s_types = {f.name: f.dataType for f in state.schema.fields}
                for f in b.schema.fields:
                    st = s_types.get(f.name)
                    if st is None or st == f.dataType:
                        continue
                    w = wider_type(st, f.dataType)
                    if w is None:
                        raise TypeError(
                            f"CDC batch column {f.name!r} has type "
                            f"{f.dataType.simpleString()} but state has "
                            f"{st.simpleString()}; only in-family numeric "
                            "widening is supported"
                        )
                    if st != w:
                        state = state.withColumn(f.name, F.col(f.name).cast(w))
                    if f.dataType != w:
                        b = b.withColumn(f.name, F.col(f.name).cast(w))
            merged = (
                state.unionByName(b, allowMissingColumns=True)
                if state is not None
                else b
            )
            return latest_by_key(merged, self.keys, self.sequence_by, self.tie_breakers)

        self.state.merge_batch(batch, merge)

    # -- read -------------------------------------------------------------

    def current(self, spark: SparkSession) -> DataFrame:
        """The applied table: latest rows, deletes filtered, bookkeeping
        columns dropped — what ``dlt.apply_changes`` exposes."""
        state = self.state.state_for(spark)
        if state is None:
            raise ValueError(f"CDC target {self.path} has no state yet")
        if self.apply_as_deletes is not None:
            state = state.filter(~F.expr(self.apply_as_deletes))
        drop = [c for c in self.except_columns if c in state.columns]
        return state.drop(*drop) if drop else state

    def current_at(self, spark: SparkSession, commit: int) -> DataFrame:
        """Time travel: the applied table as of an earlier micro-batch
        commit (``state.commits()`` lists them; retention bounded by
        ``keep_versions`` — see ``BucketedStateTable.state_at``)."""
        state = self.state.state_at(spark, commit)
        if state is None:
            raise ValueError(f"CDC target {self.path} empty at commit {commit}")
        if self.apply_as_deletes is not None:
            state = state.filter(~F.expr(self.apply_as_deletes))
        drop = [c for c in self.except_columns if c in state.columns]
        return state.drop(*drop) if drop else state

    def changes_since(
        self,
        spark: SparkSession,
        commit: int | None,
        keys_filter: DataFrame | None = None,
    ) -> DataFrame:
        """Applied-state delta between a committed watermark and now:
        one ``(keys..., op, before, after)`` row per key whose applied
        row changed — ``op`` 'c' (new key), 'u' (payload changed), 'd'
        (delete applied); ``before``/``after`` are structs of the
        applied view's non-key columns (NULL on the missing side).

        This is the changelog a downstream incremental aggregate must
        fold to stay EXACTLY-ONCE across re-fired triggers (the crash
        soak's finding, ``scripts/crash_soak.py`` / SCALING.md): after
        a crash between the state commit and the fold, a changelog
        derived from the trigger's own batch permanently misses rows
        the crashed attempt committed — upstream operators (e.g. the
        streaming dedup index) legitimately re-decide on replay. The
        state delta against the last FOLDED commit covers the
        trigger's whole effect no matter which attempt wrote it, and a
        replayed identical upsert yields an empty delta (fold is a
        no-op). Retention: ``keep_versions`` must cover the fold's
        watermark lag plus crash slack.

        ``commit=None`` means "everything" (every applied row as 'c').
        ``keys_filter`` (a DataFrame of key columns) prunes the diff to
        those keys — pass the trigger's batch keys to keep the work
        batch-bounded instead of state-bounded.
        """
        from pyspark.sql import types as T

        new = self.current(spark)
        if keys_filter is not None:
            new = new.join(
                F.broadcast(keys_filter.select(*self.keys).distinct()), self.keys
            )
        if commit is None:
            payload_fields = [
                f for f in new.schema.fields if f.name not in self.keys
            ]
            return new.select(
                *self.keys,
                F.lit("c").alias("op"),
                F.lit(None)
                .cast(T.StructType(payload_fields))
                .alias("before"),
                F.struct(*[f.name for f in payload_fields]).alias("after"),
            )
        old = self.current_at(spark, commit)
        if keys_filter is not None:
            old = old.join(
                F.broadcast(keys_filter.select(*self.keys).distinct()), self.keys
            )
        # payload = UNION of both snapshots' columns, numerics widened:
        # upsert_batch supports additive evolution, so a column added
        # (or int->long widened) between the watermark commit and now
        # must appear NULL/widened on the old side, not blow up the
        # time-travel select — same contract as state_diff below.
        unified = unify_schemas([old.schema, new.schema])
        val_fields = [f for f in unified.fields if f.name not in self.keys]

        def _payload_struct(df: DataFrame) -> Column:
            return F.struct(
                *[
                    (
                        F.col(f.name).cast(f.dataType)
                        if f.name in df.columns
                        else F.lit(None).cast(f.dataType)
                    ).alias(f.name)
                    for f in val_fields
                ]
            )

        n = new.select(*self.keys, _payload_struct(new).alias("after"))
        o = old.select(*self.keys, _payload_struct(old).alias("before"))
        joined = n.join(o, self.keys, "full_outer")
        return (
            joined.withColumn(
                "op",
                F.when(F.col("before").isNull(), F.lit("c"))
                .when(F.col("after").isNull(), F.lit("d"))
                .otherwise(F.lit("u")),
            )
            # unchanged keys produce no row: a replayed identical
            # upsert must yield an EMPTY delta
            .filter(
                F.col("before").isNull()
                | F.col("after").isNull()
                | (F.col("before") != F.col("after"))
            )
            .select(*self.keys, "op", "before", "after")
        )


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
    checkpoint_path: str | None = None,
) -> DataFrame:
    """File stream -> foreachBatch incremental CDC apply -> final table.

    Drains ``source_path`` with an ``availableNow`` trigger, merging
    each micro-batch into a ``CdcTarget``, and returns the final
    applied table. Equals batch ``apply_changes`` over the same data
    regardless of how rows split across micro-batches (asserted in
    tests with ``max_files_per_trigger=1`` over multi-file input).

    Pass the SAME ``state_path`` + ``checkpoint_path`` to resume after
    a stop/crash: the checkpoint's file-source log skips every file an
    earlier run committed, so only new files merge into the state —
    no double application (asserted in the restart test). This is the
    fault-tolerance contract (T6) the reference delegates to DLT.
    """
    from db_cdc_poc_spark.streaming.ephemeral import ephemeral_checkpoint_dir

    target = CdcTarget(
        state_path or ephemeral_checkpoint_dir("cdc_state_"),
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
    checkpoint = checkpoint_path or ephemeral_checkpoint_dir("ckpt_cdc_")
    if checkpoint_path is None:
        # throwaway checkpoint: skip the 4.1 checksum sidecars (see
        # streaming/ephemeral.py); a caller-provided checkpoint is the
        # RESUMABLE contract and keeps the integrity default
        from db_cdc_poc_spark.streaming.ephemeral import ephemeral_stream_confs

        ctx = ephemeral_stream_confs(spark)
    else:
        from contextlib import nullcontext

        ctx = nullcontext()
    try:
        with ctx:
            q = (
                stream.writeStream.foreachBatch(
                    lambda batch, epoch: target.upsert_batch(batch, epoch)
                )
                .trigger(availableNow=True)
                .option("checkpointLocation", checkpoint)
                .start()
            )
            q.awaitTermination()
    finally:
        if checkpoint_path is None:
            # throwaway checkpoint only; a caller-provided path is the
            # resumable contract and must survive
            from db_cdc_poc_spark.streaming.ephemeral import (
                discard_ephemeral_dir,
            )

            discard_ephemeral_dir(checkpoint)
    return target.current(spark)


def state_diff(
    target: "CdcTarget",
    spark: SparkSession,
    from_commit: int,
    to_commit: int,
) -> DataFrame:
    """CDC audit diff: what changed in the applied table between two
    commits — the "show me what micro-batches 3..7 did" question a
    keyed sink must answer (Delta's table-changes / CDF analogue on
    the bucketed state store).

    Full outer join of the two time-travel snapshots on the target's
    keys, classified per key: ``added`` (only in ``to``), ``removed``
    (only in ``from`` — a delete applied in between), ``changed`` (both
    sides present, any non-key column differs). Unchanged keys are
    dropped. One shuffle on the keys; at production keyspace both
    snapshots come off the same bucket layout, so the join co-locates.

    Output: key columns + ``change_kind``.
    """
    a = target.current_at(spark, from_commit)
    b = target.current_at(spark, to_commit)
    keys = target.keys
    # value columns = the UNION of both snapshots' columns: the sink
    # supports additive schema evolution, so a column added between the
    # commits must participate (NULL on the side that predates it) or a
    # row whose only change is in the new column would diff as
    # unchanged
    types = {f.name: f.dataType for f in [*a.schema.fields, *b.schema.fields]}
    val_cols = sorted(c for c in types if c not in keys)

    def _struct(df: DataFrame) -> Column:
        return F.struct(
            *[
                F.col(c) if c in df.columns else F.lit(None).cast(types[c]).alias(c)
                for c in val_cols
            ]
        )

    sa = a.select(*keys, _struct(a).alias("__va"))
    sb = b.select(*keys, _struct(b).alias("__vb"))
    joined = sa.join(sb, keys, "full_outer")
    kind = (
        F.when(F.col("__va").isNull(), F.lit("added"))
        .when(F.col("__vb").isNull(), F.lit("removed"))
        .when(F.col("__va") != F.col("__vb"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_kind", kind)
        .filter(F.col("change_kind").isNotNull())
        .select(*keys, "change_kind")
    )
