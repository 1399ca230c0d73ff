"""Streaming sessionization — the engine's ``applyInPandasWithState``
custom stateful operator (T2-adjacent; SURVEY §2.10 names the Arrow
path as the idiomatic extension point).

Per-user ``GroupState`` carries (last event micros, session counter)
across micro-batches; each batch's events are sorted and folded onto
that state, so session numbers keep counting across batches instead of
restarting. Equals the batch window form (operators/sessionize.py) when
each user's events arrive in chronological batch order — online
sessionization is order-sensitive by nature, and late events belong to
whatever session the stream had reached (the batch form is the
backfill corrector). Parity under chronological arrival is asserted in
tests with mtime-forced file ordering.

Scale: state is ~16 bytes per ACTIVE user, partitioned by user hash in
the state store; each micro-batch shuffles only its own rows. The
Python work is Arrow-batched per user group — no row-at-a-time UDF.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, event_id bigint, ts timestamp, session_seq int"
STATE_SCHEMA = "last_us bigint, seq int"


def _session_fold(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_us, seq = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        out = []
        for ts_ns in batch["ts"].astype("int64"):
            us = ts_ns // 1_000
            if last_us is None or us - last_us > gap_us:
                seq += 1
            last_us = us
            out.append(seq)
        state.update((int(last_us), int(seq)))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": batch["event_id"].to_numpy(),
                "ts": batch["ts"].to_numpy(),
                "session_seq": pd.array(out, dtype="int32"),
            }
        )

    return fn


def stream_sessionize(
    spark: SparkSession,
    source_path: str,
    gap_seconds: int = 1800,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File stream -> per-user applyInPandasWithState session fold ->
    memory sink; returns every event's session assignment after the
    availableNow drain."""
    static = spark.read.parquet(source_path)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_path).select("user_id", "event_id", "ts")
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fold(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from db_cdc_poc_spark.streaming.ephemeral import (
        discard_ephemeral_dir,
        drain_shuffle_partitions,
        ephemeral_checkpoint_dir,
        ephemeral_stream_confs,
    )

    name = f"sessions_{uuid.uuid4().hex[:8]}"
    checkpoint = ephemeral_checkpoint_dir("ckpt_sess_")
    parts = drain_shuffle_partitions(spark, source_path)
    try:
        with ephemeral_stream_confs(spark, shuffle_partitions=parts):
            q = (
                sessions.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .option("checkpointLocation", checkpoint)
                .start()
            )
            q.awaitTermination()
    finally:
        discard_ephemeral_dir(checkpoint)
    return spark.table(name)


# ---------------------------------------------------------------------------
# transformWithStateInPandas form (Spark 4's arbitrary-state API)
# ---------------------------------------------------------------------------


class _SessionProcessor:
    """StatefulProcessor running the SAME session fold as
    ``_session_fold`` on Spark 4's ``transformWithStateInPandas`` —
    the successor API to ``applyInPandasWithState``: typed named state
    (ValueState/ListState/MapState) instead of one opaque tuple,
    per-state TTL, timers, and RocksDB-backed stores. State here is one
    ValueState row per active user; parity with the batch window form
    under chronological arrival is asserted in tests alongside the
    legacy operator.

    Built lazily (class defined module-level, base imported at call
    time) so importing this module never requires the streaming
    processor API.
    """

    def __init__(self, gap_seconds: int) -> None:
        self.gap_us = gap_seconds * 1_000_000

    def init(self, handle) -> None:  # noqa: ANN001
        self.state = handle.getValueState("sess", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
        (user_id,) = key
        last_us, seq = self.state.get() if self.state.exists() else (None, 0)
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        out = []
        for ts_ns in batch["ts"].astype("int64"):
            us = ts_ns // 1_000
            if last_us is None or us - last_us > self.gap_us:
                seq += 1
            last_us = us
            out.append(seq)
        self.state.update((int(last_us), int(seq)))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": batch["event_id"].to_numpy(),
                "ts": batch["ts"].to_numpy(),
                "session_seq": pd.array(out, dtype="int32"),
            }
        )

    def close(self) -> None:
        pass


def stream_sessionize_tws(
    spark: SparkSession,
    source_path: str,
    gap_seconds: int = 1800,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``transformWithStateInPandas`` sessionization — same contract as
    ``stream_sessionize`` on the modern API.

    Environment note: the tws state protocol speaks protobuf between
    the JVM and the Python driver worker; containers without
    ``google.protobuf`` can't run it (the parity test importorskips),
    but the operator is plain public API and runs anywhere real.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type("SessionProcessor", (_SessionProcessor, StatefulProcessor), {})
    static = spark.read.parquet(source_path)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_path).select("user_id", "event_id", "ts")
    sessions = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    from db_cdc_poc_spark.streaming.ephemeral import (
        discard_ephemeral_dir,
        drain_shuffle_partitions,
        ephemeral_checkpoint_dir,
        ephemeral_stream_confs,
    )

    name = f"sessions_tws_{uuid.uuid4().hex[:8]}"
    checkpoint = ephemeral_checkpoint_dir("ckpt_sess_tws_")
    parts = drain_shuffle_partitions(spark, source_path)
    try:
        with ephemeral_stream_confs(spark, shuffle_partitions=parts):
            q = (
                sessions.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .option("checkpointLocation", checkpoint)
                .start()
            )
            q.awaitTermination()
    finally:
        discard_ephemeral_dir(checkpoint)
    return spark.table(name)
