"""Session confs for EPHEMERAL streaming checkpoints.

Spark 4.1 writes a checksum sidecar for every streaming-checkpoint file
(``spark.sql.streaming.checkpoint.fileChecksum.enabled``, default true)
and every state-store delta-file creation BLOCKS on the sidecar's
future (``ChecksumCheckpointFileManager.createWithChecksum`` →
``awaitResult`` — verified by thread dump: all 32 task threads parked
there during a drain). For a checkpoint that outlives the query — a
resumable CDC apply, a production continuous stream — that integrity
check is worth its cost. For the engine's synchronous DRAINS
(availableNow → memory/foreachBatch sink, checkpoint in a throwaway
tempdir that nothing ever reads back, let alone resumes), it buys
nothing and measured ~1.8x on the whole drain (5.2s → 2.9s for the
sf0.1 events dedup drain at 32 state partitions; the per-task wait is
~1.4s of pure parking).

``ephemeral_stream_confs`` scopes the opt-out to the drain: the conf
is read at STREAM START, so setting it around start()/awaitTermination
and restoring afterwards leaves durable-checkpoint callers (anyone
passing their own ``checkpoint_path``) on the safe default. Sessions
older than Spark 4.1 simply carry an unused conf key.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_CHECKSUM_CONF = "spark.sql.streaming.checkpoint.fileChecksum.enabled"


@contextmanager
def ephemeral_stream_confs(spark: SparkSession):
    """Disable throwaway-checkpoint overhead for the duration of a
    synchronous drain; restores the previous setting on exit."""
    try:
        prev = spark.conf.get(_CHECKSUM_CONF, None)
    except Exception:  # pragma: no cover - conf access locked down
        prev = None
    try:
        spark.conf.set(_CHECKSUM_CONF, "false")
    except Exception:  # pragma: no cover - conf access locked down
        yield
        return
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_CHECKSUM_CONF)
        else:
            spark.conf.set(_CHECKSUM_CONF, prev)
