"""Kafka source/sink builders (S3/S4/S5) — the reference's streaming
transport, behind an interface that degrades gracefully when no broker
or spark-sql-kafka package is present (this environment has neither;
file-based streams with the same (key, value) shape stand in — see
streaming/ and operators/envelopes.py).

Mirrors every option the reference sets (reference:
03_Data_Ingestion.py:139-160 events topic, 03:230-251 CDC topic;
producer 02_Data_Generation.py:171-197): bootstrap servers, SASL_SSL /
SCRAM-SHA-512 auth, subscribe, startingOffsets, failOnDataLoss,
maxOffsetsPerTrigger. Secrets come in as plain parameters — resolve
them from your secret store at the call site; nothing here reads env
vars or external services.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamReader


def kafka_options(
    bootstrap_servers: str,
    username: str | None = None,
    password: str | None = None,
    security_protocol: str = "SASL_SSL",
    sasl_mechanism: str = "SCRAM-SHA-512",
) -> dict[str, str]:
    """The connection-option dict shared by sources and sinks
    (reference 03:146-155)."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if username is not None:
        opts.update(
            {
                "kafka.security.protocol": security_protocol,
                "kafka.sasl.mechanism": sasl_mechanism,
                "kafka.sasl.jaas.config": (
                    "org.apache.kafka.common.security.scram.ScramLoginModule required "
                    f'username="{username}" password="{password}";'
                ),
            }
        )
    return opts


def kafka_stream_reader(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = 100,
    **auth: str,
) -> DataStreamReader:
    """Configured streaming reader for a Kafka topic (S3/S4).

    Defaults mirror the reference exactly: startingOffsets=latest
    (03:157), failOnDataLoss=false (03:156), maxOffsetsPerTrigger=100
    (03:158 — the micro-batch rate limit, T4). Call ``.load()`` when a
    broker + the spark-sql-kafka package are actually available.
    """
    reader = (
        spark.readStream.format("kafka")
        .options(**kafka_options(bootstrap_servers, **auth))
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader


def kafka_batch_writer(
    df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    **auth: str,
):
    """Configured batch writer publishing (key, value) rows to a topic
    (S5). Set-based — replaces the reference's driver-side row loop
    (02:191-197/02:259) with ``df.write.format('kafka')``; the input
    must have binary/string ``key`` and ``value`` columns.
    """
    return (
        df.write.format("kafka")
        .options(**kafka_options(bootstrap_servers, **auth))
        .option("topic", topic)
    )
