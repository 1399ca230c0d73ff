"""Kafka source/sink builders: option plumbing only — no broker or
spark-sql-kafka package exists in this environment, so .load()/.save()
are exercised nowhere; the builders must still construct cleanly with
exactly the reference's options."""

from __future__ import annotations

from db_cdc_poc_spark.sources.kafka import (
    kafka_batch_writer,
    kafka_options,
    kafka_stream_reader,
)


def test_kafka_options_plain():
    opts = kafka_options("broker:9092")
    assert opts == {"kafka.bootstrap.servers": "broker:9092"}


def test_kafka_options_sasl():
    opts = kafka_options("broker:9092", username="u", password="p")
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-512"
    assert 'username="u"' in opts["kafka.sasl.jaas.config"]


def test_stream_reader_builds(spark):
    reader = kafka_stream_reader(
        spark, topic="inventory.event", bootstrap_servers="broker:9092"
    )
    assert reader is not None  # options applied without broker contact


def test_batch_writer_builds(spark):
    df = spark.createDataFrame([("k", "v")], "key string, value string")
    writer = kafka_batch_writer(df, topic="t", bootstrap_servers="broker:9092")
    assert writer is not None
