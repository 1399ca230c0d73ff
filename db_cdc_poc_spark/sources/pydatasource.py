"""Custom batch source via the Python Data Source API (Spark 4).

The reference's only extension point for new feeds is "drop more files
on the landing path" (reference: notebooks/03_Data_Ingestion.py — cloud
file listing). OSS Spark 4 adds a first-class, pure-Python way to mount
ANY external system as a DataFrame source: subclass
``pyspark.sql.datasource.DataSource``, register it on the session, and
``spark.read.format(name)`` plans it like any other scan — with real
``InputPartition`` parallelism, so a 1000-executor cluster fans the
read out exactly like a parquet scan (one Python worker per partition,
Arrow-batched back to the JVM).

``SyntheticEventsDataSource`` here is the engine's deterministic
load/soak feed: an arithmetic row generator (no clock, no RNG state)
whose output is exactly reproducible from (n_rows, partitions) alone —
which is what makes it both a usable benchmark feed and an
oracle-checkable query (the driver's DuckDB side replays the same
integer arithmetic over ``range(n)``).

This is the slow path by construction (rows cross the Python->JVM
boundary); it exists as the EXTENSIBILITY surface — a template for
mounting feeds Spark has no native connector for — not as a data path
competitor to the parquet/ORC scans.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Deterministic event-type wheel (index = event_id % 4).
EVENT_TYPES: Sequence[str] = ("click", "view", "purchase", "refund")

#: Knuth multiplicative-hash constant / LCG constants — fixed, public,
#: and exactly replayable in any engine with 64-bit integer arithmetic.
_USER_MULT = 2654435761
_AMT_MULT = 1103515245
_AMT_ADD = 12345


def synth_row(i: int) -> tuple[int, int, str, int]:
    """The single-row formula: pure bigint arithmetic on the row index."""
    return (
        i,
        (i * _USER_MULT) % 97,
        EVENT_TYPES[i % 4],
        (i * _AMT_MULT + _AMT_ADD) % 10000,
    )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 10_000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        # Contiguous row-index ranges: partition p covers
        # [p*n/P, (p+1)*n/P) — balanced to within one row, and the
        # planner schedules one Python worker per range.
        return [InputPartition(p) for p in range(self.num_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        p = partition.value
        start = p * self.n_rows // self.num_partitions
        end = (p + 1) * self.n_rows // self.num_partitions
        for i in range(start, end):
            yield synth_row(i)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("n_rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, amount_cents bigint"

    def reader(self, schema) -> SyntheticEventsReader:  # noqa: ARG002
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
