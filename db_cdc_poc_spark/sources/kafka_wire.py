"""Kafka-wire-shaped streaming source over files (S3/S4 behavioral
parity; VERDICT r10 ask #6).

``sources/kafka.py`` mirrors the reference's Kafka OPTION surface
(reference: notebooks/03_Data_Ingestion.py:139-160), but this sandbox
has no broker, so those options were only config-string-tested. This
module makes them BEHAVIORAL: a Spark 4 Python Data Source
(``spark.readStream.format("kafka_wire")``) over a file-backed topic
log that honors the documented Kafka semantics for

* ``startingOffsets`` — ``earliest`` | ``latest`` | explicit JSON
  ``{"0": 5, "1": 0}`` (per-partition next offset). ``latest`` means
  records appended BEFORE the stream starts are never read.
* ``maxOffsetsPerTrigger`` — total per-micro-batch record cap, split
  across partitions PROPORTIONALLY to their lag: floor per partition,
  then the floored remainder handed out one offset at a time
  (zero-alloc lagging partitions first, then largest fractional
  share), so at least 1 for any lagging partition when the cap allows
  and GUARANTEED progress every trigger while lag exists — the same
  rate-limit shape as Spark's Kafka connector. (The round-11 pure
  floor stalled permanently when cap < number of lagging partitions.)
* ``failOnDataLoss`` — when retention pruned records the stream still
  needs (start offset < earliest available), ``true`` raises,
  ``false`` skips forward to the earliest available offset.

The log is a directory per topic: ``<path>/p=<k>/<start>-<end>.jsonl``
immutable segment files (offsets end-exclusive), one dir per Kafka
partition — append with :func:`append_records`, simulate retention
with :func:`prune_segments`. Output schema mirrors the Kafka source:
(key string, value string, topic string, partition int, offset
bigint, timestamp_us bigint) — epoch-µs, the F7 conversion's input.

Scale shape: one ``InputPartition`` per Kafka partition per
micro-batch, so a 1000-executor cluster fans out exactly like the real
connector; segment files are scanned per-partition, never listed
globally on the hot path beyond the offset probe (directory listing of
filenames only — offsets live in the names).

This is the parity/test surface: wire a real broker through
``sources/kafka.py`` in production.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "key string, value string, topic string, partition int, "
    "offset bigint, timestamp_us bigint"
)


# -- log helpers (producer side) -------------------------------------------


def _pdir(path: str | Path, partition: int) -> Path:
    return Path(path) / f"p={partition}"


def _segments(pdir: Path) -> list[tuple[int, int, Path]]:
    """(start, end, file) per segment, offset-ordered. Segment files
    are immutable and named ``<start>-<end>.jsonl``; a torn concurrent
    write is invisible because files are created via rename."""
    out = []
    if pdir.is_dir():
        for f in pdir.iterdir():
            stem = f.name
            if not stem.endswith(".jsonl"):
                continue
            a, _, b = stem[: -len(".jsonl")].partition("-")
            try:
                out.append((int(a), int(b), f))
            except ValueError:
                continue
    return sorted(out)


def _bounds(pdir: Path) -> tuple[int, int]:
    """(earliest available offset, end offset) — (0, 0) for an empty
    partition; earliest > 0 after retention pruning."""
    segs = _segments(pdir)
    if not segs:
        return (0, 0)
    return (segs[0][0], segs[-1][1])


def append_records(
    path: str | Path,
    partition: int,
    records: Sequence[tuple[str | None, str, int]],
) -> tuple[int, int]:
    """Append (key, value, timestamp_us) records to a partition log;
    returns the written (start, end) offset range. One immutable
    segment file per call, committed by rename (a reader never sees a
    half-written segment)."""
    pdir = _pdir(path, partition)
    pdir.mkdir(parents=True, exist_ok=True)
    start = _bounds(pdir)[1]
    end = start + len(records)
    if not records:
        return (start, start)
    tmp = pdir / f".{start}-{end}.jsonl.tmp"
    with open(tmp, "w") as f:
        for i, (k, v, ts) in enumerate(records):
            f.write(
                json.dumps(
                    {"offset": start + i, "key": k, "value": v, "ts": int(ts)}
                )
                + "\n"
            )
    os.replace(tmp, pdir / f"{start}-{end}.jsonl")
    return (start, end)


def prune_segments(path: str | Path, partition: int, upto: int) -> int:
    """Simulate log retention: drop whole segments whose END <= upto.
    Returns the number of segments removed."""
    n = 0
    for _, end, f in _segments(_pdir(path, partition)):
        if end <= upto:
            f.unlink()
            n += 1
    return n


def _list_partitions(path: str | Path) -> list[int]:
    root = Path(path)
    if not root.is_dir():
        return []
    out = []
    for d in root.iterdir():
        if d.is_dir() and d.name.startswith("p="):
            try:
                out.append(int(d.name[2:]))
            except ValueError:
                continue
    return sorted(out)


class DataLossError(RuntimeError):
    """failOnDataLoss=true and retention pruned offsets the stream
    still needs — same contract as the Kafka connector's abort."""


# -- the streaming reader ----------------------------------------------------


class _WirePartition(InputPartition):
    def __init__(self, partition: int, start: int, end: int, path: str, topic: str):
        self.partition = partition
        self.start = start
        self.end = end
        self.path = path
        self.topic = topic


class KafkaWireStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path") or options.get("log.dir")
        if not self.path:
            raise ValueError("kafka_wire requires .option('path', <topic dir>)")
        self.topic = options.get("topic", Path(self.path).name)
        self.starting = options.get("startingoffsets", "latest")
        mot = options.get("maxoffsetspertrigger")
        self.max_per_trigger = int(mot) if mot is not None else None
        self.fail_on_data_loss = (
            str(options.get("failondataloss", "true")).lower() == "true"
        )
        self._prev_end: dict[str, int] | None = None
        # initialOffset() is evaluated ONCE per stream start by Spark
        # and checkpointed; cache what we returned so the first
        # latestOffset() rate-limits against the same base instead of
        # re-evaluating (with startingOffsets='latest', a re-eval would
        # see records appended after start as lag 0 and let the first
        # micro-batch bypass maxOffsetsPerTrigger entirely).
        self._initial: dict[str, int] | None = None

    # -- offsets ----------------------------------------------------------

    def _avail(self) -> dict[int, tuple[int, int]]:
        return {
            p: _bounds(_pdir(self.path, p)) for p in _list_partitions(self.path)
        }

    def _compute_initial(self) -> dict:
        avail = self._avail()
        s = self.starting.strip()
        if s == "earliest":
            return {str(p): lo for p, (lo, _) in avail.items()}
        if s == "latest":
            return {str(p): hi for p, (_, hi) in avail.items()}
        explicit = {str(k): int(v) for k, v in json.loads(s).items()}
        # partitions not named start at earliest (connector behavior)
        for p, (lo, _) in avail.items():
            explicit.setdefault(str(p), lo)
        return explicit

    def initialOffset(self) -> dict:
        if self._initial is None:
            self._initial = self._compute_initial()
        return self._initial

    def latestOffset(self) -> dict:
        avail = self._avail()
        base = self._prev_end if self._prev_end is not None else self.initialOffset()
        # new partitions appear at their earliest offset
        start = {
            str(p): base.get(str(p), avail[p][0]) for p in avail
        }
        lag = {p: max(0, avail[p][1] - start[str(p)]) for p in avail}
        total = sum(lag.values())
        if self.max_per_trigger is not None and total > self.max_per_trigger:
            # Kafka's rate limit: split the cap proportionally to lag.
            # Pure flooring can allocate 0 EVERYWHERE (cap < number of
            # lagging partitions) and stall the stream permanently, so
            # the floored remainder is handed out one offset at a time —
            # zero-alloc lagging partitions first, then largest
            # fractional share — guaranteeing progress on every trigger
            # while total lag > 0 and never exceeding the cap.
            cap = self.max_per_trigger
            alloc = {p: lag[p] * cap // total for p in avail}
            # each floor drops a fraction < 1, so remainder < #lagging
            # partitions: one extra offset per partition, in priority
            # order, always exhausts it
            remainder = cap - sum(alloc.values())
            if remainder > 0:
                starved = sorted(
                    (p for p in avail if alloc[p] < lag[p]),
                    key=lambda p: (
                        alloc[p] != 0,  # un-started partitions first
                        -(lag[p] * cap % total),  # largest frac share
                        p,
                    ),
                )
                for p in starved[:remainder]:
                    alloc[p] += 1
            end = {str(p): start[str(p)] + alloc[p] for p in avail}
        else:
            end = {str(p): avail[p][1] for p in avail}
        self._prev_end = end
        return end

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        out = []
        for p_str, e in end.items():
            p = int(p_str)
            s = int(start.get(p_str, 0))
            lo, _ = _bounds(_pdir(self.path, p))
            if s < lo:
                # retention pruned [s, lo): the documented dual contract
                if self.fail_on_data_loss:
                    raise DataLossError(
                        f"partition {p}: offsets [{s}, {lo}) pruned by "
                        "retention and failOnDataLoss=true"
                    )
                s = lo
            if int(e) > s:
                out.append(_WirePartition(p, s, int(e), str(self.path), self.topic))
        return out or [_WirePartition(-1, 0, 0, str(self.path), self.topic)]

    def commit(self, end: dict) -> None:
        # seed the rate-limit base after a RESTART: Spark replays the
        # checkpointed batch (partitions(start, end) straight from the
        # offset log, no latestOffset call) and commits it before the
        # next trigger plans — so folding the committed end here keeps
        # the proportional split measuring true lag, not lag since
        # startingOffsets.
        prev = self._prev_end or {}
        self._prev_end = {
            **prev,
            **{
                k: max(int(v), int(prev.get(k, 0)))
                for k, v in end.items()
            },
        }

    # -- data -------------------------------------------------------------

    def read(self, partition: _WirePartition) -> Iterator[tuple]:
        if partition.partition < 0:
            return
        for seg_start, seg_end, f in _segments(
            _pdir(partition.path, partition.partition)
        ):
            if seg_end <= partition.start or seg_start >= partition.end:
                continue
            with open(f) as fh:
                for line in fh:
                    rec = json.loads(line)
                    o = int(rec["offset"])
                    if partition.start <= o < partition.end:
                        yield (
                            rec.get("key"),
                            rec["value"],
                            partition.topic,
                            partition.partition,
                            o,
                            int(rec["ts"]),
                        )


class KafkaWireDataSource(DataSource):
    """``spark.readStream.format("kafka_wire").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "kafka_wire"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> KafkaWireStreamReader:  # noqa: ARG002
        return KafkaWireStreamReader(
            {str(k).lower(): v for k, v in dict(self.options).items()}
        )


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(KafkaWireDataSource)
