"""Multi-writer contract for the streaming dedup index (VERDICT r11
ask #4): a second concurrent appender is DETECTED AND REFUSED, a
displaced writer is FENCED before it can append, and the sequential
patterns every existing soak exercises (re-fires, resumed instances)
still work unchanged."""

from __future__ import annotations

import pytest

from db_cdc_poc_spark.streaming.dedup_index import StreamingDedupIndex
from db_cdc_poc_spark.streaming.lease import (
    ConcurrentWriterError,
    WriterFencedError,
    WriterLease,
)


def _docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def _mk(path, **kw):
    return StreamingDedupIndex(
        path, num_hashes=16, bands=4, threshold=0.5, num_buckets=4,
        compact_every=None, **kw,
    )


def test_second_concurrent_writer_refused(spark, tmp_path):
    path = str(tmp_path / "ix")
    a = _mk(path)
    b = _mk(path)
    a.acquire_writer_lease()  # long-lived ingest loop holds the lease
    a.process_batch(_docs(spark, [(1, "alpha beta gamma delta eps")]))
    with pytest.raises(ConcurrentWriterError):
        b.process_batch(_docs(spark, [(2, "zeta eta theta iota kappa")]))
    with pytest.raises(ConcurrentWriterError):
        b.acquire_writer_lease()
    a.release_writer_lease()
    # after release, b proceeds normally
    out = b.process_batch(_docs(spark, [(2, "zeta eta theta iota kappa")]))
    assert out.count() == 1


def test_forced_takeover_fences_displaced_writer(spark, tmp_path):
    path = str(tmp_path / "ix")
    a = _mk(path)
    b = _mk(path)
    a.acquire_writer_lease()
    b.acquire_writer_lease(force=True)  # operator override
    # a's next mutating call must abort BEFORE appending
    with pytest.raises(WriterFencedError):
        a.process_batch(_docs(spark, [(1, "alpha beta gamma delta eps")]))
    # and the index holds only b's subsequent work
    b.process_batch(_docs(spark, [(2, "zeta eta theta iota kappa")]))
    bands = a.state.state_for(spark)
    assert {r.id for r in bands.select("id").distinct().collect()} == {2}
    b.release_writer_lease()


def test_sequential_writers_and_refires_unaffected(spark, tmp_path):
    """The existing soak patterns: per-batch transient acquire/release
    means resumed instances and sequential re-fires never block."""
    path = str(tmp_path / "ix")
    first = _mk(path)
    first.process_batch(_docs(spark, [(1, "alpha beta gamma delta eps")]))
    resumed = _mk(path)  # new instance, same process — no explicit release
    out = resumed.process_batch(_docs(spark, [(2, "alpha beta gamma delta eps")]))
    rows = {r.id: r.is_novel for r in out.collect()}
    assert rows == {2: False}  # still probes first's index state


def test_lease_reclaim_after_ttl(tmp_path):
    now = [0.0]
    a = WriterLease(tmp_path / "lease.json", ttl=10.0, clock=lambda: now[0])
    b = WriterLease(tmp_path / "lease.json", ttl=10.0, clock=lambda: now[0])
    # simulate a vanished remote holder: a's pid looks alive locally,
    # so hand-edit the state to a foreign host (pid probing impossible)
    t_a = a.acquire()
    state = a.read_state()
    a._write({**state, "host": "other-host", "pid": 1})
    now[0] = 5.0
    with pytest.raises(ConcurrentWriterError):
        b.acquire()
    now[0] = 10.0  # TTL elapsed
    t_b = b.acquire()
    assert t_b == t_a + 1  # fencing token advanced
    with pytest.raises(WriterFencedError):
        a.check()


def test_dead_holder_reclaimed_same_host(tmp_path):
    a = WriterLease(tmp_path / "lease.json", ttl=1e9)
    a.acquire()
    state = a.read_state()
    a._write({**state, "pid": 2**22 + 12345})  # nonexistent pid
    b = WriterLease(tmp_path / "lease.json", ttl=1e9)
    b.acquire()  # no error: holder provably dead
    with pytest.raises(WriterFencedError):
        a.check()
