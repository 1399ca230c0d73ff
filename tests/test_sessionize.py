"""Sessionization: batch window form vs the applyInPandasWithState
streaming fold. The streaming form must equal the batch form when each
user's events arrive across micro-batches in chronological order."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.sessionize import session_summary, sessionize
from db_cdc_poc_spark.sources.testdata import load_table
from db_cdc_poc_spark.streaming.sessionize import stream_sessionize

from .conftest import SF_DIR


def test_sessionize_known_gaps(spark):
    rows = [
        (1, 10, "2024-01-01 10:00:00"),
        (1, 11, "2024-01-01 10:10:00"),   # same session (10 min)
        (1, 12, "2024-01-01 11:30:00"),   # new session (80 min gap)
        (2, 20, "2024-01-01 10:00:00"),   # separate user
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string"
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"))
    got = {
        r.event_id: r.session_seq for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert got == {10: 1, 11: 1, 12: 2, 20: 1}
    summary = {
        (r.user_id, r.session_seq): r.n_events
        for r in session_summary(df, gap_seconds=1800).collect()
    }
    assert summary == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_stream_sessionize_matches_batch_across_chronological_batches(spark):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_id", "ts")
    # stage 3 files split at global time boundaries; force mtime order so
    # the file source drains them chronologically (one per micro-batch)
    lo, hi = ev.selectExpr(
        "percentile(unix_micros(ts), 0.33)", "percentile(unix_micros(ts), 0.66)"
    ).collect()[0]
    base = tempfile.mkdtemp(prefix="sess_stream_")
    root = f"{base}/events"
    os.makedirs(root)
    parts = [
        ev.filter(F.unix_micros("ts") <= lo),
        ev.filter((F.unix_micros("ts") > lo) & (F.unix_micros("ts") <= hi)),
        ev.filter(F.unix_micros("ts") > hi),
    ]
    files = []
    for i, p in enumerate(parts):
        staging = f"{base}/staging{i}"
        p.coalesce(1).write.parquet(staging)
        [f] = [x for x in os.listdir(staging) if x.endswith(".parquet")]
        dst = f"{root}/{i:02d}.parquet"
        os.rename(f"{staging}/{f}", dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        files.append(dst)
    got = {
        (r.user_id, r.event_id): r.session_seq
        for r in stream_sessionize(
            spark, root, gap_seconds=1800, max_files_per_trigger=1
        ).collect()
        if r.event_id is not None
    }
    want = {
        (r.user_id, r.event_id): r.session_seq
        for r in sessionize(
            spark.read.parquet(*files), gap_seconds=1800
        ).collect()
    }
    assert got == want
