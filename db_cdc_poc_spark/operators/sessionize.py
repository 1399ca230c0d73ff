"""Sessionization — split each user's event stream into sessions at
inactivity gaps (no reference analog; standard clickstream/training-
telemetry surface, SURVEY §2.3 extension space).

Batch form: one ranking window per user — ``lag`` marks gap breaks,
a running sum numbers the sessions. This genuinely needs per-user
ordering, so it is one shuffle + sort on the user key (the window is
the right tool here, unlike latest-per-key where an aggregate wins).

Streaming form (streaming/sessionize.py): the SAME semantics as an
``applyInPandasWithState`` stateful operator — per-user state carries
(last event time, session counter) across micro-batches; parity with
the batch form is asserted in tests for chronologically-arriving
batches (online sessionization is order-sensitive by nature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tie_breakers: tuple[str, ...] = ("event_id",),
    session_col: str = "session_seq",
) -> DataFrame:
    """Add a 1-based per-user session number; a new session starts when
    the gap since the user's previous event exceeds ``gap_seconds``.
    Deterministic given (ts, tie_breakers) unique per user."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *tie_breakers)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    brk = (prev.isNull() | ((us - prev) > gap_seconds * 1_000_000)).cast("int")
    seq = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, seq.cast("int"))


def session_summary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tie_breakers: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """One row per (user, session): event count and time span."""
    s = sessionize(df, user_col, ts_col, gap_seconds, tie_breakers)
    return s.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
