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


def next_event_examples(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    token_col: str = "event_type",
    context: int = 3,
    tie_breakers: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Supervised (context -> next) training examples from per-user
    event sequences — the behavioral analogue of next-token-prediction
    data generation (session-based recommendation, churn sequence
    models).

    For each event with at least ``context`` predecessors in its
    user's stream, emit the ``context`` previous tokens (oldest first,
    space-joined) and the current token as the target. Events earlier
    than position ``context`` produce no example (full-context
    examples only — no padding tokens to keep the contract, and the
    oracle, trivial).

    One shuffle + sort per user key serves ALL ``context`` lag columns
    (a single window spec), then a null filter — the same single-
    window discipline as `sessionize`. Determinism requires (ts,
    tie_breakers) unique per user. Output: (user_col, tie_breakers...,
    ts_col, context_text, target).
    """
    if context < 1:
        raise ValueError(f"context must be >= 1: {context}")
    w = Window.partitionBy(user_col).orderBy(ts_col, *tie_breakers)
    tok = F.col(token_col)
    lags = [F.lag(tok, i).over(w) for i in range(context, 0, -1)]
    out = df.select(
        F.col(user_col),
        *[F.col(c) for c in tie_breakers],
        F.col(ts_col),
        tok.alias("target"),
        *[c.alias(f"__l{i}") for i, c in enumerate(lags)],
    )
    # all `context` lags present <=> no null in the lag array (handles
    # both the stream head and null tokens uniformly)
    full = out.filter(
        F.size(
            F.array_compact(F.array(*[f"__l{i}" for i in range(context)]))
        )
        == context
    )
    return full.select(
        user_col,
        *tie_breakers,
        ts_col,
        F.concat_ws(" ", *[f"__l{i}" for i in range(context)]).alias(
            "context_text"
        ),
        "target",
    )
