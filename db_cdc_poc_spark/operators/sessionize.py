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


def last_touch_attribution(
    df: DataFrame,
    conversion_type: str,
    touch_types: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    window_seconds: int = 7 * 86400,
) -> DataFrame:
    """Last-touch attribution: each conversion event credited to the
    LATEST preceding touch event (of any ``touch_types``) by the same
    user within ``window_seconds`` — the standard marketing/growth
    attribution rule, and the per-user carry-forward join shape every
    "what caused this event" analysis needs.

    Plan: one window per user ordered by (ts, id):
    ``last(touch_struct, ignorenulls=True)`` carries the most recent
    touch forward (a touch AT the conversion timestamp orders after it
    only if its id is higher — the (ts, id) tie-break is deterministic
    and documented, and applies identically in the oracle). Conversions
    whose carried touch is older than the window (or absent) attribute
    to NULL. One shuffle on the user key; no self-join, no range join —
    at 100 TB this is the same cost as a sessionize pass.

    Output: (event_id, user_id, conv_us, touch_event_id, touch_type,
    age_us) — ``age_us`` NULL when unattributed.
    """
    us = F.unix_micros(F.col(ts_col))
    tagged = df.select(
        F.col(id_col),
        F.col(user_col),
        F.col(type_col),
        us.alias("us"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("us", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(
        F.col(type_col).isin(list(touch_types)),
        F.struct(F.col("us").alias("t_us"), F.col(id_col).alias("t_id"),
                 F.col(type_col).alias("t_type")),
    )
    carried = tagged.withColumn("last_touch", F.last(touch, ignorenulls=True).over(w))
    conv = carried.filter(F.col(type_col) == conversion_type)
    in_window = (
        F.col("last_touch").isNotNull()
        & (F.col("us") - F.col("last_touch.t_us") <= window_seconds * 1_000_000)
    )
    return conv.select(
        F.col(id_col),
        F.col(user_col),
        F.col("us").alias("conv_us"),
        F.when(in_window, F.col("last_touch.t_id")).alias("touch_event_id"),
        F.when(in_window, F.col("last_touch.t_type")).alias("touch_type"),
        F.when(in_window, F.col("us") - F.col("last_touch.t_us")).alias("age_us"),
    )
