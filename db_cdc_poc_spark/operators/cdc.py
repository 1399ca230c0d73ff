"""CDC apply — the engine's re-expression of DLT ``apply_changes``.

The reference upserts a Debezium changelog into a keyed silver table with
``dlt.apply_changes(keys=['item_id','store_id'], sequence_by='ts_ms',
apply_as_deletes op='d', except_column_list=[...])``
(reference: notebooks/03_Data_Ingestion.py:318-326). OSS Spark has no
one-liner for this; this module provides the batch operator, and
``db_cdc_poc_spark.streaming.cdc`` provides the incremental/streaming form
on top of it.

Implementation choice — ``groupBy + max_by(struct(*), sequence)`` instead
of a ranking window:

* a window (`row_number() over (partition by keys order by seq desc)`)
  shuffles EVERY changelog row to its key's partition, then sorts;
* `max_by` is a declarative aggregate with a **map-side partial**: each
  input partition first reduces to one candidate row per key locally, so
  the shuffle carries at most (distinct keys x upstream partitions) rows
  instead of all rows. On a 100 TB changelog where each key has many
  versions, that is the difference between shuffling the dataset and
  shuffling roughly the key space.

Ties on the sequence column are broken by ``tie_breakers`` (appended to
the ordering struct), and the ordering is then made TOTAL with the
remaining payload columns; DLT leaves ties unspecified, we make every
outcome deterministic so results are oracle-comparable even on
changelogs that carry conflicting rows at one sequence value.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def latest_by_key(
    df: DataFrame,
    keys: str | Sequence[str],
    sequence_by: str | Sequence[str],
    tie_breakers: str | Sequence[str] = (),
) -> DataFrame:
    """One row per key: the row with the greatest (sequence, tie_breakers).

    Columns and their order are preserved. The ordering is made TOTAL
    by appending the remaining non-key columns (in DataFrame column
    order) behind the caller's ordering columns: two DIFFERENT rows
    sharing a key and identical (sequence, tie_breakers) would
    otherwise resolve by partition/arrival order — nondeterministic
    across runs and engines (the round-10 property sweep found exactly
    that: an upsert and a delete tied on (seq, tiebreak) flipped the
    key's survival). A full tie can now only occur between identical
    rows, where the choice is immaterial. NULL fields order smallest
    in Spark's struct comparison — replay the same rule in oracles if
    tied NULL payloads are possible.

    Implementation: max over ONE struct (ordering columns first, the
    remaining columns behind) rather than ``max_by(payload, ordering)``
    — the same aggregate shape with a map-side partial, but the row is
    not duplicated into two structs, so the per-key candidates carried
    by the shuffle stay ~row-width.
    """
    keys = _as_list(keys)
    order_cols = list(dict.fromkeys(_as_list(sequence_by) + _as_list(tie_breakers)))
    rest = [c for c in df.columns if c not in set(order_cols) | set(keys)]
    m = F.max(F.struct(*[F.col(c) for c in [*order_cols, *rest]]))
    return (
        df.groupBy(*keys)
        .agg(m.alias("__m"))
        .select(
            *[
                F.col(c) if c in keys else F.col("__m").getField(c).alias(c)
                for c in df.columns
            ]
        )
    )


def apply_changes(
    source: DataFrame,
    keys: str | Sequence[str],
    sequence_by: str | Sequence[str],
    apply_as_deletes: Column | str | None = None,
    except_columns: Sequence[str] = (),
    tie_breakers: str | Sequence[str] = (),
) -> DataFrame:
    """Batch CDC apply: latest row per key, deletes applied, bookkeeping
    columns dropped.

    Parameters mirror the reference's call site (03_Data_Ingestion.py:320-326):
      keys                 upsert key columns
      sequence_by          ordering column(s) — e.g. Debezium ts_ms
      apply_as_deletes     boolean Column/SQL string; a key whose LATEST
                           row matches is absent from the result
                           (delete-then-reinsert keeps the reinsert,
                           because only the latest row is consulted)
      except_columns       columns to drop from the output
      tie_breakers         extra ordering columns for deterministic ties
    """
    latest = latest_by_key(source, keys, sequence_by, tie_breakers)
    if apply_as_deletes is not None:
        cond = (
            F.expr(apply_as_deletes)
            if isinstance(apply_as_deletes, str)
            else apply_as_deletes
        )
        latest = latest.filter(~cond)
    drop = [c for c in except_columns if c in latest.columns]
    return latest.drop(*drop) if drop else latest


def apply_changes_scd2(
    source: DataFrame,
    keys: str | Sequence[str],
    sequence_by: str,
    apply_as_deletes: Column | str | None = None,
    except_columns: Sequence[str] = (),
    tie_breakers: str | Sequence[str] = (),
    start_col: str = "__START_AT",
    end_col: str = "__END_AT",
) -> DataFrame:
    """SCD Type 2 history from a changelog — DLT's
    ``apply_changes(..., stored_as_scd_type=2)`` surface (the reference
    runs type 1 at 03_Data_Ingestion.py:318-326; type 2 is the same
    call with versioned output, provided here for parity).

    Every upsert opens a version effective at its sequence value; the
    next change to the key (upsert OR delete) closes it. Delete rows
    close the open version without emitting one. The newest row per
    key, if not a delete, has ``end_col`` NULL (the current version).

    Unlike type 1 (``apply_changes``), no map-side reduction is
    possible: the OUTPUT is the history, so every change row must reach
    its key's partition — one window shuffle on the keys, state per
    key = one lookahead row (lead), memory-flat however long the
    history. Ties on the sequence are broken by ``tie_breakers`` and
    then made TOTAL with the remaining payload columns (same rule as
    :func:`latest_by_key`) so intervals are deterministic and
    oracle-comparable.
    """
    from pyspark.sql import Window

    keys = _as_list(keys)
    order_cols = list(
        dict.fromkeys([sequence_by, *_as_list(tie_breakers)])
    )
    rest = [
        c for c in source.columns if c not in set(order_cols) | set(keys)
    ]
    w = Window.partitionBy(*keys).orderBy(*order_cols, *rest)
    ended = source.withColumn(end_col, F.lead(sequence_by).over(w))
    if apply_as_deletes is not None:
        cond = (
            F.expr(apply_as_deletes)
            if isinstance(apply_as_deletes, str)
            else apply_as_deletes
        )
        ended = ended.filter(~cond)
    out = ended.withColumn(start_col, F.col(sequence_by))
    drop = [c for c in except_columns if c in out.columns]
    cols = [c for c in source.columns if c not in drop] + [start_col, end_col]
    return out.select(*cols)


def derive_changes(
    old: DataFrame,
    new: DataFrame,
    keys: str | Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """The INVERSE of :func:`apply_changes`: given two keyed snapshots
    of the same table, derive the changelog that turns ``old`` into
    ``new`` — snapshot-diff / CDC generation (what a connector emits
    when the source system offers no log, and the audit that proves
    two replicas converged).

    op per key: ``I`` (in new only), ``D`` (in old only), ``U`` (in
    both, any compare column differs under null-safe equality); keys
    equal in both snapshots produce NO row — the changelog is minimal.

    Plan: ONE full outer join on the keys (both sides shuffle-keyed
    the same way; at scale pre-bucket both snapshots on the keys and
    the join is zero-shuffle), column compares are expression-level.
    Output: key columns, ``op``, and ``<col>_old`` / ``<col>_new`` for
    each compare column (NULL on the absent side).
    """
    keys = _as_list(keys)
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    o = old.select(
        *[F.col(c).alias(f"__ko_{c}") for c in keys],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__kn_{c}") for c in keys],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for c in keys:
        eq = F.col(f"__ko_{c}") == F.col(f"__kn_{c}")
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    # compare_cols may legitimately be empty (every column is a key, or
    # an explicit []): no column can differ, so matched keys are never
    # 'U' — only presence changes (I/D) emit rows.
    changed = F.lit(False)
    for c in compare_cols:
        ne = ~(F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")))
        changed = changed | ne
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__ko_{c}"), F.col(f"__kn_{c}")).alias(c)
                for c in keys
            ],
            "op",
            *[f"{c}_old" for c in compare_cols],
            *[f"{c}_new" for c in compare_cols],
        )
    )
