"""Generic MERGE INTO — the lakehouse upsert statement as a set-based
DataFrame transform.

Delta/Iceberg expose ``MERGE INTO target USING source ON keys WHEN
MATCHED [AND cond] THEN UPDATE/DELETE WHEN NOT MATCHED THEN INSERT``;
plain Spark has no statement for it, but the semantics are exactly ONE
full-outer join keyed on the merge keys plus per-column conditional
projection — which is how the engines execute it too (minus their
file-level pruning). This operator is the batch form; the streaming
keyed upsert (``streaming/cdc.CdcTarget``) is the incremental cousin
with bucketed state rewrite.

Scale shape: one shuffle of each side on the merge keys (or a broadcast
of the source when it's dim-sized — Catalyst/AQE decide, and callers
can wrap the source in ``F.broadcast``). No windows, no second pass;
every clause is a codegen'd CASE over the joined row. SQL MERGE
requires the source to match at most one target row per key; like the
engines we raise on duplicate source keys only when asked
(``validate_unique``) since the check costs an extra aggregate pass.

Expressions are SQL strings resolved against the joined plan with the
target aliased ``t`` and the source aliased ``s`` (e.g.
``"t.balance + s.delta"``) — the same mental model as the SQL
statement.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str | Sequence[str],
    *,
    matched_update: Mapping[str, str] | None = None,
    matched_delete: str | None = None,
    not_matched_insert: Mapping[str, str] | bool = False,
    validate_unique: bool = False,
) -> DataFrame:
    """Merge ``source`` into ``target``; returns the merged table with
    the target's schema.

    matched_update       {target_col: sql_expr} applied when a source
                         row matches (and ``matched_delete`` doesn't
                         fire); unlisted columns keep target values
    matched_delete       sql_expr over t/s — matched rows where it's
                         true are removed
    not_matched_insert   True (insert source values by column name),
                         or {target_col: sql_expr}; unlisted columns
                         are NULL; False drops unmatched source rows
    validate_unique      raise if the source has duplicate merge keys
                         (costs one aggregate pass over the source)
    """
    keys = [on] if isinstance(on, str) else list(on)
    if validate_unique:
        dup = source.groupBy(*keys).count().filter(F.col("count") > 1)
        bad = dup.limit(1).collect()
        if bad:
            raise ValueError(f"merge source has duplicate keys, e.g. {bad[0]}")

    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(
        s, [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys], "full_outer"
    )

    matched = F.col(f"t.{keys[0]}").isNotNull() & F.col(f"s.{keys[0]}").isNotNull()
    t_only = F.col(f"s.{keys[0]}").isNull()
    s_only = F.col(f"t.{keys[0]}").isNull()

    # Row survival: target-only rows always survive; matched rows unless
    # the delete clause fires; source-only rows only when inserting.
    keep = t_only
    if matched_delete is not None:
        keep = keep | (matched & ~F.coalesce(F.expr(matched_delete), F.lit(False)))
    else:
        keep = keep | matched
    if not_matched_insert:
        keep = keep | s_only

    update = dict(matched_update or {})
    insert: Mapping[str, str] = {}
    if not_matched_insert is True:
        insert = {c: f"s.{c}" for c in source.columns if c in target.columns}
    elif not_matched_insert:
        insert = dict(not_matched_insert)

    out_cols = []
    for c in target.columns:
        base = F.col(f"t.{c}")
        if c in keys:
            expr = F.coalesce(base, F.col(f"s.{c}"))
        else:
            expr = base
            if c in update:
                expr = F.when(matched, F.expr(update[c])).otherwise(expr)
            if c in insert:
                expr = F.when(s_only, F.expr(insert[c]).cast(target.schema[c].dataType)).otherwise(expr)
        out_cols.append(expr.alias(c))

    return joined.filter(keep).select(*out_cols)
