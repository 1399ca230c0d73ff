"""Incremental view maintenance: keep a SUM/COUNT aggregate current
from a CDC change feed without recomputing it.

The reference recomputes its gold aggregate on a 5-minute trigger
(reference: notebooks/04_Current_Inventory.sql:3); q42 incrementalizes
the keyed-latest form. This module incrementalizes the AGGREGATE form
— the textbook delta rules for distributive aggregates (sum, count):

    insert  (op 'c'/'r'):  +after
    update  (op 'u'):      -before  +after
    delete  (op 'd'):      -before

Signed images aggregate to a per-key delta (small: one row per touched
key), and the delta MERGEs into the stored aggregate —
``operators/merge.py`` supplies the merge, so the update is one
broadcast-able join against the base, inserts open new groups, and a
group whose count reaches zero is deleted. Cost per refresh is
O(|changes|) + a merge touching only changed keys — never O(|base|),
which is what dies first at 100 TB (ARCHITECTURE.md "incremental gold").

AVG/stddev derive from (sum, count, sum-of-squares) columns the same
way. MIN/MAX are only *insert*-monotone — a retracted extreme needs a
rescan of its group — so ``delta_minmax`` applies the delta rule where
it is sound (inserts: ``least``/``greatest`` merge) and falls back to a
keyed rescan of the post-batch fact table ONLY for groups whose
retraction ties the stored extreme (the reference analogue is the gold
``MAX(date_time)`` at notebooks/04_Current_Inventory.sql:17, exactly
the aggregate a sum/count-only IVM cannot maintain under deletes).
Rescan cost is O(|facts in affected keys|) via a semi-join that
partition-prunes when the fact table is laid out by key — never
O(|base|).

Debezium-shaped input: an ``op`` column plus ``before``/``after``
structs carrying keys and measures (schemas.py:CDC_VALUE_SCHEMA).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.merge import merge_into

_INSERT_OPS = ("c", "r")  # create / snapshot-read
_UPDATE_OP = "u"
_DELETE_OP = "d"


def cdc_deltas(
    changes: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
) -> DataFrame:
    """Signed images: (keys..., sign, measures...) — +1 after-images
    for inserts/updates, -1 before-images for updates/deletes. Pure
    map-side (a union of two projections over one scan)."""
    op = F.col(op_col)
    plus = changes.filter(op.isin(*_INSERT_OPS, _UPDATE_OP)).select(
        *[F.col(f"{after_col}.{k}").alias(k) for k in keys],
        F.lit(1).alias("sign"),
        *[F.col(f"{after_col}.{m}").alias(m) for m in measures],
    )
    minus = changes.filter(op.isin(_UPDATE_OP, _DELETE_OP)).select(
        *[F.col(f"{before_col}.{k}").alias(k) for k in keys],
        F.lit(-1).alias("sign"),
        *[F.col(f"{before_col}.{m}").alias(m) for m in measures],
    )
    return plus.unionByName(minus)


def delta_aggregate(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    count_col: str = "n",
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
) -> DataFrame:
    """Refresh ``base`` — a (keys..., n, <sum of each measure>...) table
    — with a Debezium-shaped change batch. Returns the new aggregate;
    equals a full recompute over (T0 + changes) (asserted in
    test_ivm.py, including update and delete-to-zero paths).
    """
    keys = list(keys)
    deltas = cdc_deltas(changes, keys, measures, op_col, before_col, after_col)
    delta_agg = deltas.groupBy(*keys).agg(
        F.sum("sign").cast("long").alias(count_col),
        *[
            F.sum(F.col("sign") * F.col(m)).cast(dict(base.dtypes)[m]).alias(m)
            for m in measures
        ],
    )
    updates = {count_col: f"t.{count_col} + s.{count_col}"}
    updates.update({m: f"t.{m} + s.{m}" for m in measures})
    return merge_into(
        base,
        delta_agg,
        on=keys,
        matched_update=updates,
        matched_delete=f"t.{count_col} + s.{count_col} = 0",
        not_matched_insert=True,
    )


def delta_minmax(
    base: DataFrame,
    changes: DataFrame,
    facts: DataFrame,
    keys: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_col: str = "n",
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
) -> DataFrame:
    """Refresh a (keys..., n, <min/max of each measure>...) table with a
    Debezium-shaped change batch, rescanning only where necessary.

    ``facts`` must be the POST-batch fact table (the source of truth
    after the changes applied — e.g. the output of ``cdc_apply``):
    groups whose retraction ties the stored extreme recompute their
    extremes from it via a broadcast semi-join on just those keys.
    All other groups merge deltas without touching ``facts``:
    inserts fold in with ``least``/``greatest`` (NULL-skipping, so a
    delete-only batch leaves the stored value), deletes of non-extreme
    values are no-ops by definition, and a group whose count reaches
    zero is deleted. Equals a full recompute over the post-batch facts
    (asserted in test_ivm.py, incl. delete-of-current-extreme).
    """
    keys = list(keys)
    min_cols = list(min_cols)
    max_cols = list(max_cols)
    measures = list(dict.fromkeys([*min_cols, *max_cols]))
    deltas = cdc_deltas(changes, keys, measures, op_col, before_col, after_col)
    ins = F.col("sign") == 1
    rem = F.col("sign") == -1
    aggs = [F.sum("sign").cast("long").alias("__dn")]
    for m in min_cols:
        aggs.append(F.min(F.when(ins, F.col(m))).alias(f"__insmin__{m}"))
        aggs.append(F.min(F.when(rem, F.col(m))).alias(f"__delmin__{m}"))
    for m in max_cols:
        aggs.append(F.max(F.when(ins, F.col(m))).alias(f"__insmax__{m}"))
        aggs.append(F.max(F.when(rem, F.col(m))).alias(f"__delmax__{m}"))
    delta_agg = deltas.groupBy(*keys).agg(*aggs)

    touched = delta_agg.join(base, keys, "left")
    existing = F.col(count_col).isNotNull()
    new_n = F.coalesce(F.col(count_col), F.lit(0)) + F.col("__dn")
    drop = new_n == 0
    # rescan iff a retraction ties (or, defensively, beats) the stored
    # extreme of a surviving existing group — deleting a non-extreme
    # value can't move min/max
    hit = F.lit(False)
    for m in min_cols:
        hit = hit | (F.col(f"__delmin__{m}") <= F.col(m))
    for m in max_cols:
        hit = hit | (F.col(f"__delmax__{m}") >= F.col(m))
    needs_rescan = existing & ~drop & F.coalesce(hit, F.lit(False))
    touched = touched.withColumn("__rescan", needs_rescan).localCheckpoint(
        eager=False
    )  # reused by the rescan-key probe and the final merge source

    overlap = set(min_cols) & set(max_cols)
    if overlap:
        raise ValueError(
            f"columns {sorted(overlap)} listed as both min and max; "
            "store them under two differently-named columns"
        )

    rescan_keys = touched.filter(F.col("__rescan")).select(*keys)
    rs_aggs = [F.min(m).alias(f"__rs__{m}") for m in min_cols]
    rs_aggs += [F.max(m).alias(f"__rs__{m}") for m in max_cols]
    rescan_vals = (
        facts.join(F.broadcast(rescan_keys), keys, "left_semi")
        .groupBy(*keys)
        .agg(*rs_aggs, F.first(F.lit(True)).alias("__rs_hit"))
    )

    # new-key groups that net to zero within the batch are pure no-ops
    upd = touched.join(rescan_vals, keys, "left").filter(existing | ~drop)
    out_cols = [*keys, new_n.cast("long").alias(count_col)]
    for m in measures:
        base_type = dict(base.dtypes)[m]
        merged = (
            F.least(F.col(m), F.col(f"__insmin__{m}"))
            if m in min_cols
            else F.greatest(F.col(m), F.col(f"__insmax__{m}"))
        )
        final = F.when(F.col("__rs_hit"), F.col(f"__rs__{m}")).otherwise(merged)
        out_cols.append(final.cast(base_type).alias(m))
    out_cols.append(drop.alias("__drop"))
    src = upd.select(*out_cols)

    updates = {count_col: f"s.{count_col}"}
    updates.update({m: f"s.{m}" for m in measures})
    return merge_into(
        base,
        src,
        on=keys,
        matched_update=updates,
        matched_delete="s.__drop",
        not_matched_insert=True,
    )
