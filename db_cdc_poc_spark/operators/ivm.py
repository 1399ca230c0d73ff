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
way; MIN/MAX are NOT delta-maintainable under deletes (a retracted
maximum needs a rescan) — callers get sums and counts only, by design.

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
