"""Time-series resampling operators: dense calendar gap-fill and
last-observation-carried-forward (LOCF).

The reference's gold table is a *latest state per key* rollup
(``notebooks/04_Current_Inventory.sql:14-17``); the natural companion
for dashboards over the same event feed is a *dense* per-bucket series
where silent periods still produce a row. This module builds that as a
pure DataFrame composition:

1. aggregate events into integer time buckets (map-side partial — one
   shuffle keyed by (series, bucket));
2. build the dense bucket spine with ``sequence()`` + ``explode`` over
   the distinct series keys (spine size = |series| × |buckets| — a
   dimension, broadcast-joinable, never proportional to the events);
3. left-join the aggregates onto the spine;
4. fill gaps with an ``last(..., ignorenulls)`` running window per
   series.

Scale notes: the spine join broadcasts (the spine is tiny next to the
fact), and the only window runs over the *spine*, not the raw events —
|series| × |buckets| rows. With few series the LOCF window has few
partitions; for wide deployments split the window per (series,
coarse-period) and seed each period with the previous period's closing
value (two-pass LOCF) — the seam is documented at the call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bucketed_series", "decayed_sum", "gapfill_locf"]


def bucketed_series(
    df: DataFrame,
    series_col: str,
    ts: Column,
    value: Column,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Aggregate ``value`` (integer-valued expression) into
    ``bucket_seconds`` buckets per series: one map-side-partial
    aggregation. Output ``(series, bucket, bucket_value)`` where
    ``bucket`` is the integer epoch-bucket index."""
    # floor of the FRACTIONAL epoch seconds: a cast-to-long first would
    # truncate toward zero and put 1969-12-31T23:59:59.5 in bucket 0
    # instead of bucket -1 (ANSI floor semantics, matching the oracle)
    bucket = F.floor(ts.cast("double") / F.lit(float(bucket_seconds))).cast("long")
    return df.groupBy(
        F.col(series_col).alias("series"), bucket.alias("bucket")
    ).agg(F.sum(value.cast("long")).alias("bucket_value"))


def gapfill_locf(
    df: DataFrame,
    series_col: str,
    ts: Column,
    value: Column,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Dense gap-filled series with LOCF.

    Buckets ``df`` per (series, bucket), then emits one row for EVERY
    bucket between the global min and max bucket for every series.
    Buckets with no events get ``bucket_value = 0``, ``filled = true``
    and carry the last observed ``locf_value`` forward (NULL-leading
    buckets before a series' first observation coalesce to 0).

    Output: ``(series, bucket, bucket_ts, bucket_value, locf_value,
    filled)`` — ``bucket_ts`` is the bucket start as a timestamp.
    """
    # The bucket aggregate is referenced three times (bounds, distinct
    # series, the spine join); materialize it once (lazy local
    # checkpoint) so the fact table is scanned ONCE, not per reference
    # — at production scale the raw-event scan is the dominant cost.
    agg = bucketed_series(df, series_col, ts, value, bucket_seconds).localCheckpoint(
        eager=False
    )
    bounds = agg.select(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = (
        agg.select("series")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "series",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("series")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dense = spine.join(agg, ["series", "bucket"], "left")
    return dense.select(
        "series",
        "bucket",
        F.timestamp_seconds(F.col("bucket") * bucket_seconds).alias("bucket_ts"),
        F.coalesce(F.col("bucket_value"), F.lit(0)).cast("long").alias("bucket_value"),
        F.coalesce(
            F.last(F.col("bucket_value"), ignorenulls=True).over(w), F.lit(0)
        )
        .cast("long")
        .alias("locf_value"),
        F.col("bucket_value").isNull().alias("filled"),
    )


def decayed_sum(
    df: DataFrame,
    series_col: str,
    ts: Column,
    value: Column,
    bucket_seconds: int = 3600,
    seg_len: int = 42,
) -> DataFrame:
    """Exponentially time-decayed running sum per series — the EWMA /
    trending-score primitive (Redis-style decayed counters, recency-
    weighted activity ranking): at each active bucket ``i``,

        decayed_i = sum over j <= i of bucket_value_j * 2^(j - i)

    i.e. half-life = exactly one bucket; callers pick the half-life by
    picking ``bucket_seconds``. Contributions older than one segment
    boundary (>= ``seg_len`` buckets, weight <= 2^-42 ~ 2e-13) are
    truncated — part of the operator contract, below double ulp of any
    practically nonzero score.

    Determinism at the bit level (what makes a value-hash oracle
    possible — float window sums are NOT portable across engines
    because association order differs): every intermediate is either
    exact BIGINT arithmetic or an exact power-of-two scaling of it.
    Buckets are integer epoch indexes; within a segment (``idx div
    seg_len``) the weighted term is ``bucket_value << pos`` (pos = idx
    mod seg_len <= 41, |bucket_value| < 2^20 enforced, so terms and
    their running sum stay inside BIGINT); the running sum is integer
    (association-free); the final rescale divides by ``1 << pos`` —
    doubles change exponent only, never mantissa. The one-segment-back
    carry is the previous segment's plain integer SUM, rescaled twice
    the same way. One IEEE addition joins them, in a fixed order.

    Plan shape: one map-side-partial aggregation into buckets, ONE
    shuffle keyed (series, segment) shared by the running-sum window
    and the segment totals, a lag over the segment-level table
    (|series| x |segments| — dimension-sized), and a broadcast join
    back. No per-event window, no float accumulation anywhere.

    Output: ``(series, bucket, bucket_value, decayed)`` for ACTIVE
    buckets only (a dense spine is :func:`gapfill_locf`'s job).
    """
    # the segment sum is bounded by limit * (2^seg_len - 1) and the
    # shifted term by limit << (seg_len - 1); both must stay < 2^62, so
    # the admissible magnitude is 2^(62 - seg_len) — NOT a fixed 2^20,
    # which is only the seg_len=42 instance of the bound. A seg_len
    # >= 43 silently shrinks headroom; >= 62 leaves none at all.
    if not 1 <= seg_len <= 61:
        raise ValueError(f"decayed_sum: seg_len must be in [1, 61], got {seg_len}")
    limit = 1 << (62 - seg_len)
    b = bucketed_series(df, series_col, ts, value, bucket_seconds)
    b = b.withColumn(
        "bucket_value",
        F.when(
            F.abs(F.col("bucket_value")) >= limit,
            F.raise_error(
                F.concat(
                    F.lit(f"decayed_sum: |bucket_value| >= 2^{62 - seg_len}"
                          " at bucket "),
                    F.col("bucket").cast("string"),
                    F.lit(" — use a smaller bucket_seconds or pre-scale"),
                )
            ).cast("long"),
        ).otherwise(F.col("bucket_value")),
    )
    b = b.select(
        "series",
        "bucket",
        "bucket_value",
        (F.col("bucket") - _floordiv(F.col("bucket"), seg_len) * seg_len).alias(
            "pos"
        ),
        _floordiv(F.col("bucket"), seg_len).alias("seg"),
    ).withColumn(
        "term",
        F.expr("shiftleft(bucket_value, cast(pos as int))"),
    )
    run = Window.partitionBy("series", "seg").orderBy("pos")
    n = b.withColumn("n_run", F.sum("term").over(run))
    segs = b.groupBy("series", "seg").agg(F.sum("term").alias("seg_sum"))
    lagw = Window.partitionBy("series").orderBy("seg")
    carry = segs.select(
        "series",
        "seg",
        F.lag("seg_sum").over(lagw).alias("prev_sum"),
        F.lag("seg").over(lagw).alias("prev_seg"),
    )
    pow2 = "cast(shiftleft(cast(1 as bigint), cast(pos as int)) as double)"
    pow2_seg = f"cast(shiftleft(cast(1 as bigint), {seg_len}) as double)"
    return (
        n.join(carry, ["series", "seg"], "left")
        .withColumn(
            "decayed",
            F.expr(f"cast(n_run as double) / {pow2}")
            + F.when(
                F.col("prev_seg") == F.col("seg") - 1,
                F.expr(
                    f"cast(prev_sum as double) / {pow2_seg} / {pow2}"
                ),
            ).otherwise(F.lit(0.0)),
        )
        .select("series", "bucket", "bucket_value", "decayed")
    )


def _floordiv(c: Column, k: int) -> Column:
    """Floor division by a positive constant (matches DuckDB ``//``
    for negative numerators too, unlike BIGINT ``div`` which truncates
    toward zero)."""
    return F.floor(c / F.lit(float(k))).cast("long")
