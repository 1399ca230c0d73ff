"""Gap-fill + LOCF: dense spine, fill semantics, leading-gap zeroes,
and the spine-not-events window plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.timeseries import bucketed_series, gapfill_locf


def _ev(spark, rows):
    return spark.createDataFrame(rows, "series string, ts timestamp, v long")


TS0 = dt.datetime(2024, 1, 1, 0, 30)


def _at(hours: float) -> dt.datetime:
    return TS0 + dt.timedelta(hours=hours)


def test_bucketed_series_sums_per_hour(spark):
    df = _ev(
        spark,
        [("a", _at(0), 5), ("a", _at(0.4), 7), ("a", _at(2), 1)],
    )
    got = {
        (r.series, r.bucket): r.bucket_value
        for r in bucketed_series(df, "series", F.col("ts"), F.col("v")).collect()
    }
    base = int(TS0.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert got[("a", base)] == 12
    assert got[("a", base + 2)] == 1
    assert len(got) == 2


def test_gapfill_emits_every_bucket_and_locf(spark):
    df = _ev(
        spark,
        [
            ("a", _at(0), 10),
            ("a", _at(3), 30),  # gap at hours 1-2
            ("b", _at(1), 7),  # b starts after the global lo: leading gap
        ],
    )
    out = gapfill_locf(df, "series", F.col("ts"), F.col("v")).collect()
    rows = {(r.series, r.bucket): r for r in out}
    base = int(TS0.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    # dense: 2 series x 4 buckets (global lo..hi)
    assert len(rows) == 8
    a1 = rows[("a", base + 1)]
    assert (a1.bucket_value, a1.locf_value, a1.filled) == (0, 10, True)
    a3 = rows[("a", base + 3)]
    assert (a3.bucket_value, a3.locf_value, a3.filled) == (30, 30, False)
    # b before its first observation: zero-filled, marked filled
    b0 = rows[("b", base)]
    assert (b0.bucket_value, b0.locf_value, b0.filled) == (0, 0, True)
    b3 = rows[("b", base + 3)]
    assert (b3.bucket_value, b3.locf_value) == (0, 7)
    # bucket_ts is the bucket start
    assert rows[("a", base)].bucket_ts.minute == 0


def test_gapfill_window_runs_on_spine_not_events(spark):
    # the window input must be the dimension-sized spine join, never the
    # raw events: the plan's Window sits above the spine join and the
    # events appear only below the aggregate
    df = _ev(spark, [("a", _at(0), 1), ("a", _at(5), 2)])
    plan = (
        gapfill_locf(df, "series", F.col("ts"), F.col("v"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    # the only row-multiplying joins are the 1-row bounds broadcast and
    # the spine equi-join — never an unbounded cartesian
    assert "CartesianProduct" not in plan


def test_bucketed_series_pre_epoch_fractional_floor(spark):
    # 1969-12-31T23:59:59.5 is epoch -0.5s: floor puts it in bucket -1;
    # a truncate-toward-zero cast would put it in bucket 0
    df = _ev(spark, [("a", dt.datetime(1969, 12, 31, 23, 59, 59, 500000), 7)])
    [r] = bucketed_series(df, "series", F.col("ts"), F.col("v"), 3600).collect()
    assert r.bucket == -1
    assert r.bucket_value == 7
