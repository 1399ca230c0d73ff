"""stats operators: OLS regression vs numpy, one-pass profiler,
median/MAD outliers vs a python reference, plus plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.stats import (
    column_profile,
    group_regression,
    mad_outliers,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "g string, x long, y long")


def test_group_regression_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g, (a, b) in {"u": (3.0, 10.0), "v": (-2.0, 500.0)}.items():
        xs = rng.integers(0, 1000, size=200)
        for x in xs:
            noise = int(rng.integers(-50, 50))
            rows.append((g, int(x), int(round(a * x + b)) + noise))
    got = {
        r.g: r
        for r in group_regression(
            _pts(spark, rows), ["g"], F.col("x"), F.col("y")
        ).collect()
    }
    for g in ("u", "v"):
        xs = np.array([x for gg, x, _ in rows if gg == g], dtype=float)
        ys = np.array([y for gg, _, y in rows if gg == g], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert got[g].n == 200
        assert got[g].slope == pytest.approx(slope, rel=1e-9)
        assert got[g].intercept == pytest.approx(intercept, rel=1e-6)


def test_group_regression_degenerate_groups_null_not_abort(spark):
    # ANSI mode is on for the session: a constant-x group (incl. every
    # single-row group) has denom == 0 and must yield NULL slope /
    # intercept, not a DIVIDE_BY_ZERO job abort
    df = _pts(
        spark,
        [
            ("single", 5, 7),                      # single row
            ("const", 2, 1), ("const", 2, 9),      # constant x
            ("ok", 0, 0), ("ok", 10, 20),          # well-posed
        ],
    )
    got = {
        r.g: r
        for r in group_regression(df, ["g"], F.col("x"), F.col("y")).collect()
    }
    assert got["single"].slope is None and got["single"].intercept is None
    assert got["const"].slope is None and got["const"].intercept is None
    assert got["ok"].slope == pytest.approx(2.0)
    assert got["ok"].intercept == pytest.approx(0.0)


def test_zscore_single_row_group_is_zero(spark):
    # n-1 == 0 under ANSI mode: must fall into the z = 0.0 branch,
    # not abort the job
    from db_cdc_poc_spark.operators.stats import zscore_normalize

    df = spark.createDataFrame(
        [("lone", 1, 42), ("pair", 2, 10), ("pair", 3, 20)],
        "g string, id long, v long",
    )
    out = {r.id: r.z for r in zscore_normalize(df, ["g"], F.col("v")).collect()}
    assert out[1] == 0.0
    assert out[2] == pytest.approx(-0.707107, abs=1e-6)
    assert out[3] == pytest.approx(0.707107, abs=1e-6)


def test_group_regression_single_shuffle_no_window(spark):
    df = _pts(spark, [("a", 1, 2), ("a", 2, 4), ("b", 1, 1), ("b", 3, 2)])
    plan = (
        group_regression(df, ["g"], F.col("x"), F.col("y"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    # partial + final hash aggregate around ONE exchange
    assert plan.count("Exchange") == 1


def test_column_profile_values(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.5)],
        "k long, s string, v double",
    )
    got = {r.column_name: r for r in column_profile(df).collect()}
    assert set(got) == {"k", "s", "v"}
    assert (got["k"].n_nonnull, got["k"].n_distinct) == (3, 2)
    assert (got["k"].min_value, got["k"].max_value) == ("1", "2")
    assert (got["s"].n_nonnull, got["s"].n_distinct) == (2, 2)
    assert (got["v"].n_nonnull, got["v"].n_distinct) == (2, 2)
    assert got["v"].min_value == "5.0"


def test_column_profile_is_single_scan(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    plan = (
        column_profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    # one source scan feeding an Expand (the per-column count_distincts
    # share the pass); never one scan per column
    assert plan.count("Scan ExistingRDD") == 1
    assert "Expand" in plan


def _mad_reference(values, k=3.0):
    v = np.array(sorted(values), dtype=float)
    med = float(np.median(v))
    adev = np.abs(v - med)
    mad = float(np.median(adev))
    out = int((adev > k * 1.4826 * mad).sum())
    return med, mad, out


def test_mad_outliers_matches_reference(spark):
    vals = [10, 12, 11, 13, 12, 11, 10, 500, 12, 11, 13, -400]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    row = mad_outliers(df, ["g"], F.col("v")).collect()[0]
    med, mad, out = _mad_reference(vals)
    assert row.n == len(vals)
    assert row.median_value == pytest.approx(med)
    assert row.mad == pytest.approx(mad)
    assert row.n_outliers == out


def test_mad_outliers_zero_mad_group(spark):
    # constant group: mad == 0, every row equals the median, no outliers
    df = spark.createDataFrame([("c", 7)] * 5, "g string, v long")
    row = mad_outliers(df, ["g"], F.col("v")).collect()[0]
    assert (row.mad, row.n_outliers) == (0.0, 0)


def test_key_skew_report_known_distribution(spark):
    from db_cdc_poc_spark.operators.stats import key_skew_report

    # key 0 is hot (100 rows), keys 1..20 have 5 rows each
    rows = [(0,)] * 100 + [(k,) for k in range(1, 21) for _ in range(5)]
    df = spark.createDataFrame(rows, "k long")
    r = key_skew_report(df, ["k"], top_k=3).collect()[0]
    assert r.n_keys == 21
    assert r.n_rows == 200
    assert r.max_cnt == 100
    assert r.p50_cnt == 5.0
    # top-3 = 100 + 5 + 5 = 110 of 200 rows
    assert r.top3_share_ppm == 1_000_000 * 110 // 200


def test_key_skew_report_no_global_sort(spark):
    from db_cdc_poc_spark.operators.stats import key_skew_report

    df = spark.createDataFrame([(i % 7,) for i in range(100)], "k long")
    plan = (
        key_skew_report(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_quantile_bins_equal_frequency(spark):
    from db_cdc_poc_spark.operators.stats import quantile_bins

    df = spark.createDataFrame([(i, i) for i in range(1000)], "id long, v long")
    out = quantile_bins(df, F.col("v"), n_bins=10).collect()
    sizes = {}
    for r in out:
        sizes[r.bin] = sizes.get(r.bin, 0) + 1
    assert set(sizes) == set(range(10))
    # exact percentiles on a uniform ramp: every decile within 1 row
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # monotone: bin is nondecreasing in v
    by_v = sorted(out, key=lambda r: r.id)
    assert all(a.bin <= b.bin for a, b in zip(by_v, by_v[1:]))


def test_zscore_normalize_matches_numpy(spark):
    import numpy as np

    from db_cdc_poc_spark.operators.stats import zscore_normalize

    rng = np.random.default_rng(13)
    vals = [int(v) for v in rng.integers(0, 10_000, size=300)]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, v long"
    )
    out = {r.id: r.z for r in zscore_normalize(df, ["g"], F.col("v")).collect()}
    arr = np.array(vals, dtype=float)
    std = arr.std(ddof=1)
    for i, v in enumerate(vals):
        assert abs(out[i] - round((v - arr.mean()) / std, 6)) <= 1e-6


def test_zscore_constant_group_is_zero(spark):
    from db_cdc_poc_spark.operators.stats import zscore_normalize

    df = spark.createDataFrame([(i, "c", 42) for i in range(5)], "id long, g string, v long")
    assert all(
        r.z == 0.0 for r in zscore_normalize(df, ["g"], F.col("v")).collect()
    )


def test_transition_pmi_known_sequence(spark):
    import math

    from db_cdc_poc_spark.operators.stats import transition_pmi

    # user 1: a->b, b->a, a->b ; user 2: a->b
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, s string")
    got = {
        (r.from_state, r.to_state): r
        for r in transition_pmi(df, ["u"], F.col("s"), ["t"]).collect()
    }
    # transitions: (a,b)x3, (b,a)x1 ; N=4; n_a·=3, n_b·=1; n_·b=3, n_·a=1
    assert got[("a", "b")].n == 3
    assert got[("b", "a")].n == 1
    assert got[("a", "b")].pmi == round(math.log(3 * 4 / (3 * 3)), 5)
    assert got[("b", "a")].pmi == round(math.log(1 * 4 / (1 * 1)), 5)


def test_scalable_running_sum_matches_global_window(spark):
    from pyspark.sql import Window

    from db_cdc_poc_spark.operators.stats import scalable_running_sum

    rows = [(i * 7 % 101, (i % 13) - 3) for i in range(101)]  # unique keys
    df = spark.createDataFrame(rows, "k long, v long")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r.k): r.ref for r in df.select("k", F.sum("v").over(w).alias("ref")).collect()
    }
    out = scalable_running_sum(df, "k", "v", out_col="run", num_buckets=8)
    got = {r.k: r.run for r in out.collect()}
    assert got == want
    # and the fan-out is real: rows landed in more than one bucket
    bounds = df.agg(F.min("k"), F.max("k")).collect()[0]
    assert bounds[1] > bounds[0]


def test_scalable_running_sum_degenerate_inputs(spark):
    from db_cdc_poc_spark.operators.stats import scalable_running_sum

    one = spark.createDataFrame([(5, 10)], "k long, v long")
    assert scalable_running_sum(one, "k", "v").collect()[0].running_total == 10
    const = spark.createDataFrame([(5, 1), (5, 2)], "k long, v long")
    # constant order col: one bucket, still a correct total at the end
    vals = sorted(
        r.running_total for r in scalable_running_sum(const, "k", "v").collect()
    )
    assert vals[-1] == 3
    empty = spark.createDataFrame([], "k long, v long")
    assert scalable_running_sum(empty, "k", "v").count() == 0
