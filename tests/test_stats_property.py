"""Property-based checks for the statistics / sampling operators added
this round, against pure-Python models over randomized inputs."""

from __future__ import annotations

import os

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

VALS = st.lists(
    st.integers(min_value=0, max_value=100_000), min_size=2, max_size=80
)

_settings = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_HYPOTHESIS_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=VALS, bin_width=st.sampled_from([100, 1_000, 7_919]))
@_settings
def test_histogram_quantile_within_bin_width(spark, vals, bin_width):
    from db_cdc_poc_spark.operators.sketches import histogram_quantiles

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.quantile: r.est_lo
        for r in histogram_quantiles(df, F.col("v"), [0.5], bin_width).collect()
    }
    # model: first bin whose cumulative count reaches ceil(q*n)
    c = Counter(v // bin_width for v in vals)
    cum, want = 0, None
    for b in sorted(c):
        cum += c[b]
        if cum >= math.ceil(0.5 * len(vals)):
            want = b * bin_width
            break
    assert got[0.5] == want
    # the estimate brackets the exact median from below within one bin
    exact = sorted(vals)[(len(vals) - 1) // 2]
    assert want <= exact
    assert exact - want < bin_width


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    ),
    target=st.sampled_from([5, 40, 10_000]),
)
@_settings
def test_temperature_mix_subset_and_clamp(spark, rows, target):
    from db_cdc_poc_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_mix(df, "doc_id", "source", target_rows=target).collect()
    ids = {r.doc_id for r in kept}
    # output is always a subset of the input, keyed identically
    assert ids <= {i for i, _ in rows}
    # a target at least the corpus size keeps everything (clamp at 1.0)
    if target >= len(rows):
        assert ids == {i for i, _ in rows}


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=100,
        unique=True,
    ),
    n_shards=st.sampled_from([2, 5, 8]),
)
@_settings
def test_training_shards_partition_properties(spark, ids, n_shards):
    from db_cdc_poc_spark.operators.sampling import training_shards

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = training_shards(df, "doc_id", n_shards=n_shards).collect()
    assert len(out) == len(ids)  # a partition: every row exactly once
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r.shard < n_shards
        by_shard.setdefault(r.shard, []).append(r.pos)
    # dense 1..k positions within every nonempty shard
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
