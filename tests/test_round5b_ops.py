"""Round-5 additions, second batch: reciprocal-rank fusion (exact
weights, single-list membership, tie-breaks), diversity sampling
(per-stratum cap, determinism), decayed sum (hand-computed EWMA
including the segment-boundary carry and the magnitude guard), and the
filter-threshold survival curve (vs brute force, zero rows kept)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401  (parity with sibling file)

from db_cdc_poc_spark.operators.similarity import (
    diversity_sample,
    rademacher_weights,
    rrf_fuse,
)
from db_cdc_poc_spark.operators.stats import survival_curve
from db_cdc_poc_spark.operators.timeseries import decayed_sum


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "id long, rank int")


def test_rrf_exact_weights_and_order(spark):
    a = _ranked(spark, [(1, 1), (2, 2)])
    b = _ranked(spark, [(2, 1), (3, 2)])
    out = {r.id: r for r in rrf_fuse(a, b, k=60, top_k=10).collect()}
    # doc 2: floor(1e6/62) + floor(1e6/61) = 16129 + 16393
    assert out[2].rrf_e6 == 16129 + 16393
    # doc 1: floor(1e6/61) only; doc 3: floor(1e6/62) only
    assert out[1].rrf_e6 == 16393 and out[1].rank_b is None
    assert out[3].rrf_e6 == 16129 and out[3].rank_a is None
    ranks = {r.id: r.fused_rank for r in out.values()}
    assert ranks == {2: 1, 1: 2, 3: 3}


def test_rrf_tie_breaks_by_id(spark):
    a = _ranked(spark, [(5, 1), (9, 2)])
    b = _ranked(spark, [(9, 1), (5, 2)])
    out = rrf_fuse(a, b, k=60, top_k=10).collect()
    # identical fused scores -> lower id first
    assert [r.id for r in out] == [5, 9]
    assert out[0].rrf_e6 == out[1].rrf_e6


def test_rrf_top_k_truncates(spark):
    a = _ranked(spark, [(i, i) for i in range(1, 30)])
    b = _ranked(spark, [])
    assert rrf_fuse(a, b, top_k=7).count() == 7


# ---------------------------------------------------------------------------
# diversity_sample
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vec_df(spark):
    import math

    rows = [
        (i, [math.cos(i * 0.37 + d) for d in range(8)]) for i in range(60)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_diversity_cap_respected(spark, vec_df):
    out = diversity_sample(
        vec_df, per_bucket=2, bits=3, weights=rademacher_weights(1, 3, 8)
    )
    rows = out.collect()
    per = {}
    for r in rows:
        per[r.bucket] = per.get(r.bucket, 0) + 1
        assert 1 <= r.pick <= 2
    assert all(n <= 2 for n in per.values())
    assert {r.id for r in rows} <= set(range(60))


def test_diversity_is_deterministic(spark, vec_df):
    w = rademacher_weights(1, 3, 8)
    one = sorted(map(tuple, diversity_sample(vec_df, 2, 3, w).collect()))
    two = sorted(map(tuple, diversity_sample(vec_df, 2, 3, w).collect()))
    assert one == two


def test_diversity_keeps_everything_when_cap_exceeds_bucket(spark, vec_df):
    out = diversity_sample(
        vec_df, per_bucket=1000, bits=3, weights=rademacher_weights(1, 3, 8)
    )
    assert out.count() == 60


# ---------------------------------------------------------------------------
# decayed_sum
# ---------------------------------------------------------------------------


def _events(spark, rows):
    """rows: (user, epoch_hours, cents)."""
    return spark.createDataFrame(
        [(u, h * 3600 * 1_000_000, c) for u, h, c in rows],
        "user long, us long, cents long",
    ).select("user", F.timestamp_micros(F.col("us")).alias("ts"), "cents")


def test_decayed_sum_matches_hand_computation(spark):
    # one user, buckets 0,1,3 (gap at 2) inside one segment
    df = _events(spark, [(1, 0, 100), (1, 1, 40), (1, 3, 8)])
    out = {
        r.bucket: r.decayed
        for r in decayed_sum(df, "user", F.col("ts"), F.col("cents")).collect()
    }
    assert out[0] == 100.0
    assert out[1] == 100.0 / 2 + 40.0
    assert out[3] == 100.0 / 8 + 40.0 / 4 + 8.0


def test_decayed_sum_carries_across_segment_boundary(spark):
    # seg_len=4: bucket 3 is the last of segment 0, bucket 4 starts seg 1
    df = _events(spark, [(1, 3, 64), (1, 4, 10), (1, 6, 2)])
    out = {
        r.bucket: r.decayed
        for r in decayed_sum(
            df, "user", F.col("ts"), F.col("cents"), seg_len=4
        ).collect()
    }
    assert out[3] == 64.0
    assert out[4] == 64.0 / 2 + 10.0
    assert out[6] == 64.0 / 8 + 10.0 / 4 + 2.0


def test_decayed_sum_truncates_two_segments_back(spark):
    # seg_len=4: bucket 1 (seg 0) and bucket 9 (seg 2) — no carry reaches 9
    df = _events(spark, [(1, 1, 64), (1, 9, 10)])
    out = {
        r.bucket: r.decayed
        for r in decayed_sum(
            df, "user", F.col("ts"), F.col("cents"), seg_len=4
        ).collect()
    }
    assert out[9] == 10.0


def test_decayed_sum_guards_magnitude(spark):
    df = _events(spark, [(1, 0, 1 << 20)])
    with pytest.raises(Exception, match="bucket_value"):
        decayed_sum(df, "user", F.col("ts"), F.col("cents")).collect()


def test_decayed_sum_isolates_series(spark):
    df = _events(spark, [(1, 0, 100), (2, 1, 50)])
    out = {
        (r.series, r.bucket): r.decayed
        for r in decayed_sum(df, "user", F.col("ts"), F.col("cents")).collect()
    }
    assert out[(1, 0)] == 100.0 and out[(2, 1)] == 50.0


# ---------------------------------------------------------------------------
# survival_curve
# ---------------------------------------------------------------------------


def test_survival_curve_matches_brute_force(spark):
    vals = [3, 7, 7, 12, 20, 25]
    df = spark.createDataFrame([(v,) for v in vals], "m long")
    thr = [5, 10, 15, 30]
    out = {
        r.threshold: (r.n_rows, r.weight_sum)
        for r in survival_curve(
            df, F.col("m"), thr, weight=F.col("m")
        ).collect()
    }
    for t in thr:
        keep = [v for v in vals if v >= t]
        assert out[t] == (len(keep), sum(keep)), t
    # nothing survives 30 -> explicit zero row, not a missing row
    assert out[30] == (0, 0)


def test_survival_curve_default_weight_counts_rows(spark):
    df = spark.createDataFrame([(1,), (9,)], "m long")
    out = {
        r.threshold: r.weight_sum
        for r in survival_curve(df, F.col("m"), [0, 5]).collect()
    }
    assert out == {0: 2, 5: 1}


# ---------------------------------------------------------------------------
# bloom_pruned_join
# ---------------------------------------------------------------------------


def test_bloom_join_equals_plain_join(spark):
    from db_cdc_poc_spark.operators.joins import bloom_pruned_join

    fact = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], "k long, v long"
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 200, 13)], "k long, name string"
    )
    got = sorted(map(tuple, bloom_pruned_join(fact, dim, "k").collect()))
    want = sorted(map(tuple, fact.join(dim, "k").collect()))
    assert got == want and len(got) > 0


def test_bloom_join_plan_has_no_fact_shuffle_before_semi(spark):
    from db_cdc_poc_spark.operators.joins import bloom_pruned_join

    fact = spark.range(0, 1000).selectExpr("id as k", "id as v")
    dim = spark.range(0, 10).selectExpr("id as k", "id as name")
    plan = bloom_pruned_join(fact, dim, "k")._jdf.queryExecution().executedPlan().toString()
    # every semi-join against the bit table must be broadcast, never shuffled
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin LeftSemi" not in plan and "ShuffledHashJoin LeftSemi" not in plan


# ---------------------------------------------------------------------------
# derive_changes
# ---------------------------------------------------------------------------


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long")


def test_derive_changes_full_matrix(spark):
    from db_cdc_poc_spark.operators.cdc import derive_changes

    old = _snap(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30), (5, None, 50)])
    new = _snap(spark, [(1, "x", 10), (2, "y", 99), (4, "w", 40), (5, None, 50)])
    out = {r.k: r for r in derive_changes(old, new, "k").collect()}
    # 1 unchanged -> absent; 5 unchanged (NULL == NULL null-safely) -> absent
    assert set(out) == {2, 3, 4}
    assert out[2].op == "U" and out[2].b_old == 20 and out[2].b_new == 99
    assert out[3].op == "D" and out[3].a_new is None
    assert out[4].op == "I" and out[4].a_old is None


def test_derive_changes_null_transition_is_update(spark):
    from db_cdc_poc_spark.operators.cdc import derive_changes

    old = _snap(spark, [(1, "x", 10)])
    new = _snap(spark, [(1, None, 10)])
    rows = derive_changes(old, new, "k").collect()
    assert len(rows) == 1 and rows[0].op == "U"


def test_derive_changes_roundtrips_through_apply(spark):
    """old + derived changelog, applied, reproduces new — the inverse
    contract that names the operator."""
    from db_cdc_poc_spark.operators.cdc import derive_changes

    old = _snap(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    new = _snap(spark, [(1, "x", 11), (3, "z", 30), (4, "w", 40)])
    ch = derive_changes(old, new, "k")
    upserts = ch.filter(F.col("op") != "D").select(
        "k", F.col("a_new").alias("a"), F.col("b_new").alias("b")
    )
    deletes = {r.k for r in ch.filter(F.col("op") == "D").collect()}
    untouched = old.join(ch.select("k"), "k", "left_anti")
    rebuilt = untouched.unionByName(upserts).filter(
        ~F.col("k").isin(list(deletes)) if deletes else F.lit(True)
    )
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


# ---------------------------------------------------------------------------
# rank_normalize
# ---------------------------------------------------------------------------


def test_rank_normalize_matches_percent_rank_definition(spark):
    from db_cdc_poc_spark.operators.stats import rank_normalize

    vals = [(1, 10, 5), (2, 20, 5), (3, 20, 1), (4, 40, 9)]
    df = spark.createDataFrame(vals, "id long, s1 long, s2 long")
    out = {r.id: r for r in rank_normalize(df, "id", ["s1", "s2"]).collect()}
    # s1: ranks 1,2,2,4 over n-1=3 -> ppm 0, 333333, 333333, 1000000
    assert [out[i].s1_ppm for i in (1, 2, 3, 4)] == [0, 333333, 333333, 1000000]
    # s2: values 5,5,1,9 -> ranks 2,2,1,4 -> ppm 333333,333333,0,1000000
    assert [out[i].s2_ppm for i in (1, 2, 3, 4)] == [333333, 333333, 0, 1000000]
    assert out[4].quality_ppm == 1000000
    assert out[1].quality_ppm == (0 + 333333) // 2
