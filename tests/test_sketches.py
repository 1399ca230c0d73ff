"""Probabilistic sketches: HLL registers vs hashlib ground truth,
estimate error band in the valid regime, merge property; Bloom
no-false-negatives, broadcast plan, and false-positive contract.
Plus the chunk-dedup and quantization operators they ship alongside."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators import sketches as sk
from db_cdc_poc_spark.operators.similarity import quantize_embeddings
from db_cdc_poc_spark.operators.text import dedup_chunks

MASK63 = (1 << 63) - 1


def _py_register(key: str, p: int) -> tuple[int, int]:
    h = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big") & MASK63
    rem = 63 - p
    w = h & ((1 << rem) - 1)
    rank = sk.HLL_SCALE if w == 0 else min(rem + 1 - w.bit_length(), sk.HLL_SCALE)
    return h >> rem, rank


def test_hll_registers_match_hashlib(spark):
    keys = [f"key-{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        (r.bucket, ): r.r
        for r in sk.hll_registers(df, "k", p=6, hash_fn="md5").collect()
    }
    want: dict[tuple[int], int] = {}
    for k in keys:
        b, rank = _py_register(k, 6)
        want[(b,)] = max(want.get((b,), 0), rank)
    assert got == want


def test_hll_estimate_error_band(spark):
    # 20k distinct keys, p=10 (m=1024): standard error ~1.04/32 = 3.3%;
    # assert within 4 sigma. xxhash64 production path.
    n = 20_000
    df = spark.range(n).select(F.concat(F.lit("u"), F.col("id")).alias("k"))
    est = sk.hll_distinct(df, "k", p=10).collect()[0]
    assert est.m == 1024
    assert abs(est.est_distinct - n) / n < 0.13
    # duplicates don't move the sketch
    est2 = sk.hll_distinct(df.union(df), "k", p=10).collect()[0]
    assert est2.s_scaled == est.s_scaled


def test_hll_registers_merge_with_max(spark):
    # union-merge: max of two register tables == registers of the union
    a = spark.range(0, 3000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    b = spark.range(2000, 6000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    ra = sk.hll_registers(a, "k", p=8)
    rb = sk.hll_registers(b, "k", p=8)
    merged = (
        ra.union(rb)
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )
    direct = sk.hll_registers(a.union(b), "k", p=8)
    assert {(r.bucket, r.r) for r in merged.collect()} == {
        (r.bucket, r.r) for r in direct.collect()
    }


def test_bloom_no_false_negatives_and_fp_rate(spark):
    members = spark.range(1000).select(F.concat(F.lit("m"), F.col("id")).alias("k"))
    others = spark.range(5000).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
    res = sk.bloom_hits(members.union(others), members, "k", k=4, m_bits=1 << 16)
    rows = {r.k: r.maybe_member for r in res.collect()}
    assert all(rows[f"m{i}"] for i in range(1000))  # every member qualifies
    fp = sum(1 for i in range(5000) if rows[f"x{i}"])
    # n=1000, m=65536, k=4 -> fp ~ (1-e^{-4000/65536})^4 ~ 1.2e-5; allow slack
    assert fp / 5000 < 0.01


def test_bloom_filter_is_broadcast(spark):
    members = spark.range(100).select(F.concat(F.lit("m"), F.col("id")).alias("k"))
    cands = spark.range(1000).select(F.concat(F.lit("c"), F.col("id")).alias("k"))
    plan = sk.bloom_hits(cands, members, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_dedup_chunks_removes_cross_doc_repeats(spark):
    boiler = "the quick brown fox jumps over the dog"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
            (2, boiler + " one two three four five six seven eight"),
            (3, "totally unique content with eight little tokens here"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in dedup_chunks(docs, window=8).collect()}
    assert out[1].n_chunks == 2 and out[1].n_kept == 2  # first occurrence kept
    assert out[2].n_chunks == 2 and out[2].n_kept == 1  # boilerplate dropped
    assert out[3].n_kept == out[3].n_chunks == 1
    # doc 2's surviving text is its tail chunk only
    import hashlib as h

    assert out[2].kept_fp == h.md5(b"one two three four five six seven eight").hexdigest()


def test_dedup_chunks_md5_equals_xxhash_decisions(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} shared tail chunk of tokens repeated here") for i in range(20)],
        "doc_id long, text string",
    )
    a = {(r.id, r.n_kept) for r in dedup_chunks(docs, window=4, hash_fn="md5").collect()}
    b = {(r.id, r.n_kept) for r in dedup_chunks(docs, window=4, hash_fn="xxhash64").collect()}
    assert a == b


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    from db_cdc_poc_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = quantize_embeddings(emb).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert r.dim == 64
        assert -127 <= r.q_min <= r.q_max <= 127
        # symmetric quantization: error is at most half a step
        assert r.max_abs_err <= r.scale / 2 + 1e-12
        assert r.scale > 0


def test_quantize_zero_vector_guard(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    out = {r.id: r for r in quantize_embeddings(df).collect()}
    assert out[1].scale == 0.0 and out[1].q_sum == 0 and out[1].max_abs_err == 0.0
    assert out[2].q_min == -127 and out[2].q_max == 64  # 1.0/(2/127) rounds to 64


def test_quantize_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    # window + groupBy on the same key: exactly one exchange
    assert plan.count("Exchange hashpartitioning") == 1


@pytest.fixture()
def sf_dir():
    return "/root/testdata/sf0.001"


def test_cm_counters_match_hashlib(spark):
    import hashlib as h

    keys = ["a", "b", "a", "c", "a", "b"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {(r.r, r.pos): r.c for r in sk.cm_counters(df, "k", depth=2, width=64).collect()}
    want: dict[tuple[int, int], int] = {}
    for k in keys:
        for r in range(2):
            pos = int(h.md5(f"{k}#{r}".encode()).hexdigest()[:8], 16) % 64
            want[(r, pos)] = want.get((r, pos), 0) + 1
    assert got == want


def test_cm_never_underestimates_and_exact_when_sparse(spark):
    df = spark.range(3000).select(
        (F.col("id") % 100).cast("string").alias("k")  # 100 keys x 30 each
    )
    counters = sk.cm_counters(df, "k", depth=4, width=4096)
    est = {
        r.k: r.est
        for r in sk.cm_estimate(df.distinct(), counters, "k", depth=4, width=4096).collect()
    }
    exact = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert all(est[k] >= exact[k] for k in exact)  # CM overestimates only
    # 100 keys in 4x4096 cells: collisions essentially impossible
    assert est == exact


def test_cm_merge_by_sum(spark):
    a = spark.range(500).select((F.col("id") % 7).cast("string").alias("k"))
    b = spark.range(300).select((F.col("id") % 11).cast("string").alias("k"))
    merged = (
        sk.cm_counters(a, "k", depth=2, width=128)
        .unionByName(sk.cm_counters(b, "k", depth=2, width=128))
        .groupBy("r", "pos")
        .agg(F.sum("c").alias("c"))
    )
    direct = sk.cm_counters(a.unionByName(b), "k", depth=2, width=128)
    assert {(r.r, r.pos, r.c) for r in merged.collect()} == {
        (r.r, r.pos, r.c) for r in direct.collect()
    }


def test_table_checksums_localize_a_difference(spark):
    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    # one row's value perturbed
    tampered = base.withColumn(
        "v", F.when(F.col("k") == 123, F.lit(-1)).otherwise(F.col("v"))
    )
    a = {r.bucket: (r.n, r.checksum) for r in sk.table_checksums(base, "k").collect()}
    b = {
        r.bucket: (r.n, r.checksum) for r in sk.table_checksums(tampered, "k").collect()
    }
    diff = [bk for bk in a if a[bk] != b.get(bk)]
    assert len(diff) == 1  # exactly the tampered row's bucket
    assert a[diff[0]][0] == b[diff[0]][0]  # same count, different checksum


def test_table_checksums_partitioning_invariant(spark):
    base = spark.range(2000).select(F.col("id").alias("k"), (F.col("id") % 13).alias("v"))
    a = {tuple(r) for r in sk.table_checksums(base, "k").collect()}
    b = {tuple(r) for r in sk.table_checksums(base.repartition(17), "k").collect()}
    assert a == b


# ---------------------------------------------------------------------------
# histogram_quantiles
# ---------------------------------------------------------------------------


def test_histogram_quantiles_within_bin_width_of_exact(spark):
    import numpy as np

    from db_cdc_poc_spark.operators.sketches import histogram_quantiles

    rng = np.random.default_rng(3)
    vals = [int(v) for v in rng.integers(0, 1_000_000, size=5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.quantile: r.est_lo
        for r in histogram_quantiles(
            df, F.col("v"), [0.5, 0.9, 0.99], bin_width=10_000
        ).collect()
    }
    for q in (0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        assert abs(got[q] - exact) <= 10_000 + 1, (q, got[q], exact)


def test_histogram_quantiles_merge_property(spark):
    # bin tables from two halves merged with + give the same estimate
    # as one pass over the union — the sketch contract
    from db_cdc_poc_spark.operators.sketches import histogram_quantiles

    a = [(v,) for v in range(0, 1000)]
    b = [(v,) for v in range(500, 1500)]
    df_all = spark.createDataFrame(a + b, "v long")
    whole = {
        r.quantile: r.est_lo
        for r in histogram_quantiles(df_all, F.col("v"), [0.5], 100).collect()
    }
    # manual merge: per-half bin counts, summed, cumulated
    from collections import Counter

    c = Counter()
    for v, in a + b:
        c[v // 100] += 1
    n = sum(c.values())
    cum = 0
    import math

    est = None
    for bin_ in sorted(c):
        cum += c[bin_]
        if cum >= math.ceil(0.5 * n):
            est = bin_ * 100
            break
    assert whole[0.5] == est


def test_hll_overlap_inclusion_exclusion(spark):
    from db_cdc_poc_spark.operators.sketches import hll_overlap

    # A = 0..3999, B = 2000..5999 -> |A|=|B|=4000, union 6000, inter 2000
    a = spark.range(0, 4000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("k"))
    r = hll_overlap(a, b, "k", p=10).collect()[0]
    assert abs(r.est_a - 4000) / 4000 < 0.15
    assert abs(r.est_b - 4000) / 4000 < 0.15
    assert abs(r.est_union - 6000) / 6000 < 0.15
    assert abs(r.est_intersection - 2000) / 2000 < 0.5  # compounded error
    # algebra holds exactly by construction
    assert r.est_intersection == r.est_a + r.est_b - r.est_union


def test_hll_overlap_disjoint_sets_near_zero_intersection(spark):
    from db_cdc_poc_spark.operators.sketches import hll_overlap

    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(50_000, 53_000).select(F.col("id").cast("string").alias("k"))
    r = hll_overlap(a, b, "k", p=10).collect()[0]
    # intersection estimate of disjoint sets stays within the noise band
    assert abs(r.est_intersection) < 0.2 * r.est_union


def test_hll_overlap_empty_side_is_numeric_not_null(spark):
    from db_cdc_poc_spark.operators.sketches import hll_overlap

    a = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    b = a.filter(F.col("k") == "nope")  # empty
    r = hll_overlap(a, b, "k", p=8).collect()[0]
    # the empty side estimates the raw all-zero-register value (no
    # linear-counting correction, documented), never NULL
    assert r.est_b is not None
    assert r.est_union is not None
    assert r.est_intersection is not None
    assert r.est_intersection == r.est_a + r.est_b - r.est_union
