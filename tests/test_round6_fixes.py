"""Round-6 hardening: the five ADVICE r5 findings.

1. auto_salted_join: unit tests (hot/cold split equivalence vs the
   plain join at several thresholds, threshold edge) — ADVICE medium.
2. salted_join / auto_salted_join reject how='right'/'full' (salting
   replicates the small side; replicas whose __salt matches nothing
   would survive outer semantics as spurious null rows) — ADVICE low.
3. derive_changes with compare_cols=[] emits a valid I/D-only
   changelog instead of raising TypeError — ADVICE low.
4. decayed_sum validates seg_len and derives the overflow guard as
   2^(62 - seg_len) instead of the seg_len=42-only 2^20 — ADVICE low.
5. audit_plans.compare grants the 3-exchanges-per-flip budget only
   when lost BHJs actually became shuffle joins — ADVICE low — and
   audit_all_plans.classify_plan FAILs unknown names with any BNLJ
   even when a decoy scalar aggregate matches the heuristic
   (VERDICT r5 next-round #6).
"""

from __future__ import annotations

import importlib.util
import math
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.cdc import derive_changes
from db_cdc_poc_spark.operators.joins import auto_salted_join, salted_join
from db_cdc_poc_spark.operators.timeseries import decayed_sum

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- joins


def _skewed_pair(spark):
    # key 0 is hot (200 rows), keys 1..9 cold (5 rows each); small side
    # covers 0..7 so some cold keys (8, 9) dangle for the left join.
    big = spark.createDataFrame(
        [(0, f"h{i}") for i in range(200)]
        + [(k, f"c{k}_{i}") for k in range(1, 10) for i in range(5)],
        "k long, payload string",
    )
    small = spark.createDataFrame(
        [(k, f"v{k}") for k in range(8)], "k long, v string"
    )
    return big, small


@pytest.mark.parametrize("threshold", [1, 50, 10_000])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_auto_salted_join_matches_plain_join(spark, threshold, how):
    # threshold=1: every key is hot (all-salted path); 50: only key 0
    # is hot (the real split); 10_000: nothing is hot (plain path).
    # All three must give the plain join's exact result set.
    big, small = _skewed_pair(spark)
    plain = sorted(
        (r.k, r.payload, r.v) for r in big.join(small, "k", how).collect()
    )
    auto = sorted(
        (r.k, r.payload, r.v)
        for r in auto_salted_join(
            big, small, "k", how=how, salt=4, hot_threshold=threshold
        ).collect()
    )
    assert auto == plain


def test_auto_salted_join_threshold_edge(spark):
    # strict inequality: a key with EXACTLY threshold rows stays cold
    big, small = _skewed_pair(spark)
    out = auto_salted_join(big, small, "k", salt=4, hot_threshold=200)
    assert sorted((r.k, r.payload, r.v) for r in out.collect()) == sorted(
        (r.k, r.payload, r.v) for r in big.join(small, "k").collect()
    )


@pytest.mark.parametrize("how", ["right", "full", "full_outer", "left_semi"])
def test_salted_joins_reject_outer_modes(spark, how):
    big, small = _skewed_pair(spark)
    with pytest.raises(ValueError, match="inner"):
        salted_join(big, small, "k", how=how)
    with pytest.raises(ValueError, match="inner"):
        auto_salted_join(big, small, "k", how=how)


# ------------------------------------------------------------------ cdc


def test_derive_changes_empty_compare_cols(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    new = spark.createDataFrame([(2, "x"), (3, "c")], "id long, v string")
    # explicit empty list: no column can differ -> I/D only, no 'U'
    # even though id=2's v changed (v is not compared)
    out = derive_changes(old, new, keys="id", compare_cols=[]).collect()
    ops = {r.id: r.op for r in out}
    assert ops == {1: "D", 3: "I"}


def test_derive_changes_all_columns_are_keys(spark):
    # compare_cols=None with every column a key -> derived list is []
    old = spark.createDataFrame([(1,), (2,)], "id long")
    new = spark.createDataFrame([(2,), (3,)], "id long")
    ops = {r.id: r.op for r in derive_changes(old, new, keys="id").collect()}
    assert ops == {1: "D", 3: "I"}


# ----------------------------------------------------------- timeseries


@pytest.mark.parametrize("seg_len", [0, -1, 62, 100])
def test_decayed_sum_rejects_bad_seg_len(spark, seg_len):
    df = spark.createDataFrame([("s", 0, 1)], "series string, t long, v long")
    with pytest.raises(ValueError, match="seg_len"):
        decayed_sum(df, "series", F.col("t").cast("timestamp"), F.col("v"),
                    bucket_seconds=1, seg_len=seg_len)


def test_decayed_sum_nondefault_seg_len_correct(spark):
    # seg_len=7 spans a segment boundary in a 10-bucket series; values
    # must still match the direct definition sum(v_j * 2^(j-i)) with
    # the >= seg_len-buckets-back truncation contract.
    rows = [("s", t, t + 1) for t in range(10)]
    df = spark.createDataFrame(rows, "series string, t long, v long")
    out = {
        r.bucket: r.decayed
        for r in decayed_sum(
            df, "series", F.col("t").cast("timestamp"), F.col("v"),
            bucket_seconds=1, seg_len=7,
        ).collect()
    }
    for i in range(10):
        lo_seg = (i // 7 - 1) * 7  # one segment back, like the operator
        expect = sum(
            (j + 1) * 2.0 ** (j - i) for j in range(max(0, lo_seg), i + 1)
        )
        assert math.isclose(out[i], expect, rel_tol=1e-12), (i, out[i], expect)


def test_decayed_sum_overflow_guard_scales_with_seg_len(spark):
    # at seg_len=43 the admissible magnitude halves to 2^19: a value
    # that is fine under the default must now be rejected loudly
    # (raise_error in the plan), never silently wrapped.
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [("s", 0, 1 << 19)], "series string, t long, v long"
    )
    ok = decayed_sum(df, "series", F.col("t").cast("timestamp"), F.col("v"),
                     bucket_seconds=1, seg_len=42).collect()
    assert ok[0].decayed == float(1 << 19)
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        decayed_sum(df, "series", F.col("t").cast("timestamp"), F.col("v"),
                    bucket_seconds=1, seg_len=43).collect()


# ---------------------------------------------------------- plan audits


def _profile(**kw):
    base = {"cartesian": 0, "bnlj": 0, "exchange": 0, "bhj": 0, "smj": 0,
            "shj": 0}
    base.update(kw)
    return base


def test_audit_budget_granted_only_on_actual_flip():
    ap = _load("audit_plans")
    # real flip: 1 BHJ became 1 SMJ, 3 new exchanges -> INFO, 0 bad
    msgs, bad = ap.compare(
        "qx", _profile(bhj=2, exchange=4), _profile(bhj=1, smj=1, exchange=7)
    )
    assert bad == 0
    assert any("within the 3-exchange budget" in m for m in msgs)
    # NO flip: a BHJ vanished (join removed by rewrite) while 3
    # unrelated exchanges appeared -> DEGRADED, budget NOT granted
    msgs, bad = ap.compare(
        "qx", _profile(bhj=2, exchange=4), _profile(bhj=1, exchange=7)
    )
    assert bad == 1
    assert any("DEGRADED exchanges" in m for m in msgs)


def test_audit_unknown_bnlj_fails_despite_decoy_scalar_agg():
    aap = _load("audit_all_plans")
    # synthetic simple-mode plan: one real BNLJ plus a decoy scalar
    # aggregate (partial+final pair) that satisfies bnlj <= scalar_aggs
    decoy = (
        "+- BroadcastNestedLoopJoin BuildRight, Inner\n"
        "   +- HashAggregate(keys=[], functions=[count(1)])\n"
        "      +- HashAggregate(keys=[], functions=[partial_count(1)])\n"
    )
    status, _ = aap.classify_plan("q999_unknown", decoy)
    assert status == "FAIL"
    # the same plan under an allowlisted name keeps its classification
    status, _ = aap.classify_plan("q44_tfidf_terms", decoy)
    assert status == "SCALAR-SPINE-NLJ"
    # and a clean unknown plan is still OK
    status, _ = aap.classify_plan("q999_unknown", "+- BroadcastHashJoin\n")
    assert status == "OK"
