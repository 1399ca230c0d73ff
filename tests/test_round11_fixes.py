"""Round-11 regression tests: the four ADVICE items and the
BloomFront cache bound (VERDICT r10 asks #3 and ADVICE 1-4).

1. ``CdcTarget.changes_since`` under additive schema evolution — a
   column added (or numeric-widened) between the watermark commit and
   now must appear NULL/widened on the ``before`` side, not raise
   AnalysisException (ADVICE medium, streaming/cdc.py).
2. ``changes_since(commit=None)`` with payload column names that need
   quoting (space/hyphen) — the bootstrap before-struct type is built
   programmatically, not as a DDL string (ADVICE low).
3. ``TableRegistry.known_order`` cycle guard — after one failed cyclic
   build the recorded dep edges contain both back-edges; known_order
   must raise the clear cycle error, not RecursionError (ADVICE low).
4. ``PipelineRunner.run_cycle`` — a NON-due upstream of a due table is
   served from its materialized parquet, not by re-executing its
   (side-effectful) builder, so its trigger cadence holds (ADVICE low).
5. ``BloomFront`` LRU cap — the driver cache is bounded at
   ``max_entries`` packed bitsets and pruning stays correct across
   evictions (reloadable filters; VERDICT ask #3).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from db_cdc_poc_spark.plans.registry import TableRegistry
from db_cdc_poc_spark.plans.runner import PipelineRunner
from db_cdc_poc_spark.streaming.bloom import BloomFront
from db_cdc_poc_spark.streaming.cdc import CdcTarget


# -- 1: changes_since across additive schema evolution --------------------


def test_changes_since_survives_added_column(spark):
    """A column added between the watermark commit and now appears in
    both before/after structs, NULL on the old side."""
    target = CdcTarget(
        tempfile.mkdtemp(prefix="cdc_evo_"), keys="k", sequence_by="seq"
    )
    target.upsert_batch(
        spark.createDataFrame([Row(k=1, seq=1, v=10), Row(k=2, seq=1, v=20)])
    )
    wm = target.state.commits()[-1]
    # second batch ADDS column `extra` and touches k=2 only
    target.upsert_batch(
        spark.createDataFrame([Row(k=2, seq=2, v=21, extra="new")])
    )
    delta = {r.k: r for r in target.changes_since(spark, wm).collect()}
    assert set(delta) == {2}
    r = delta[2]
    assert r.op == "u"
    assert r.before.v == 20 and r.before.extra is None
    assert r.after.v == 21 and r.after.extra == "new"
    # the struct field sets agree (union of both snapshots' payloads)
    assert set(r.before.asDict()) == set(r.after.asDict())


def test_changes_since_survives_numeric_widening(spark):
    """int -> bigint widening between commits: both sides cast to the
    wider type instead of raising on struct-type mismatch."""
    import pyspark.sql.types as T

    target = CdcTarget(
        tempfile.mkdtemp(prefix="cdc_widen_"), keys="k", sequence_by="seq"
    )
    narrow = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("seq", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    wide = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("seq", T.IntegerType()),
            T.StructField("v", T.LongType()),
        ]
    )
    target.upsert_batch(spark.createDataFrame([(1, 1, 10)], narrow))
    wm = target.state.commits()[-1]
    target.upsert_batch(spark.createDataFrame([(1, 2, 2**40)], wide))
    [r] = target.changes_since(spark, wm).collect()
    assert r.op == "u" and r.before.v == 10 and r.after.v == 2**40


def test_changes_since_bootstrap_quoted_column_names(spark):
    """commit=None with payload names needing backticks (space, dash)
    must not crash on type construction."""
    target = CdcTarget(
        tempfile.mkdtemp(prefix="cdc_quote_"), keys="k", sequence_by="seq"
    )
    df = (
        spark.createDataFrame([Row(k=1, seq=1, v=5)])
        .withColumnRenamed("v", "weird col-name")
    )
    target.upsert_batch(df)
    [r] = target.changes_since(spark, None).collect()
    assert r.op == "c" and r.before is None
    assert r.after["weird col-name"] == 5


# -- 3: known_order cycle guard --------------------------------------------


def test_known_order_raises_cycle_not_recursion(spark):
    reg = TableRegistry(spark)

    @reg.table()
    def a():
        return reg.read("b")

    @reg.table()
    def b():
        return reg.read("a")

    with pytest.raises(ValueError, match="dependency cycle"):
        reg.build("a")
    # read() recorded both back-edges before build() raised; the pure
    # ordering walk must now surface the SAME clear error, not blow
    # the stack (pre-fix: RecursionError from due()/materialize())
    with pytest.raises(ValueError, match="dependency cycle"):
        reg.known_order()


# -- 4: non-due upstream served from parquet -------------------------------


def test_non_due_upstream_builder_not_reexecuted(spark):
    """A slow-trigger upstream's builder fires once per ITS cadence,
    not once per downstream cycle — re-execution would double-apply
    side effects (index appends, upserts) the runner contract makes
    legal. The non-due upstream is served from its materialized
    parquet snapshot."""
    reg = TableRegistry(spark)
    builds = {"dim": 0, "gold": 0}

    @reg.table(trigger="24 hours")
    def dim():
        builds["dim"] += 1
        return spark.range(3)

    @reg.table(trigger="continuous")
    def gold():
        builds["gold"] += 1
        return reg.read("dim").selectExpr("sum(id) AS s")

    fake_now = [0.0]
    root = tempfile.mkdtemp(prefix="runner_r11_")
    runner = PipelineRunner(reg, root, clock=lambda: fake_now[0])

    assert set(runner.run_cycle()) == {"dim", "gold"}
    assert builds == {"dim": 1, "gold": 1}
    for t in (100.0, 200.0, 300.0):
        fake_now[0] = t
        assert runner.run_cycle() == ["gold"]
    # dim's builder never re-fired; gold still computed correctly from
    # the parquet snapshot every cycle
    assert builds == {"dim": 1, "gold": 4}
    assert spark.read.parquet(f"{root}/gold").collect()[0].s == 3
    # once dim's own cadence elapses it rebuilds
    fake_now[0] = 90000.0
    assert set(runner.run_cycle()) == {"dim", "gold"}
    assert builds["dim"] == 2


# -- 5: BloomFront LRU bound ------------------------------------------------


def test_bloom_cache_bounded_and_correct_across_evictions():
    bf = BloomFront("_t_bloom.npz", 1 << 12, max_entries=3)
    dirs, keysets = [], []
    for i in range(8):
        d = Path(tempfile.mkdtemp(prefix=f"bloom_lru_{i}_"))
        keys = np.arange(i * 100, i * 100 + 50, dtype=np.int64)
        bf.write(d, keys)
        dirs.append(d)
        keysets.append(keys)
    # cache never exceeds the cap
    assert len(bf._cache) <= 3
    # evicted dirs reload from disk and still answer correctly: every
    # written key hits, disjoint keys (roomy filter) are pruned
    bf_roomy = BloomFront("_r_bloom.npz", 1 << 16, max_entries=2)
    for d, keys in zip(dirs, keysets):
        bf_roomy.write(d, keys)
    for d, keys in zip(dirs, keysets):
        assert bf_roomy.might_contain_any(d, keys[:5])
        assert not bf_roomy.might_contain_any(
            d, np.asarray([10_000_000], dtype=np.int64)
        )
        assert len(bf_roomy._cache) <= 2

    # LRU order: touching an old entry keeps it resident
    bf2 = BloomFront("_t_bloom.npz", 1 << 12, max_entries=2)
    assert bf2.might_contain_any(dirs[0], keysets[0][:1])  # load 0
    assert bf2.might_contain_any(dirs[1], keysets[1][:1])  # load 1
    assert bf2.might_contain_any(dirs[0], keysets[0][:1])  # touch 0
    assert bf2.might_contain_any(dirs[2], keysets[2][:1])  # evicts 1
    assert str(dirs[0]) in bf2._cache and str(dirs[1]) not in bf2._cache


def test_bloom_cap_validation():
    with pytest.raises(ValueError):
        BloomFront("_x.npz", 1 << 12, max_entries=0)
