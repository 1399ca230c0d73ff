"""Physical-plan quality gates — the 100 TB posture, asserted.

These tests pin the plan shapes that matter at scale so a refactor
can't silently regress them: column pruning reaching the scan,
broadcast joins for dims, partial aggregation for latest-per-key, no
cartesian products in candidate generation.
"""

from __future__ import annotations

import pytest

from db_cdc_poc_spark import queries as Q

from .conftest import SF_DIR


def _plan(spark, name: str) -> str:
    return (
        Q.registry()[name]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )


def test_q01_scan_prunes_columns(spark):
    plan = _plan(spark, "q01_pricing_summary")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read
    # only the 5 referenced columns may reach the scan
    assert "l_orderkey" not in read[0]
    assert "l_shipdate" not in read[0]


def test_q02_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q02_filter_project")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "l_returnflag" in pushed[0] and "l_quantity" in pushed[0]


def test_q03_dims_are_broadcast(spark):
    plan = _plan(spark, "q03_dim_join_agg")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_q06_latest_per_key_has_partial_aggregate_no_window(spark):
    plan = _plan(spark, "q06_latest_per_key")
    assert "Window" not in plan
    assert "partial_max_by" in plan or "partial_max" in plan


def test_q11_gold_join_shape(spark):
    plan = _plan(spark, "q11_current_state")
    # dim join broadcasts; the snapshot-changes range join keeps equi
    # keys (SMJ/SHJ with residual), never a nested loop over the fact
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q19_topk_avoids_global_sort(spark):
    plan = _plan(spark, "q19_topk_sort")
    assert "TakeOrderedAndProject" in plan


def test_q21_lsh_no_cartesian(spark):
    plan = _plan(spark, "q21_minhash_lsh")
    assert "CartesianProduct" not in plan


def test_q65_top_terms_avoids_global_sort(spark):
    """Global top-K must compile to TakeOrderedAndProject (per-partition
    heaps + driver merge), never a full Exchange rangepartitioning sort."""
    plan = _plan(spark, "q65_top_terms")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_q52_decontaminate_broadcasts_eval_side(spark):
    plan = _plan(spark, "q52_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q85_duplicate_spans_is_aggregation_only(spark):
    # substring-level dedup accounting must never pair-join spans:
    # only equi hash-joins (docfreq re-join), no nested loop, and the
    # aggregates run with map-side partials
    plan = _plan(spark, "q85_duplicate_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_q90_cross_lsh_has_no_cartesian(spark):
    # candidates come from the (band_id, band_hash) equi-join — a
    # cartesian/nested-loop anywhere means the LSH blocking is broken
    plan = _plan(spark, "q90_fuzzy_decontam")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q94_hard_negatives_broadcasts_query_side(spark):
    # label-inequality join: the small query side must broadcast (the
    # corpus never moves); a SortMergeJoin would shuffle the corpus
    plan = _plan(spark, "q94_hard_negatives")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
