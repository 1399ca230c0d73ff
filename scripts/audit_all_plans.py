"""Physical-plan audit over ALL registered queries, not just the
bench headline set.

For every ``queries()`` entry, builds the DataFrame at
``$SPARK_GRAFT_SF_DIR`` (default sf0.01 — plan SHAPE, not size, is
what is audited; size-driven flips are the one caveat, noted below)
and inspects the formatted physical plan for scale-killers:

- FAIL  CartesianProduct / BroadcastNestedLoopJoin — unless the query
        is on the documented allowlist (exact small-side baselines
        whose scale siblings exist, per VERDICT r4's plan audit).
- INFO  SinglePartition exchanges — a global sort / scalar aggregate /
        driver-bound spine is sometimes the correct plan (final top-k,
        one-row aggregates); the count is reported so growth is
        visible round-over-round.
- reported per query: exchange count, join strategies, Python
  boundary crossings (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).

Streaming queries whose plan can only be inspected after a run are
executed via their ``queries()`` callable like any other entry (they
all return batch DataFrames from availableNow drains).

Usage: python scripts/audit_all_plans.py [out_path]
Exit code 1 on any FAIL.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from db_cdc_poc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Nested-loop joins that are the documented, intentionally-exact plan
# (VERDICT r4 adjudicated the first two): q24's self-match-exclusion
# over 10 broadcast query vectors; q94's mined-negative sampling over
# the same broadcast query set; q23/q39 are the O(n^2) exact
# *baselines* whose scale siblings are q25/q34/q41/q43 — their
# nested-loop is the definition of the op.
NLJ_ALLOWED = {
    "q23_embedding_neardup",
    "q24_cosine_topk",
    "q39_neardup_np",
    "q94_hard_negatives",
    # hybrid fusion composes q24's allowed exact dense retriever (ONE
    # broadcast query vector, self-match-exclusion !=) with BM25 (whose
    # only BNLJ is the 1-row corpus-stats spine, scalar-agg-classified
    # when it stands alone); the fusion join itself is an equi-join.
    "q137_hybrid_rrf",
    # PQ recall reports: the EXACT leg is the q24 shape (corpus x 10
    # broadcast query vectors) — it exists to measure the ADC leg's
    # recall against ground truth; the ADC leg itself is all equi-joins
    # (q163 residual ADC, q166 the re-ranked serving path).
    "q163_pq_recall",
    "q166_pq_rerank_recall",
    # binary-quantization Hamming scan: scoring has no join key by
    # definition (every 16-byte code is XOR+popcount-scored against
    # the 10 BROADCAST query codes — the q24 bounded-query contract at
    # 1/32 the bytes); the linear scan IS the operator, with IVF
    # routing / exact_rerank as the documented sublinear composition.
    "q176_hamming_topk",
}

# BNLJs whose broadcast build side is bounded by an ALGORITHM PARAMETER
# (k centroids, IVF nlist), not by data size: the points-x-centroids
# assignment join of k-means / IVF coarse quantization. Verified by
# hand: each build side is a BroadcastExchange over the centroid
# relation (collect_list per label / the nlist centroid sample).
# Correct and scale-safe — per-row work is O(k), linear in the corpus.
BOUNDED_BUILD_NLJ = {
    "q107_centroid_confusion",
    "q112_kmeans_refine",
    "q43_ivf_topk",
    # survival_curve's suffix-total join: both sides are bounded by the
    # THRESHOLD LIST length (corpus already reduced to <= k+1 bucket
    # rows by one aggregation) — the non-equi join never sees the corpus.
    "q140_filter_sweep",
    # drift report: corpus x broadcast codebook (nlist-bounded build,
    # the q43 shape) plus a 1-row total-count spine join — both BNLJ
    # build sides are parameter- or scalar-bounded, hand-verified.
    "q147_ivf_drift",
    # SemDeDup: the vectors x broadcast label-codebook assignment join
    # (|labels|-row build, the q43/q107 shape); the pair screen itself
    # is an equi-join on the assigned cluster id (SMJ in the plan).
    # Hand-verified: every BNLJ build side is the codebook relation.
    "q154_semdedup",
    # IVF+PQ composition: the coarse quantizer's corpus x codebook and
    # queries x codebook joins (capped 16-entry build, the q43 shape);
    # the candidate-restricted ADC leg is equi-joins only. The residual
    # paths add the query x coarse-centroid residual build and the
    # residualize assignment join — every build side is the 16-row
    # trained codebook (pq_train caps: parameter-bounded, rule 13).
    "q164_ivfpq_topk",
    # ADC top-32 + exact re-rank: residualize/LUT builds as above; the
    # re-rank leg itself is equi-joins on (query_id, neighbor_id).
    "q165_pq_rerank_topk",
}

# BNLJs whose every build side is a 1-row scalar-aggregate spine
# (normalization constants: N doc counts for tf-idf/PMI/chi-square/
# Benford, global percentile fences, HLL register unions, calendar
# spines). Hand-verified name by name; the ``bnlj <= scalar_aggs``
# heuristic is kept as a STRUCTURAL CROSS-CHECK on these names only —
# an UNKNOWN query with any BNLJ FAILS the audit even when the
# heuristic matches (VERDICT r5: a real NLJ plus a decoy scalar
# aggregate must not slip through by default).
SCALAR_SPINE_NLJ = {
    "q105_skew_report",
    "q109_quantile_bins",
    "q114_transition_pmi",
    "q115_hll_overlap",
    "q116_weighted_sample",
    "q118_chi_square",
    "q119_benford",
    "q121_vocab_growth",
    "q124_linear_classifier",
    "q128_join_fanout",
    "q131_bm25_search",
    "q132_lsh_recall",
    "q144_quality_ensemble",
    # domain_stats: the one BNLJ broadcasts the 1-row grand total over
    # the materialized per-domain aggregate (share_ppm denominator) —
    # hand-verified scalar spine.
    "q159_domain_stats",
    "q44_tfidf_terms",
    "q97_gapfill_locf",
}


def classify_plan(name: str, plan: str) -> tuple[str, str]:
    """Classify one simple-mode physical plan -> (status, info line).

    Pure function so tests can feed synthetic plans — in particular the
    required negative case: an UNKNOWN query name whose plan mixes a
    real BroadcastNestedLoopJoin with a decoy scalar aggregate must
    come back FAIL (the lenient scalar-spine heuristic only applies to
    allowlisted names).
    """
    # simple mode: exactly one line per physical operator occurrence
    n_ex = plan.count(" Exchange ") + plan.count("- Exchange ")
    n_single = plan.count("Exchange SinglePartition")
    joins = {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cart": plan.count("CartesianProduct"),
    }
    py = (
        plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInArrow")
    )
    # Each scalar (grouping-key-less) aggregate contributes a
    # partial+final line pair in simple mode; bnlj <= scalar_aggs
    # is consistent with every BNLJ build side being a 1-row
    # relation. That heuristic ONLY applies to names on the
    # SCALAR_SPINE_NLJ allowlist — see its comment.
    scalar_aggs = (
        plan.count("HashAggregate(keys=[]")
        + plan.count("ObjectHashAggregate(keys=[]")
        + plan.count("SortAggregate(key=[]")
    ) // 2
    bad_join = joins["cart"] + joins["bnlj"]
    status = "OK"
    if bad_join:
        if name in NLJ_ALLOWED:
            status = "ALLOWED-NLJ"
        elif name in BOUNDED_BUILD_NLJ and joins["cart"] == 0:
            status = "BOUNDED-BUILD-NLJ"
        elif (
            name in SCALAR_SPINE_NLJ
            and joins["cart"] == 0
            and joins["bnlj"] <= scalar_aggs
        ):
            status = "SCALAR-SPINE-NLJ"
        else:
            status = "FAIL"
    info = (
        f"exchanges={n_ex} single_partition={n_single} "
        f"bhj={joins['bhj']} smj={joins['smj']} shj={joins['shj']} "
        f"bnlj={joins['bnlj']} cart={joins['cart']} "
        f"scalar_aggs={scalar_aggs} py_stages={py}"
    )
    return status, info


def main() -> int:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else None
    spark = get_spark(app_name="audit-all-plans")
    lines: list[str] = []
    bad = 0
    for name, fn in sorted(entrymod.queries().items()):
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        except Exception as e:  # noqa: BLE001
            lines.append(f"FAIL {name}: plan build error: {e}")
            bad += 1
            continue
        status, info = classify_plan(name, plan)
        if status == "FAIL":
            bad += 1
        lines.append(f"{status} {name}: {info}")
    lines.append("")
    lines.append(f"{'FAIL' if bad else 'PASS'}: {bad} failures over {len(entrymod.queries())} queries")
    text = "\n".join(lines)
    print(text)
    if out_path:
        out_path.write_text(text + "\n")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
