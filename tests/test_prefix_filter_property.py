"""Property check: the prefix-filtered exact set-similarity join
(`_prefix_filtered_pair_stats`) must return EXACTLY the pairs the
naive inverted-index core returns after threshold filtering — for both
the Jaccard and containment measures, over adversarial corpora
(shared hot shingles, exact duplicates, subset/superset docs, tiny
docs). This is the exactness contract that lets the scale path replace
the quadratic join with no semantic change."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)

_SETTINGS = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_HYPOTHESIS_EXAMPLES", "6")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small word pool on purpose: maximizes shingle collisions across docs,
# which is exactly the regime where a buggy prefix filter would drop or
# duplicate pairs
_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=14)


def _naive_pairs(spark, rows, n, threshold, measure):
    """Reference model: brute-force pairwise measure in Python."""

    def shingles(text):
        toks = [t for t in text.split() if t]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: shingles(t) for i, t in rows}
    out = set()
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            common = len(a & b)
            if not common:
                continue
            denom = (
                len(a | b) if measure == "jaccard" else min(len(a), len(b))
            )
            if common / denom >= threshold:
                out.add((ids[i], ids[j]))
    return out


@given(texts=_corpus, threshold=st.sampled_from([0.3, 0.5, 0.8, 1.0]))
@_SETTINGS
def test_prefix_filtered_jaccard_matches_bruteforce(spark, texts, threshold):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            df, n=2, threshold=threshold, mode="prefix"
        ).collect()
    }
    assert got == _naive_pairs(spark, rows, 2, threshold, "jaccard")


@given(texts=_corpus, threshold=st.sampled_from([0.3, 0.5, 0.8, 1.0]))
@_SETTINGS
def test_prefix_filtered_containment_matches_bruteforce(spark, texts, threshold):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in containment_pairs(
            df, n=2, threshold=threshold, mode="prefix"
        ).collect()
    }
    assert got == _naive_pairs(spark, rows, 2, threshold, "containment")


@given(
    texts=_corpus,
    threshold=st.sampled_from([0.3, 0.5, 0.8, 1.0]),
    cap=st.sampled_from([0, 1, 4]),
)
@_SETTINGS
def test_giant_doc_routing_matches_bruteforce(spark, texts, threshold, cap):
    """The giant-document bound (max_pack_shingles) routes pairs that
    touch an over-cap doc through the row-form verify instead of the
    packed-array verify. With cap=0 EVERY doc is a giant (pure row
    path); cap=1/4 exercises the mixed union. All must equal brute
    force — the bound is a physical routing decision, never a
    truncation."""
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            df, n=2, threshold=threshold, mode="prefix", max_pack_shingles=cap
        ).collect()
    }
    assert got == _naive_pairs(spark, rows, 2, threshold, "jaccard")
    got_c = {
        (r.id_a, r.id_b)
        for r in containment_pairs(
            df, n=2, threshold=threshold, mode="prefix", max_pack_shingles=cap
        ).collect()
    }
    assert got_c == _naive_pairs(spark, rows, 2, threshold, "containment")


def test_auto_mode_dispatches_by_corpus_size(spark):
    """mode='auto' picks naive below _PREFIX_AUTO_MIN_DOCS (no Window
    operator in the plan) and every mode returns the same pair set.
    The prefix plan is recognizable by its row_number Window; the naive
    plan has none."""
    from db_cdc_poc_spark.operators import dedup as dd

    texts = [
        "alpha beta gamma delta eps",
        "alpha beta gamma delta zeta",
        "zeta eps delta gamma beta",
        "unrelated words entirely here now",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    results = {}
    for mode in ("auto", "naive", "prefix"):
        out = dd.ngram_jaccard_pairs(df, n=2, threshold=0.3, mode=mode)
        plan = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        results[mode] = {
            "pairs": {(r.id_a, r.id_b) for r in out.collect()},
            "windowed": "row_number" in plan,
        }
    assert results["auto"]["pairs"] == results["naive"]["pairs"]
    assert results["naive"]["pairs"] == results["prefix"]["pairs"]
    # 4 docs < _PREFIX_AUTO_MIN_DOCS -> auto resolves to the naive plan
    assert not results["auto"]["windowed"]
    assert not results["naive"]["windowed"]
    assert results["prefix"]["windowed"]
