"""Property-based checks for the training-pipeline operators: sequence
packing against a pure-Python model, stratified sampling invariants,
containment vs a set-arithmetic model."""

from __future__ import annotations

import os

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.sampling import _MASK63, stratified_sample
from db_cdc_poc_spark.operators.text import pack_sequences

_SETTINGS = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_HYPOTHESIS_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _bucket(salt: str, x: int, buckets: int) -> int:
    h = int.from_bytes(hashlib.md5(f"{salt}:{x}".encode()).digest()[:8], "big")
    return (h & _MASK63) % buckets


@given(
    toks=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=60),
    budget=st.sampled_from([16, 64, 256]),
)
@_SETTINGS
def test_pack_sequences_matches_python_model(spark, toks, budget):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.grp, r.n_tokens, r.seq_id, r.start_tok)
        for r in pack_sequences(df, budget=budget, num_groups=4).collect()
    }
    # model: per md5 group, docs in id order, exclusive running total
    by_grp: dict[int, list[int]] = {}
    for i, _ in enumerate(toks):
        by_grp.setdefault(_bucket("pack-v1", i, 4), []).append(i)
    for grp, ids in by_grp.items():
        start = 0
        for i in sorted(ids):
            assert got[i] == (grp, toks[i], start // budget, start % budget), i
            start += toks[i]
    assert len(got) == len(toks)


@given(
    n=st.integers(min_value=1, max_value=300),
    rate=st.floats(min_value=0.0, max_value=1.0),
)
@_SETTINGS
def test_stratified_sample_matches_hash_model(spark, n, rate):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("lang")
    )
    kept = {
        r.doc_id
        for r in stratified_sample(df, "doc_id", "lang", {"s": rate}).collect()
    }
    expected = {
        i for i in range(n) if _bucket("", i, 1_000_000) < int(rate * 1_000_000)
    }
    assert kept == expected


@given(
    a=st.sets(st.integers(min_value=0, max_value=400), min_size=3, max_size=40),
    b=st.sets(st.integers(min_value=0, max_value=400), min_size=3, max_size=40),
)
@_SETTINGS
def test_containment_matches_set_model(spark, a, b):
    """containment_pairs on two synthetic docs whose trigram sets are
    controlled: distinct integer tokens make shingle sets injective, so
    the expected measure is pure set arithmetic on token triples."""
    from db_cdc_poc_spark.operators.dedup import containment_pairs

    ta = " ".join(f"t{x}" for x in sorted(a))
    tb = " ".join(f"t{x}" for x in sorted(b))
    df = spark.createDataFrame([(1, ta), (2, tb)], "doc_id long, text string")
    out = containment_pairs(df, n=3, threshold=0.0).collect()

    def tris(s):
        xs = sorted(s)
        return {tuple(xs[i : i + 3]) for i in range(len(xs) - 2)}
    sa, sb = tris(a), tris(b)
    common = len(sa & sb)
    if common == 0:
        assert out == []
    else:
        (row,) = out
        assert row.id_a == 1 and row.id_b == 2
        assert abs(row.containment - round(common / min(len(sa), len(sb)), 6)) < 1e-9
