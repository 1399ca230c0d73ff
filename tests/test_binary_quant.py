"""Binary (1-bit sign) quantization + Hamming top-k: pack exactness
against a Python bit-for-bit replay, word-boundary handling, empty
input, and ranking parity with a brute-force reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.similarity import (
    binary_sign_codes,
    hamming_topk,
)
from db_cdc_poc_spark.sources.testdata import load_table

from .conftest import SF_DIR


def _py_pack(vec):
    words = []
    for w in range(-(-len(vec) // 63)):
        word = 0
        for j, x in enumerate(vec[w * 63 : w * 63 + 63]):
            if x > 0:
                word |= 1 << j
        words.append(word)
    return words


def test_pack_matches_python_replay_one_and_two_words(spark):
    vecs = [
        (1, [0.5, -0.2, 0.0, 3.0, -1.0]),            # d=5: one word
        (2, [-x / 10 for x in range(70)]),            # d=70: two words, all <=0
        (3, [((-1) ** i) * (i + 1.0) for i in range(70)]),  # alternating
        (4, [0.0] * 70),                              # ties at 0 -> all zero
    ]
    for vid, v in vecs:
        df = spark.createDataFrame(
            [(vid, v)], "vec_id long, embedding array<double>"
        )
        got = binary_sign_codes(df).collect()[0]
        assert list(got.bq_code) == _py_pack(v), f"vec {vid}"
        assert all(w >= 0 for w in got.bq_code)  # bit 63 never set


def test_pack_on_corpus_matches_python(spark):
    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 100)
    rows = {int(r.vec_id): list(r.embedding) for r in emb.collect()}
    got = {
        int(r.vec_id): list(r.bq_code)
        for r in binary_sign_codes(emb).collect()
    }
    assert len(got) == len(rows) > 0
    for vid, v in rows.items():
        assert got[vid] == _py_pack([float(x) for x in v])


def test_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = binary_sign_codes(df)
    assert out.count() == 0
    assert dict(out.dtypes)["bq_code"] == "array<bigint>"


def test_hamming_topk_matches_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 60)
    vecs = {
        int(r.vec_id): _py_pack([float(x) for x in r.embedding])
        for r in emb.collect()
    }
    codes = binary_sign_codes(emb)
    got = sorted(
        (int(r.query_id), int(r.rank), int(r.neighbor_id), int(r.hamming))
        for r in hamming_topk(codes, codes.filter(F.col("vec_id") < 5)).collect()
    )
    want = []
    for q in range(5):
        scored = sorted(
            (
                sum(bin(a ^ b).count("1") for a, b in zip(vecs[q], vecs[n])),
                n,
            )
            for n in vecs
            if n != q
        )
        for rank, (h, n) in enumerate(scored[:5], start=1):
            want.append((q, rank, n, h))
    assert got == sorted(want) and got


def test_hamming_plan_broadcasts_queries(spark):
    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 50)
    codes = binary_sign_codes(emb)
    df = hamming_topk(codes, codes.filter(F.col("vec_id") < 3))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # the designed linear scan
    assert "PythonUDF" not in plan  # pure JVM expressions end-to-end
