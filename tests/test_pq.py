import numpy as np
import pytest
from db_cdc_poc_spark.operators.vector_index import pq_codes

def test_pq_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    d, m, k, n = 16, 4, 4, 20
    vecs = rng.randn(n, d).round(3)
    cb = rng.randn(k, d).round(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    code_df = spark.createDataFrame(
        [(100 + i, [float(x) for x in cb[i]]) for i in range(k)],
        "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in pq_codes(corpus, code_df, m=m).collect()}
    dsub = d // m
    bits = max(1, (k - 1).bit_length())
    for i in range(n):
        code, err = 0, 0
        for j in range(m):
            x = vecs[i, j*dsub:(j+1)*dsub]
            d2 = ((cb[:, j*dsub:(j+1)*dsub] - x) ** 2).sum(axis=1)
            # ties -> lower dense code id; np.argmin is first-lowest
            cid = int(np.argmin(d2))
            code |= cid << (j * bits)
            err += int(np.floor(max(d2[cid], 0.0) * 1_000_000))
        assert out[i].pq_code == code, f"vec {i}"
        assert abs(out[i].err_micro - err) <= m  # floor vs float wobble


def test_pq_tie_breaks_to_lower_dense_id_and_zero_vec(spark):
    # duplicate codewords: exact tie on every subspace -> dense id 0
    # (source ids 7 < 9 -> dense 0 is the one with vec_id 7)
    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cb = spark.createDataFrame(
        [(9, [1.0, 0.0, 1.0, 0.0]), (7, [1.0, 0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    [r] = pq_codes(corpus, cb, m=2).collect()
    assert r.pq_code == 0  # dense 0 in both subspaces
    assert r.err_micro == 2_000_000  # |c|^2 = 1 per subspace


def test_pq_bit_width_handles_non_power_of_two_k(spark):
    # k=3 -> 2 bits per subspace; winning code 2 in sub 1 packs at <<2
    corpus = spark.createDataFrame(
        [(1, [0.0, 5.0])], "vec_id long, embedding array<double>"
    )
    cb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [9.0, 9.0]), (3, [0.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    [r] = pq_codes(corpus, cb, m=2).collect()
    assert r.pq_code == (0 << 0) | (2 << 2)
    assert r.err_micro == 0


def test_pq_adc_matches_numpy_reference(spark):
    from db_cdc_poc_spark.operators.vector_index import pq_adc_topk

    rng = np.random.RandomState(11)
    d, m, k, n, nq, topk = 16, 4, 4, 30, 3, 5
    vecs = rng.randn(n, d).round(3)
    cb = rng.randn(k, d).round(3)
    qs = rng.randn(nq, d).round(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    code_df = spark.createDataFrame(
        [(100 + i, [float(x) for x in cb[i]]) for i in range(k)],
        "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        [(1000 + i, [float(x) for x in qs[i]]) for i in range(nq)],
        "vec_id long, embedding array<double>")
    codes = pq_codes(corpus, code_df, m=m)
    out = pq_adc_topk(codes, qdf, code_df, m=m, k_top=topk).collect()
    got = {(r.query_id, r.rank): (r.neighbor_id, r.adc_micro) for r in out}

    dsub = d // m
    bits = max(1, (k - 1).bit_length())
    # reference: assign codes, build LUT in float64, floor-scale each
    # partial, rank by integer sum then id
    for qi in range(nq):
        dists = []
        for i in range(n):
            total = 0
            for j in range(m):
                x = vecs[i, j*dsub:(j+1)*dsub]
                cid = int(np.argmin(((cb[:, j*dsub:(j+1)*dsub] - x) ** 2).sum(axis=1)))
                part = ((qs[qi, j*dsub:(j+1)*dsub] - cb[cid, j*dsub:(j+1)*dsub]) ** 2).sum()
                total += int(np.floor(part * 1_000_000))
            dists.append((total, i))
        dists.sort()
        for r, (dm, nid) in enumerate(dists[:topk], start=1):
            assert got[(1000 + qi, r)][0] == nid, (qi, r)
            assert abs(got[(1000 + qi, r)][1] - dm) <= m


def test_pq_adc_candidates_restricts_and_matches_unrestricted(spark):
    from db_cdc_poc_spark.operators.vector_index import pq_adc_topk

    rng = np.random.RandomState(3)
    d, m, k, n = 8, 2, 4, 12
    vecs = rng.randn(n, d).round(3)
    cb = rng.randn(k, d).round(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    code_df = spark.createDataFrame(
        [(i, [float(x) for x in cb[i]]) for i in range(k)],
        "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]])], "vec_id long, embedding array<double>")
    codes = pq_codes(corpus, code_df, m=m)
    full = {r.neighbor_id: r.adc_micro
            for r in pq_adc_topk(codes, qdf, code_df, m=m, k_top=n).collect()}
    allowed = [2, 5, 7]
    cand = spark.createDataFrame(
        [(0, i) for i in allowed], "query_id long, neighbor_id long")
    out = pq_adc_topk(codes, qdf, code_df, m=m, k_top=n,
                      candidates=cand).collect()
    # only admitted pairs scored; distances identical to the full scan
    assert {r.neighbor_id for r in out} == set(allowed)
    for r in out:
        assert r.adc_micro == full[r.neighbor_id]
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == \
        sorted(allowed, key=lambda i: (full[i], i))
