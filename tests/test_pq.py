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


def test_pq_rejects_non_divisible_dim(spark):
    corpus = spark.createDataFrame(
        [(1, [0.0] * 65)], "vec_id long, embedding array<double>"
    )
    cb = spark.createDataFrame(
        [(i, [float(i)] * 65) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="divide"):
        pq_codes(corpus, cb, m=8)
    from db_cdc_poc_spark.operators.vector_index import pq_adc_topk

    with pytest.raises(ValueError, match="divide"):
        pq_adc_topk(corpus.selectExpr("vec_id", "0L AS pq_code"),
                    corpus, cb, m=8)


def test_pq_rejects_code_overflowing_sign_bit(spark):
    # k=256 -> 8 bits; m=8 packs bit 63 (the sign bit): the SINGLE-WORD
    # layout must raise, not silently alias (ADVICE r7 item 2). The
    # default (wide=None) now auto-selects the multi-word array<bigint>
    # layout instead of raising (round-13 wide-PQ ask).
    corpus = spark.createDataFrame(
        [(1, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    cb = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(256)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="63"):
        pq_codes(corpus, cb, m=8, wide=False)
    auto = pq_codes(corpus, cb, m=8)  # auto-selects wide
    assert dict(auto.dtypes)["pq_code"] == "array<bigint>"
    # k=128 -> 7 bits * 8 = 56: fine
    cb7 = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(128)],
        "vec_id long, embedding array<double>",
    )
    assert pq_codes(corpus, cb7, m=8).count() == 1


def _np_residualize(vecs, cents):
    import numpy as np

    cn = np.linalg.norm(cents, axis=1)
    vn = np.linalg.norm(vecs, axis=1)
    den = vn[:, None] * cn[None, :]
    cos = np.where(den > 0, vecs @ cents.T / den, 0.0)
    assign = np.argmax(cos, axis=1)  # first max == ties to lower id
    return assign, vecs - cents[assign]


def test_pq_codes_residual_mode_matches_numpy(spark):
    rng = np.random.RandomState(5)
    d, m, k, n, nlist = 8, 2, 4, 25, 3
    vecs = rng.randn(n, d).round(3)
    cents = rng.randn(nlist, d).round(3)
    cb = rng.randn(k, d).round(3) * 0.3  # residual-space codewords
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    coarse = spark.createDataFrame(
        [(i, [float(x) for x in cents[i]]) for i in range(nlist)],
        "list_id long, embedding array<double>")
    cb_df = spark.createDataFrame(
        [(i, [float(x) for x in cb[i]]) for i in range(k)],
        "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in
           pq_codes(corpus, cb_df, m=m, coarse_centroids=coarse).collect()}
    assign, res = _np_residualize(vecs, cents)
    dsub = d // m
    bits = max(1, (k - 1).bit_length())
    for i in range(n):
        assert out[i].list_id == assign[i], f"vec {i} list"
        code = 0
        for j in range(m):
            x = res[i, j*dsub:(j+1)*dsub]
            d2 = ((cb[:, j*dsub:(j+1)*dsub] - x) ** 2).sum(axis=1)
            code |= int(np.argmin(d2)) << (j * bits)
        assert out[i].pq_code == code, f"vec {i}"


def test_pq_adc_residual_mode_matches_numpy(spark):
    from db_cdc_poc_spark.operators.vector_index import pq_adc_topk

    rng = np.random.RandomState(13)
    d, m, k, n, nlist, nq = 8, 2, 4, 20, 3, 2
    vecs = rng.randn(n, d).round(3)
    cents = rng.randn(nlist, d).round(3)
    cb = rng.randn(k, d).round(3) * 0.3
    qs = rng.randn(nq, d).round(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    coarse = spark.createDataFrame(
        [(i, [float(x) for x in cents[i]]) for i in range(nlist)],
        "list_id long, embedding array<double>")
    cb_df = spark.createDataFrame(
        [(i, [float(x) for x in cb[i]]) for i in range(k)],
        "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        [(100 + i, [float(x) for x in qs[i]]) for i in range(nq)],
        "vec_id long, embedding array<double>")
    codes = pq_codes(corpus, cb_df, m=m, coarse_centroids=coarse)
    out = pq_adc_topk(codes, qdf, cb_df, m=m, k_top=n,
                      coarse_centroids=coarse).collect()
    got = {(r.query_id, r.neighbor_id): r.adc_micro for r in out}
    assign, res = _np_residualize(vecs, cents)
    dsub = d // m
    for qi in range(nq):
        for i in range(n):
            qr = qs[qi] - cents[assign[i]]
            total = 0
            for j in range(m):
                x = res[i, j*dsub:(j+1)*dsub]
                cid = int(np.argmin(
                    ((cb[:, j*dsub:(j+1)*dsub] - x) ** 2).sum(axis=1)))
                part = ((qr[j*dsub:(j+1)*dsub]
                         - cb[cid, j*dsub:(j+1)*dsub]) ** 2).sum()
                total += int(np.floor(max(part, 0.0) * 1_000_000))
            assert abs(got[(100 + qi, i)] - total) <= m, (qi, i)


def test_exact_rerank_matches_numpy_on_shortlist(spark):
    from db_cdc_poc_spark.operators.vector_index import exact_rerank

    rng = np.random.RandomState(23)
    d, n = 6, 15
    vecs = rng.randn(n, d).round(3)
    q = rng.randn(d).round(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        [(99, [float(x) for x in q])], "vec_id long, embedding array<double>")
    short = [3, 7, 1, 11, 8]
    sdf = spark.createDataFrame(
        [(99, i) for i in short], "query_id long, neighbor_id long")
    out = exact_rerank(sdf, qdf, corpus, k_top=3).collect()
    d2 = {i: int(np.floor(max(((vecs[i] - q) ** 2).sum(), 0.0) * 1_000_000))
          for i in short}
    want = sorted(short, key=lambda i: (d2[i], i))[:3]
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == want
    for r in out:
        assert abs(r.d2_micro - d2[r.neighbor_id]) <= 2  # float assoc wobble


def test_pq_train_deterministic_and_reduces_distortion(spark):
    # training twice from the same seeds must be bit-identical (the
    # oracle-replay contract), and the trained residual codebook must
    # beat the flat raw-sample codebook on total reconstruction error
    from pyspark.sql import functions as F
    from db_cdc_poc_spark.operators.vector_index import pq_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    train = emb.filter(F.col("vec_id") < 2048)
    cs = emb.filter((F.col("vec_id") % 16 == 0) & (F.col("vec_id") < 256))
    ws = emb.filter((F.col("vec_id") % 16 == 1) & (F.col("vec_id") < 256))
    c1, b1 = pq_train(train, cs, ws, m=8, coarse_iters=1, pq_iters=2)
    c2, b2 = pq_train(train, cs, ws, m=8, coarse_iters=1, pq_iters=2)
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))
    assert sorted(map(tuple, b1.collect())) == sorted(map(tuple, b2.collect()))
    flat_err = pq_codes(emb, cs, m=8).agg(
        F.sum("err_micro")).collect()[0][0]
    res_err = pq_codes(emb, b1, m=8, coarse_centroids=c1).agg(
        F.sum("err_micro")).collect()[0][0]
    assert res_err < flat_err, (res_err, flat_err)


def test_opq_rotation_is_orthonormal_and_distance_preserving(spark):
    import numpy as np

    from db_cdc_poc_spark.operators.vector_index import (
        opq_rotation,
        rotate_vectors,
    )

    rng = np.random.RandomState(3)
    # anisotropic: variance concentrated in the first dims
    scales = np.array([8, 6, 4, 3, 1, 0.5, 0.3, 0.1])
    x = rng.randn(200, 8) * scales[None, :]
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    r1 = opq_rotation(df, m=4)
    r2 = opq_rotation(df, m=4)
    assert r1 == r2  # deterministic (incl. eigenvector sign fixing)
    r = np.array(r1)
    assert np.allclose(r @ r.T, np.eye(8), atol=1e-9)  # orthonormal
    rot = {
        int(row.vec_id): np.array(row.embedding)
        for row in rotate_vectors(df, r1).collect()
    }
    # distances preserved exactly (up to float noise)
    for a, b in [(0, 1), (5, 9), (17, 3)]:
        d_orig = np.linalg.norm(x[a] - x[b])
        d_rot = np.linalg.norm(rot[a] - rot[b])
        assert abs(d_orig - d_rot) < 1e-9
    # balanced allocation: per-subspace variance products are far
    # closer than the identity split (the OPQ-P objective)
    y = np.stack([rot[i] for i in range(200)])

    def spread(mat):
        logs = [
            float(np.sum(np.log(np.var(mat[:, j * 2:(j + 1) * 2], axis=0))))
            for j in range(4)
        ]
        return max(logs) - min(logs)

    assert spread(y) < spread(x) * 0.5


def test_opq_rotation_improves_pq_recall_on_correlated_data(spark):
    """The measured point of OPQ: same m/k budget, correlated input —
    ADC recall@5 after rotation beats the unrotated baseline."""
    import numpy as np

    from db_cdc_poc_spark.operators.vector_index import (
        opq_rotation,
        pq_codes,
        pq_adc_topk,
        rotate_vectors,
    )

    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    n, d = 400, 8
    # strongly correlated coordinates: a random low-condition mixing
    # of an anisotropic source
    a_mix = rng.randn(d, d) * 0.2 + np.diag([6, 5, 4, 3, 0.5, 0.4, 0.3, 0.2])
    x = rng.randn(n, d) @ a_mix.T

    def distortion_of(mat):
        df = spark.createDataFrame(
            [(i, [float(v) for v in mat[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        cb = df.filter(F.col("vec_id") % 25 == 0)
        return (
            pq_codes(df, cb, m=4)
            .agg(F.sum("err_micro").alias("s"))
            .collect()[0].s
        )

    def recall_of(mat):
        df = spark.createDataFrame(
            [(i, [float(v) for v in mat[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        cb = df.filter((F.col("vec_id") % 25 == 0))  # 16 codewords
        codes = pq_codes(df, cb, m=4)
        queries = df.filter(F.col("vec_id") < 10)
        got = pq_adc_topk(codes, queries, cb, m=4, k_top=5).collect()
        hits = 0
        for q in range(10):
            d2 = ((mat - mat[q][None, :]) ** 2).sum(axis=1)
            order = sorted(
                (i for i in range(n) if i != q), key=lambda i: (d2[i], i)
            )
            truth = set(order[:5])
            hits += sum(
                1 for r in got
                if r.query_id == q and int(r.neighbor_id) in truth
            )
        return hits / 50.0

    base = recall_of(x)
    df_x = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    r = opq_rotation(df_x, m=4)
    y = x @ np.array(r).T
    rotated = recall_of(y)
    # primary: OPQ's actual objective — total quantization distortion
    # drops in the rotated space at the same bits (deterministic)
    assert distortion_of(y) < distortion_of(x)
    # recall at this corpus/bit budget must not degrade (it usually
    # improves; strict improvement is left to the measured curve,
    # scripts/bench_pq_curve.py --opq — recall@5 over 10 queries is
    # too coarse an estimator to gate a unit test on)
    assert rotated >= base, f"OPQ degraded recall: {rotated} < {base}"
