"""Similarity search: exact cosine top-k and LSH-bucketed ANN."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators import dedup as dd
from db_cdc_poc_spark.operators import similarity as sim
from db_cdc_poc_spark.sources.testdata import load_table

from .conftest import SF_DIR


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]), ([0.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = [r.c for r in df.select(sim.cosine("a", "b").alias("c")).collect()]
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(1.0)
    assert got[2] == 0.0  # zero vector -> 0, not NaN


def test_paired_cosine_equals_cosine(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(20)
    v = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        sim.norm("embedding").alias("nrm"),
    )
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
        sim.paired_cosine(F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")).alias("p"),
        sim.cosine(F.col("a.v"), F.col("b.v")).alias("c"),
    )
    for r in pairs.collect():
        assert r.p == r.c  # bit-identical, not just approx


def test_cosine_topk_matches_brute_force(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    topk = sim.cosine_topk(queries, emb, k=4)
    rows = topk.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # python-side brute force
    vecs = {r.vec_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (da * db) if da * db else 0.0

    for qid, got in by_q.items():
        got = sorted(got, key=lambda r: r.rank)
        expect = sorted(
            ((cos(vecs[qid], v), nid) for nid, v in vecs.items() if nid != qid),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        assert [r.neighbor_id for r in got] == [nid for _, nid in expect]
        for r, (c, _) in zip(got, expect):
            assert r.cosine == pytest.approx(c, abs=1e-4)


def test_ann_topk_recall_against_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = sim.cosine_topk(queries, emb, k=5).collect()
    approx = sim.ann_topk(queries, emb, k=5, tables=16, bits=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_ann_candidate_join_is_bucket_equi_join(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    plan = (
        sim.ann_topk(emb.limit(5), emb, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the candidate generator must be a hash join on bucket, never a
    # nested-loop cross product over the corpus
    assert "CartesianProduct" not in plan


def test_neardup_bucketed_recall_and_selectivity_on_planted_dups(spark):
    # 200 base vectors + 50 perturbed near-copies (cos > 0.97): at the
    # duplicate-grade threshold the bucketed path must find >=95% of
    # the brute-force pairs while generating far fewer candidates than
    # the n^2/2 pair space
    import random

    rng = random.Random(7)
    rows = []
    for i in range(200):
        v = [rng.gauss(0, 1) for _ in range(32)]
        rows.append((i, v))
    for i in range(50):
        base = rows[i][1]
        pert = [x + rng.gauss(0, 0.02) for x in base]
        rows.append((1000 + i, pert))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.id_a, r.id_b)
        for r in dd.embedding_neardup_pairs(df, threshold=0.95).collect()
    }
    assert len(exact) >= 45, f"planted dups not recovered by brute force: {len(exact)}"
    bucketed = {
        (r.id_a, r.id_b)
        for r in sim.neardup_pairs_bucketed(
            df, threshold=0.95, tables=16, bits=12
        ).collect()
    }
    recall = len(bucketed & exact) / len(exact)
    assert recall >= 0.95, f"bucketed recall too low: {recall}"
    assert bucketed <= exact | bucketed  # sanity: verify step keeps only >= threshold
    # selectivity: candidate pairs surviving the bucket join stay far
    # below the 250*249/2 pair space
    v = df
    from pyspark.sql import functions as F
    from db_cdc_poc_spark.operators.similarity import hyperplane_buckets

    b = v.select(
        F.col("vec_id").alias("id"),
        F.explode(hyperplane_buckets("embedding", 16, 12)).alias("b"),
    )
    n_cand = (
        b.alias("a")
        .join(
            b.alias("bb"),
            (F.col("a.b.table_id") == F.col("bb.b.table_id"))
            & (F.col("a.b.bucket") == F.col("bb.b.bucket"))
            & (F.col("a.id") < F.col("bb.id")),
        )
        .select("a.id", "bb.id")
        .distinct()
        .count()
    )
    assert n_cand < 250 * 249 / 2 * 0.2, f"bucket join not selective: {n_cand}"


def test_neardup_bucketed_plan_has_no_nested_loop(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    plan = (
        sim.neardup_pairs_bucketed(emb, threshold=0.4, tables=4, bits=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_probes_cover_own_list(spark):
    # a vector's own inverted list is always among its nearest probes,
    # so every exact neighbor sharing the query's list must be found;
    # sanity: output shape, rank bounds, and non-trivial recall
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cent = emb.filter(F.col("vec_id") % 16 == 0)
    out = sim.ivf_topk(queries, emb, centroids=cent, k=5, nprobe=4).collect()
    assert len(out) == 50
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_topk(queries, emb, k=5).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in out}
    # 4/~32 lists probed on near-orthogonal data: recall is the
    # selectivity tradeoff; just require it beats random chance by far
    assert len(exact & approx) / len(exact) >= 0.2


def test_semantic_dedup_keeps_min_id_survivor(spark):
    # three copies of one vector + one distinct vector: the greedy
    # min-id rule keeps exactly the smallest copy and the distinct one
    base = [1.0] + [0.0] * 63
    other = [0.0] * 63 + [1.0]
    emb = spark.createDataFrame(
        [(1, base, 0), (2, base, 0), (3, base, 0), (10, other, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    w = sim.rademacher_weights(8, 4, 64)
    pairs = sim.neardup_pairs_bucketed(
        emb, threshold=0.99, tables=8, bits=4, weights=w
    )
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    kept = sorted(
        r.vec_id for r in emb.join(dropped, "vec_id", "left_anti").collect()
    )
    assert kept == [1, 10]


def test_hard_negatives_excludes_same_label(spark):
    # nearest same-label vector must NOT appear; the best different-label
    # vector must rank 1
    a = [1.0] + [0.0] * 63
    near_same = [0.999] + [0.001] + [0.0] * 62   # same label, closest
    near_diff = [0.9] + [0.1] + [0.0] * 62       # different label
    far_diff = [0.0] * 63 + [1.0]                # different label, orthogonal
    emb = spark.createDataFrame(
        [(1, a, 0), (2, near_same, 0), (3, near_diff, 1), (4, far_diff, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = sim.hard_negatives(emb, emb.filter(F.col("vec_id") == 1), k=2).collect()
    got = [(r.negative_id, r.rank) for r in sorted(rows, key=lambda r: r.rank)]
    assert got == [(3, 1), (4, 2)]  # 2 (same label) excluded entirely


# ---------------------------------------------------------------------------
# label_centroids
# ---------------------------------------------------------------------------


def test_label_centroids_matches_numpy(spark):
    import numpy as np

    from db_cdc_poc_spark.operators.similarity import label_centroids

    rng = np.random.default_rng(11)
    rows = []
    vecs = {0: [], 1: []}
    for i in range(40):
        label = i % 2
        v = [float(x) for x in rng.normal(size=8).astype("float32")]
        vecs[label].append(v)
        rows.append((i, v, label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        (r.label, r.pos): r.centroid
        for r in label_centroids(df).collect()
    }
    assert len(got) == 16
    for label in (0, 1):
        mean = np.asarray(vecs[label], dtype="float64").mean(axis=0)
        for pos in range(8):
            assert abs(got[(label, pos)] - round(float(mean[pos]), 6)) <= 1e-6


def test_nearest_centroid_separable_clusters(spark):
    import numpy as np

    from db_cdc_poc_spark.operators.similarity import (
        centroid_confusion,
        nearest_centroid,
    )

    rng = np.random.default_rng(5)
    rows = []
    centers = {0: np.array([10.0, 0.0, 0.0]), 1: np.array([-10.0, 0.0, 0.0])}
    for i in range(60):
        label = i % 2
        v = centers[label] + rng.normal(scale=0.5, size=3)
        rows.append((i, [float(x) for x in v.astype("float32")], label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    # well-separated clusters: every vector maps back to its own label
    assigned = nearest_centroid(df).collect()
    assert all(r.pred_label == r.true_label for r in assigned)
    assert all(r.dist2 >= 0.0 for r in assigned)
    conf = {
        (r.true_label, r.pred_label): r.n for r in centroid_confusion(df).collect()
    }
    assert conf == {(0, 0): 30, (1, 1): 30}


def test_nearest_centroid_broadcast_no_cartesian_blowup(spark):
    from db_cdc_poc_spark.operators.similarity import nearest_centroid

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 3) for i in range(30)],
        "vec_id long, embedding array<float>, label int",
    )
    plan = (
        nearest_centroid(df)._jdf.queryExecution().executedPlan().toString()
    )
    # centroid side must broadcast (|labels| rows); the corpus must not
    # range-shuffle for a sort
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_kmeans_refine_fixed_point_on_separated_clusters(spark):
    import numpy as np

    from db_cdc_poc_spark.operators.similarity import (
        kmeans_refine,
        label_centroids,
    )

    rng = np.random.default_rng(7)
    rows = []
    centers = {0: [20.0, 0.0], 1: [-20.0, 0.0], 2: [0.0, 20.0]}
    for i in range(90):
        label = i % 3
        v = np.array(centers[label]) + rng.normal(scale=0.3, size=2)
        rows.append((i, [float(x) for x in v.astype("float32")], label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    # separated clusters: the label seeding is already Lloyd's fixed
    # point, so one refinement step reproduces the label centroids
    before = {(r.label, r.pos): r.centroid for r in label_centroids(df).collect()}
    after = {(r.label, r.pos): r.centroid for r in kmeans_refine(df).collect()}
    assert after == before


def test_kmeans_refine_moves_misseeded_points(spark):
    from db_cdc_poc_spark.operators.similarity import kmeans_refine

    # two tight groups, but one point of group 1 is mislabeled as 0:
    # the refinement assigns it to its true (near) centroid, so cluster
    # 0's refined centroid is the pure group-0 mean
    rows = [
        (0, [0.0, 0.0], 0),
        (1, [0.2, 0.0], 0),
        (2, [10.0, 0.0], 1),
        (3, [10.2, 0.0], 1),
        (4, [10.1, 0.0], 0),  # mislabeled
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    after = {(r.label, r.pos): r.centroid for r in kmeans_refine(df).collect()}
    assert after[(0, 0)] == 0.1  # mean of 0.0, 0.2 — outlier reassigned away
    assert abs(after[(1, 0)] - 10.1) < 1e-6
