"""Numpy/Arrow brute-force top-k vs the expression path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators import similarity as sim
from db_cdc_poc_spark.sources.testdata import load_table

from .conftest import SF_DIR


def test_cosine_topk_np_matches_expression_path(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    expr = sim.cosine_topk(queries, emb, k=5).collect()
    vec = sim.cosine_topk_np(queries, emb, k=5).collect()
    expr_map = {(r.query_id, r.rank): r for r in expr}
    vec_map = {(r.query_id, r.rank): r for r in vec}
    assert set(expr_map) == set(vec_map)
    agree = sum(
        1
        for key in expr_map
        if expr_map[key].neighbor_id == vec_map[key].neighbor_id
    )
    # last-ulp float differences may swap near-tied ranks; neighbors
    # must agree almost everywhere and cosines always
    assert agree >= len(expr_map) - 2
    for key in expr_map:
        assert vec_map[key].cosine == pytest.approx(expr_map[key].cosine, abs=1e-5)


def test_cosine_topk_np_empty_queries_raises(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="empty"):
        sim.cosine_topk_np(emb.filter("vec_id < 0"), emb)


def test_neardup_pairs_np_matches_expression_path(spark):
    from db_cdc_poc_spark.operators.dedup import embedding_neardup_pairs

    emb = load_table(spark, SF_DIR, "embeddings")
    expr = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    vec = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.neardup_pairs_np(emb, threshold=0.4).collect()
    }
    # pair sets may differ only for cosines within float noise of the
    # threshold; none exist in this data
    assert set(vec) == set(expr)
    for k in expr:
        assert vec[k] == pytest.approx(expr[k], abs=1e-5)


def test_neardup_pairs_np_broadcast_cap(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="ANN"):
        sim.neardup_pairs_np(emb, max_broadcast_rows=10)


def test_neardup_pairs_np_byte_cap_fires_before_any_collect(spark):
    """The guard must reject by BYTES (rows x dim x 8) and must fire
    before df.collect() materializes the corpus on the driver (r7 ask:
    a 1M-row guard passes a 1M x 1024-dim = 8 GB matrix, and guarding
    after collect defeats the purpose)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    # patch the CONCRETE DataFrame class (pyspark 4 routes collect
    # through a subclass of pyspark.sql.DataFrame)
    cls = type(emb)
    # 500 x 64 x 8 = 256_000 bytes > 1000-byte cap -> byte guard fires
    calls = []
    orig = cls.collect

    def counting_collect(self):
        calls.append(len(self.columns))
        return orig(self)

    cls.collect = counting_collect
    try:
        with pytest.raises(ValueError, match="bytes"):
            sim.neardup_pairs_np(emb, max_broadcast_bytes=1000)
    finally:
        cls.collect = orig
    # only the 1-row (n, d) stats aggregate ran — never the corpus
    # select (which would collect 2 columns of 500 rows)
    assert calls == [2]


def test_cosine_topk_np_query_byte_cap(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="max_query_bytes"):
        sim.cosine_topk_np(emb, emb, max_query_bytes=1000)
