"""Round-14 fixes (VERDICT r13 asks + ADVICE r13 items).

1. ephemeral scratch is guarded: a RAM-backed base is only chosen with
   free-space headroom (falls back to the disk tempdir otherwise), dirs
   are tracked, and ``discard_ephemeral_dir`` releases them eagerly.
2. ``metadata_row_count`` answers from parquet footers (zero jobs) for
   row-preserving frames and refuses anything cardinality-changing.
3. ``scaled_spread_target`` scales the fan-out width with input size,
   clamped to [1, defaultParallelism].
4. ``local_df`` rejects dict rows (silent NULL-row hazard) and counts
   nested-type schema columns correctly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.partitioning import (
    metadata_row_count,
    scaled_spread_target,
)
from db_cdc_poc_spark.sources.exchange import local_df
from db_cdc_poc_spark.sources.testdata import load_table
from db_cdc_poc_spark.streaming import ephemeral

SF_DIR = "/root/testdata/sf0.001"


# -- 1: ephemeral scratch guard ----------------------------------------------


def test_ephemeral_dir_falls_back_to_disk_when_tmpfs_full(monkeypatch):
    """An impossible free-space floor must push the dir off every
    RAM-backed base onto the normal tempdir — the ENOSPC guard."""
    monkeypatch.setenv("SPARK_GRAFT_EPHEMERAL_MIN_FREE", str(1 << 62))
    d = ephemeral.ephemeral_checkpoint_dir("guard_test_")
    try:
        assert not d.startswith("/dev/shm"), d
        assert os.path.isdir(d)
    finally:
        ephemeral.discard_ephemeral_dir(d)
    assert not os.path.exists(d)


def test_ephemeral_dir_uses_ram_when_room(monkeypatch):
    if not (os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)):
        pytest.skip("no tmpfs on this host")
    monkeypatch.delenv("SPARK_GRAFT_EPHEMERAL_DIR", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_EPHEMERAL_MIN_FREE", "1")
    d = ephemeral.ephemeral_checkpoint_dir("guard_test_")
    try:
        assert d.startswith("/dev/shm"), d
    finally:
        ephemeral.discard_ephemeral_dir(d)
    assert not os.path.exists(d)


def test_discard_is_noop_for_foreign_paths(tmp_path):
    foreign = tmp_path / "not_ours"
    foreign.mkdir()
    ephemeral.discard_ephemeral_dir(str(foreign))
    assert foreign.exists()


# -- 2: footer-based row count ------------------------------------------------


def test_metadata_row_count_matches_count(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n = metadata_row_count(docs)
    assert n is not None
    assert n == docs.count()


def test_metadata_row_count_refuses_cardinality_changes(spark):
    docs = load_table(spark, SF_DIR, "documents")
    assert metadata_row_count(docs.filter(F.col("doc_id") > 3)) is None
    assert metadata_row_count(docs.limit(2)) is None
    assert metadata_row_count(docs.groupBy("lang").count()) is None
    # projections/repartitions preserve rows and must still answer
    assert metadata_row_count(
        docs.select("doc_id").repartition(4)
    ) == docs.count()


# -- 3: size-scaled spread target ---------------------------------------------


def test_scaled_spread_target_bounds(spark):
    par = spark.sparkContext.defaultParallelism
    assert scaled_spread_target(spark, None) == par
    assert scaled_spread_target(spark, 1, 128 << 10) == 1
    assert scaled_spread_target(spark, (128 << 10) * par * 10, 128 << 10) == par
    assert (
        scaled_spread_target(spark, (128 << 10) * 3, 128 << 10)
        == min(3, par)
    )


# -- 4: local_df hardening ------------------------------------------------------


# -- 5: numpy IVF assignment is bit-identical to the expression fold ---------


def test_ivf_numpy_assignment_bit_exact(spark):
    """The mapInPandas assignment (sequential-order numpy accumulation)
    must reproduce the aggregate/zip_with fold's cosines BIT-exactly —
    same products, same summation order, correctly-rounded sqrt/div —
    including the ties-to-min-cid argmax rule."""
    from db_cdc_poc_spark.operators.similarity import norm, paired_cosine
    from db_cdc_poc_spark.operators.vector_index import ivf_assignment_stats

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = emb.filter(F.col("vec_id") % 8 == 0)

    # reference: the expression-fold path the operator used before
    cent = cents.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        norm("embedding").alias("cen"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        norm("embedding").alias("cn"),
    )
    ref = (
        c.crossJoin(F.broadcast(cent))
        .withColumn("cos_c", paired_cosine("cv", "ce", "cn", "cen"))
        .groupBy("neighbor_id")
        .agg(
            F.max_by(
                "cid", F.struct(F.col("cos_c"), (-F.col("cid")).alias("nc"))
            ).alias("list_id"),
            F.max("cos_c").alias("best_cos"),
        )
    )
    ref_per_list = {
        r.list_id: (r.n, r.cs)
        for r in ref.groupBy("list_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round((F.col("best_cos") + 1) * 1_000_000, 0).cast("long")
            ).alias("cs"),
        )
        .collect()
    }
    got = {
        r.list_id: (r.n_vectors, r.avg_cos_ppm)
        for r in ivf_assignment_stats(emb, cents).collect()
    }
    assert set(got) == set(ref_per_list)
    for lid, (n, cs) in ref_per_list.items():
        gn, gavg = got[lid]
        assert gn == n
        # avg_cos_ppm = cos_sum div n - 1e6, replayed from the exact sums
        assert gavg == cs // n - 1_000_000, lid
    assert sum(n for n, _ in got.values()) == emb.count()


def test_local_df_rejects_dict_rows(spark):
    with pytest.raises(TypeError, match="dict"):
        local_df(spark, [{"a": 1}], "a long")


def test_local_df_counts_nested_schema_columns(spark):
    df = local_df(
        spark,
        [({"k": 1}, [1, 2], 3)],
        "m map<string,int>, xs array<int>, n long",
    )
    assert df.columns == ["m", "xs", "n"]
    row = df.collect()[0]
    assert row.n == 3 and row.xs == [1, 2] and row.m == {"k": 1}
    # and it must be a LocalRelation (Arrow path), not a pickled RDD
    assert "LogicalRDD" not in df._jdf.queryExecution().analyzed().toString()
