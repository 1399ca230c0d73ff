"""Persisted IVF index: parity with the inline operator, partition
pruning on the probed lists, probe-many reuse."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators.similarity import ivf_topk
from db_cdc_poc_spark.operators.vector_index import IvfIndex
from db_cdc_poc_spark.sources.testdata import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def built(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    idx = IvfIndex.build(
        emb,
        centroids=emb.filter(F.col("vec_id") % 16 == 0),
        path=tempfile.mkdtemp(prefix="ivfidx_") + "/index",
    )
    return idx, emb


def test_probe_matches_inline_ivf(spark, built):
    idx, emb = built
    queries = emb.filter(F.col("vec_id") < 10)
    via_index = sorted(
        map(tuple, idx.probe(spark, queries, k=5, nprobe=4).collect())
    )
    inline = sorted(
        map(
            tuple,
            ivf_topk(
                queries,
                emb,
                centroids=emb.filter(F.col("vec_id") % 16 == 0),
                k=5,
                nprobe=4,
            ).collect(),
        )
    )
    assert via_index == inline and via_index


def test_probe_scan_is_partition_pruned(spark, built):
    idx, emb = built
    queries = emb.filter(F.col("vec_id") < 3)
    df = idx.probe(spark, queries, k=3, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any(
        "list_id" in ln and "IN" in ln.upper() for ln in part_lines
    ), "probe must prune unprobed list partitions at the scan"


def test_probe_many_is_stable(spark, built):
    idx, emb = built
    queries = emb.filter(F.col("vec_id").isin(4, 7))
    a = sorted(map(tuple, idx.probe(spark, queries, k=4, nprobe=3).collect()))
    b = sorted(map(tuple, idx.probe(spark, queries, k=4, nprobe=3).collect()))
    assert a == b and a


def test_append_matches_full_rebuild(spark):
    """Incremental append == rebuilding from the union corpus, as long
    as the codebook is the same (assignments are per-vector and the
    stored codebook is reused)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 != 0)
    cents = emb.filter(F.col("vec_id") % 16 == 0)

    inc = IvfIndex.build(
        first, centroids=cents, path=tempfile.mkdtemp(prefix="ivfa_") + "/i"
    )
    inc.append(rest)
    full = IvfIndex.build(
        emb, centroids=cents, path=tempfile.mkdtemp(prefix="ivfb_") + "/i"
    )
    queries = emb.filter(F.col("vec_id") < 6)
    a = sorted(map(tuple, inc.probe(spark, queries, k=5, nprobe=4).collect()))
    b = sorted(map(tuple, full.probe(spark, queries, k=5, nprobe=4).collect()))
    assert a == b and a


def test_drift_report_healthy_after_build_and_append(spark):
    """Right after build+append against one codebook: zero misassigned
    members everywhere, occupancy sums to ~1e6, every list's avg
    member-to-centroid cosine is sane (> 0 for argmax assignment)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = emb.filter(F.col("vec_id") % 16 == 0)
    idx = IvfIndex.build(
        emb.filter(F.col("vec_id") % 2 == 0), centroids=cents,
        path=tempfile.mkdtemp(prefix="ivfd_") + "/i",
    )
    idx.append(emb.filter(F.col("vec_id") % 2 != 0))
    rep = idx.drift_report(spark).collect()
    assert rep
    assert all(r.n_misassigned == 0 for r in rep)
    assert sum(r.n_vectors for r in rep) == emb.count()
    total_ppm = sum(r.occupancy_ppm for r in rep)
    assert 1_000_000 - len(rep) <= total_ppm <= 1_000_000  # div truncation
    assert all(r.avg_cos_ppm > 0 for r in rep)


def test_drift_report_flags_codebook_change(spark):
    """Re-training the codebook under existing lists (the drift the
    report exists to catch) must surface as misassigned members."""
    emb = load_table(spark, SF_DIR, "embeddings")
    path = tempfile.mkdtemp(prefix="ivft_") + "/i"
    idx = IvfIndex.build(
        emb, centroids=emb.filter(F.col("vec_id") % 16 == 0), path=path
    )
    # overwrite the codebook with a DIFFERENT centroid sample, keeping
    # the old cid values so every list still has a centroid row
    from db_cdc_poc_spark.operators.similarity import norm

    new_cents = (
        emb.filter((F.col("vec_id") - 1) % 16 == 0)
        .select(
            (F.col("vec_id") - 1).alias("cid"),
            F.col("embedding").alias("ce"),
            norm("embedding").alias("cen"),
        )
    )
    new_cents.write.mode("overwrite").parquet(f"{path}/centroids")
    rep = idx.drift_report(spark).collect()
    assert sum(r.n_misassigned for r in rep) > 0


def test_assignment_stats_matches_drift_report_on_fresh_index(spark):
    """The inline relational form (the q147 oracle surface) and the
    persisted-index report agree on occupancy and distortion for a
    fresh build (where misassignment is structurally zero)."""
    from db_cdc_poc_spark.operators.vector_index import ivf_assignment_stats

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = emb.filter(F.col("vec_id") % 16 == 0)
    idx = IvfIndex.build(
        emb, centroids=cents, path=tempfile.mkdtemp(prefix="ivfe_") + "/i"
    )
    inline = {
        r.list_id: (r.n_vectors, r.occupancy_ppm, r.avg_cos_ppm)
        for r in ivf_assignment_stats(emb, cents).collect()
    }
    stored = {
        r.list_id: (r.n_vectors, r.occupancy_ppm, r.avg_cos_ppm)
        for r in idx.drift_report(spark).collect()
    }
    assert inline == stored


def test_drift_report_orphaned_list_is_deterministic_null(spark):
    """A list_id absent from the stored codebook (external re-train
    that DROPPED a centroid — exactly the case the report exists to
    catch) must yield NULL own_cos-derived distortion, not an
    arbitrary centroid's cosine (r7 ADVICE: max_by on a 0/1 flag ties
    at 0 for every centroid and picks nondeterministically)."""
    from db_cdc_poc_spark.operators.similarity import norm

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = emb.filter(F.col("vec_id") % 16 == 0)
    path = tempfile.mkdtemp(prefix="ivforph_") + "/index"
    idx = IvfIndex.build(emb, centroids=cents, path=path)
    # drop one centroid from the stored codebook: its list is orphaned
    # (materialize rows FIRST — overwriting a path a lazy plan still
    # reads from races the scan against the delete)
    rows = spark.read.parquet(f"{path}/centroids").collect()
    dropped_cid = min(r.cid for r in rows)
    spark.createDataFrame(
        [r for r in rows if r.cid != dropped_cid],
        spark.read.parquet(f"{path}/centroids").schema,
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    reports = [
        {r.list_id: (r.avg_cos_ppm, r.n_misassigned)
         for r in idx.drift_report(spark).collect()}
        for _ in range(3)
    ]
    assert reports[0] == reports[1] == reports[2]  # deterministic
    orphan = reports[0][dropped_cid]
    assert orphan[0] is None  # no own centroid -> NULL distortion
    assert orphan[1] > 0  # every member now misassigned
